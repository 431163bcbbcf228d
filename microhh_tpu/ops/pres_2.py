"""2nd-order spectral Poisson pressure solver (reference ``src/pres_2.cxx``).

TPU-first design:

* The reference runs FFTW r2r transforms along x then y with MPI pencil
  transposes in between (``src/fft.cxx``).  Here the horizontal transform is a
  single batched ``rfft2`` over the (j, i) axes — on TPU this is an XLA-native
  batched FFT; under sharding XLA reshards as needed (a custom all-to-all
  pencil pipeline is a later optimization).
* The vertical tridiagonal solve (Thomas algorithm, reference
  ``pres_2.cxx:198-263``) exploits that the matrix is time-independent: the
  forward-elimination pivots ``w`` are **precomputed once** per case, so the
  per-step solve is two first-order linear recurrences over k.  These run as
  log-depth ``lax.associative_scan``s — fully vectorized over all (ky, kx)
  modes, no sequential loop on the critical path.
* The modified wavenumbers ``bmati/bmatj`` and the mean-mode top BC (p=0 at
  the top for kx=ky=0, dp/dz=0 otherwise) follow pres_2.cxx:124-153,306-324.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .stencil import im, jm


def _mxu_precision(dtype):
    """MXU pass count for the f32 spectral matmuls.

    ``HIGHEST`` (6-pass bf16 emulation, exact f32) is the safe default;
    ``MICROHH_DFT_PRECISION=high`` selects 3-pass bf16_3x (~2x faster,
    relative error ~1e-7 on these unitary transforms — validated by
    tests/test_pres.py's divergence checks), ``=default`` single-pass bf16
    (fastest, ~1e-3 — measurement/experiment only)."""
    if dtype != jnp.float32:
        return None
    lvl = os.environ.get("MICROHH_DFT_PRECISION", "highest").lower()
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[lvl]


def _fwd_precision(dtype):
    """MXU pass count for the FORWARD spectral transforms only.

    Rounding error in the forward transforms is equivalent to solving a
    slightly perturbed rhs exactly, so the divergence residual picks it up
    UNAMPLIFIED — unlike inverse-transform/solve error, which the check
    sees through the Laplacian (k^2-amplified, the measured 25x DIV blowup
    when ALL transforms ran at HIGH).  That asymmetry makes HIGH (bf16_3x,
    ~2x faster) the f32 default here; the inverse stays on
    ``_mxu_precision`` (HIGHEST by default)."""
    if dtype != jnp.float32:
        return None
    lvl = os.environ.get("MICROHH_DFT_FWD_PRECISION", "high").lower()
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[lvl]


def _tdma_body(kmax, af_cf_ref, dr, di, wv, xr, xi):
    """In-VMEM Thomas solve over one (kmax, TJ, 128) mode block: forward
    elimination and back substitution as fori_loops with the running value
    carried in registers — ONE read + ONE write of the spectral field
    instead of the log-depth scans' many HBM passes."""
    TJ = dr.shape[1]

    def fwd(k, carry):
        yr_p, yi_p = carry
        w = wv[k]
        af = af_cf_ref[k, 0] * w
        yr = af * yr_p + dr[k] * w
        yi = af * yi_p + di[k] * w
        xr[k] = yr
        xi[k] = yi
        return yr, yi

    z = jnp.zeros(dr.shape[1:], dr.dtype)
    jax.lax.fori_loop(0, kmax, fwd, (z, z))

    def bwd(kk, carry):
        k = kmax - 1 - kk
        xn_r, xn_i = carry
        cf = af_cf_ref[k, 1] * wv[k]
        r = xr[k] + cf * xn_r
        i_ = xi[k] + cf * xn_i
        xr[k] = r
        xi[k] = i_
        return r, i_

    jax.lax.fori_loop(0, kmax, bwd, (z, z))


def _tdma_kernel(kmax, af_cf_ref, dr_ref, di_ref, wv_ref, xr_ref, xi_ref):
    _tdma_body(kmax, af_cf_ref, dr_ref, di_ref, wv_ref, xr_ref, xi_ref)


def _tdma_dz2_body(kmax, t_ref, dr, di, wv, xr, xi):
    """_tdma_body with the dz^2 rhs scaling folded in (t_ref columns:
    [-a, -c, dz^2]) — saves the separate Yr*dz2 / Yi*dz2 HBM passes."""
    def fwd(k, carry):
        yr_p, yi_p = carry
        w = wv[k]
        af = t_ref[k, 0] * w
        dz2 = t_ref[k, 2]
        yr = af * yr_p + (dr[k] * dz2) * w
        yi = af * yi_p + (di[k] * dz2) * w
        xr[k] = yr
        xi[k] = yi
        return yr, yi

    z = jnp.zeros(dr.shape[1:], dr.dtype)
    jax.lax.fori_loop(0, kmax, fwd, (z, z))

    def bwd(kk, carry):
        k = kmax - 1 - kk
        xn_r, xn_i = carry
        cf = t_ref[k, 1] * wv[k]
        r = xr[k] + cf * xn_r
        i_ = xi[k] + cf * xn_i
        xr[k] = r
        xi[k] = i_
        return r, i_

    jax.lax.fori_loop(0, kmax, bwd, (z, z))


def _tdma_dz2_kernel(kmax, t_ref, dr_ref, di_ref, wv_ref, xr_ref, xi_ref):
    _tdma_dz2_body(kmax, t_ref, dr_ref, di_ref, wv_ref, xr_ref, xi_ref)


def _assoc_linear_scan(A, B, reverse=False):
    """Solve x[k] = A[k]*x[k-1] + B[k] (x[-1]=0) along axis 0, log-depth."""
    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r
    _, x = jax.lax.associative_scan(combine, (A, B), axis=0, reverse=reverse)
    return x


class Pres2:
    def __init__(self, ini, grid, fields, dtype=np.float64):
        self.grid = grid
        self.fields = fields
        self.dtype = dtype
        self._built = False
        self.mesh = None  # set via Model.set_mesh for multi-chip slab FFTs
        # [pres] sw_fft_per_slice (pres.cxx:46) batches cuFFT plans per
        # z-slice to cap GPU workspace; the TPU spectral path (batched DFT
        # matmuls / rfft2) has no per-slice plan concept, so the knob is
        # accepted and a no-op here.
        ini.get_bool("pres", "sw_fft_per_slice", default=False)

    def set_values(self):
        """Precompute wavenumbers + TDMA factors (reference set_values)."""
        g, f = self.grid, self.fields
        itot, jtot, kmax, kgc = g.itot, g.jtot, g.ktot, g.kgc
        ihalf = itot // 2 + 1

        dxidxi = 1. / (g.dx * g.dx)
        dyidyi = 1. / (g.dy * g.dy)

        # Modified wavenumbers (pres_2.cxx:124-153).  rfft keeps only the
        # first itot//2+1 x-modes; bmati is symmetric so that's all of them.
        ii = np.arange(ihalf)
        bmati = 2. * (np.cos(2. * np.pi * ii / itot) - 1.) * dxidxi
        jj = np.arange(jtot)
        bmatj = 2. * (np.cos(2. * np.pi * jj / jtot) - 1.) * dyidyi
        bmatj[jtot // 2 + 1:] = bmatj[jtot - jj[jtot // 2 + 1:]]

        dz = g.dz[kgc:kgc + kmax]
        rhoref = f.rhoref[kgc:kgc + kmax]
        rhorefh = f.rhorefh[kgc:kgc + kmax + 1]
        dzhi = g.dzhi[kgc:kgc + kmax + 1]

        a = dz * rhorefh[:kmax] * dzhi[:kmax]
        c = dz * rhorefh[1:kmax + 1] * dzhi[1:kmax + 1]

        bm = bmatj[:, None] + bmati[None, :]                      # (jtot, ihalf)
        b = (dz[:, None, None] ** 2 * rhoref[:, None, None] * bm[None]
             - (a + c)[:, None, None])                            # (kmax, jtot, ihalf)
        b[0] += a[0]
        # Top BC: dp/dz=0 (b += c) except the mean mode where p_top=0 (b -= c).
        b[kmax - 1] += c[kmax - 1]
        b[kmax - 1, 0, 0] -= 2. * c[kmax - 1]

        # Thomas forward elimination pivots (time-independent).
        w = np.empty_like(b)
        w[0] = b[0]
        for k in range(1, kmax):
            w[k] = b[k] - a[k] * (c[k - 1] / w[k - 1])

        dt_ = self.dtype
        self.a_k = jnp.asarray(a[:, None, None], dtype=dt_)
        self.c_k = jnp.asarray(c[:, None, None], dtype=dt_)
        self.dz2 = jnp.asarray((dz ** 2)[:, None, None], dtype=dt_)
        # The pivot array is O(kmax*jtot*ihalf) — passed into the jitted
        # step as an argument (device_params), NOT closed over, so it is not
        # embedded in the HLO as a giant literal.
        self._winv_np = (1. / w).astype(dt_)

        # ---- fast-diagonalization path (default) ------------------------
        # The per-mode matrix is T + bm*M with mode-INDEPENDENT tridiagonal
        # T = tridiag(a, b_base, c) and M = diag(dz^2 rho): precompute the
        # generalized eigenbasis of M^-1 T once (host, f64) and the per-step
        # solve becomes two dense (kmax x kmax) matmuls over the k axis plus
        # an elementwise divide — MXU work instead of the log-depth
        # HBM-bound scans.  The mean (kx=ky=0) mode has a different top BC
        # (p_top = 0), so its kmax x kmax dense inverse is precomputed
        # separately and patched in after the matmuls.
        b_base = -(a + c)
        b_base[0] += a[0]
        b_base[-1] += c[-1]
        m_diag = dz ** 2 * rhoref
        alpha = a / m_diag
        gamma = c / m_diag
        e_off = np.sqrt(alpha[1:] * gamma[:-1])
        try:
            from scipy.linalg import eigh_tridiagonal
            lam, Q = eigh_tridiagonal(b_base / m_diag, e_off)
        except ImportError:
            sym = (np.diag(b_base / m_diag) + np.diag(e_off, 1)
                   + np.diag(e_off, -1))
            lam, Q = np.linalg.eigh(sym)
        s = np.ones(kmax)
        for k in range(1, kmax):
            s[k] = s[k - 1] * np.sqrt(gamma[k - 1] / alpha[k])
        V = Q / s[:, None]                      # eigvecs of M^-1 T
        # fold M^-1 into the analysis matrix: g = Vim @ p_hat solves with
        # rhs p_hat * dz^2 because (dz^2 p_hat)/m = p_hat / rho
        Vim = (Q.T * s[None, :]) / rhoref[None, :]
        # mean mode: p_top = 0 BC (b[-1] -= 2c[-1]); dense inverse with the
        # dz^2 rhs scaling folded in
        T0 = (np.diag(b_base + 0.) + np.diag(a[1:], -1) + np.diag(c[:-1], 1))
        T0[kmax - 1, kmax - 1] -= 2. * c[kmax - 1]
        M0 = np.linalg.inv(T0) * (dz ** 2)[None, :]
        bmji = bm.copy()
        bmji[0, 0] = -1.       # dummy: the (0,0) column is overwritten
        self._eig_np = {
            "eigV": V.astype(dt_), "eigVim": Vim.astype(dt_),
            "eiglam": lam.astype(dt_), "eigM0": M0.astype(dt_),
            "eigbm": bmji.astype(dt_),
        }

        # ---- DFT-as-matmul transform tables ------------------------------
        # XLA's TPU FFT spends ~40% of its time in radix-step layout
        # copies; expressing the batched 2-D real FFT as MXU matmuls
        # measured 1.46x faster at 256^2 planes (and skips the
        # complex<->real shuffles around the eigen solve, which then runs
        # on the real/imag parts directly).
        ang = 2. * np.pi * np.outer(np.arange(itot), np.arange(ihalf)) / itot
        angy = 2. * np.pi * np.outer(np.arange(jtot), np.arange(jtot)) / jtot
        wk = np.ones(ihalf)
        wk[1:ihalf - (itot % 2 == 0)] = 2.
        self._dft_np = {
            "dftC": np.cos(ang).astype(dt_),
            "dftS": np.sin(ang).astype(dt_),
            "dftCy": np.cos(angy).astype(dt_),
            "dftSy": np.sin(angy).astype(dt_),
            "dftCi": ((np.cos(ang) * wk[None, :]).T / itot).astype(dt_),
            "dftSi": ((np.sin(ang) * wk[None, :]).T / itot).astype(dt_),
        }
        # 3M (Karatsuba) complex-multiply tables for the j transforms:
        # (Xr + iXi) @ (Cy -+ iSy) in 3 real matmuls instead of 4 using
        # precomputed Cy+Sy / Cy-Sy (the third operand, Xr+Xi, is an
        # elementwise add).  Opt-in via MICROHH_DFT_3M (see _use_dft_3m).
        self._dft_np["dftCpS"] = (np.cos(angy) + np.sin(angy)).astype(dt_)
        self._dft_np["dftCmS"] = (np.cos(angy) - np.sin(angy)).astype(dt_)
        # ---- symmetric/antisymmetric j-fold tables ----------------------
        # The whole j-chain (forward DFT -> per-mode diagonal solve with
        # bmatj[g] == bmatj[jtot-g] -> inverse DFT) is a real symmetric
        # circular convolution along j, so it decomposes into FOUR
        # independent half-size chains: {Xr, Xi} x {symmetric -> cosine
        # transform, antisymmetric -> sine transform}.  Each dense
        # (jtot x jtot) table shrinks to (jtot/2+1)^2 — 4x fewer MXU MACs
        # for the j transforms — with plain 2-D dots and natural mode
        # order (none of the reshape/layout hostility that made the
        # Cooley-Tukey splits slower in-step).  Fold weights: rows j=0 and
        # j=H are self-paired (weight 1); the inverse tables carry the
        # mode weights cg (2 except g in {0, H}) and the sine factor 2.
        if jtot % 2 == 0 and jtot >= 4:
            Hj = jtot // 2
            jf = np.arange(Hj + 1)
            angf = 2. * np.pi * np.outer(jf, jf) / jtot
            cgw = np.ones(Hj + 1)
            cgw[1:Hj] = 2.
            self._dft_np["dfj_C"] = np.cos(angf).astype(dt_)
            self._dft_np["dfj_S"] = np.sin(angf).astype(dt_)
            self._dft_np["dfj_Cg"] = (np.cos(angf) * cgw[:, None]).astype(dt_)
            self._dft_np["dfj_Sg"] = (2. * np.sin(angf)).astype(dt_)
            self._eig_np["eigbm_fj"] = bmji[:Hj + 1].astype(dt_)
        # ---- i-fold tables (same symmetry trick along the x axis) -------
        # Forward: half-contraction cos/sin tables (i', f) with i', f =
        # 0..itot/2; note ihalf == itot/2+1, so these are square.  Inverse:
        # the weighted dftCi/dftSi tables truncated to the first half of
        # the output columns (the rest reconstructs by symmetry).
        if itot % 2 == 0 and itot >= 4:
            self._dft_np["dfi_C"] = np.cos(ang[:ihalf]).astype(dt_)
            self._dft_np["dfi_S"] = np.sin(ang[:ihalf]).astype(dt_)
            self._dft_np["dfi_Ci"] = self._dft_np["dftCi"][:, :ihalf]
            self._dft_np["dfi_Si"] = self._dft_np["dftSi"][:, :ihalf]
        # two-stage Cooley-Tukey tables where the axis factors as 128*N2
        from .dft_split import build_split_tables, build_j4_tables, \
            j4_mode_perm, j4_splittable
        self._dft_np.update(build_split_tables(itot, dt_, "dsx"))
        self._dft_np.update(build_split_tables(jtot, dt_, "dsy"))
        # sublane-clean j-axis split (see dft_split.cdft_j4): the eigen
        # tables absorb the permuted mode order
        self._dft_np.update(build_j4_tables(jtot, dt_))
        if j4_splittable(jtot):
            self._eig_np["eigbm_y4"] = bmji[j4_mode_perm(jtot)].astype(dt_)
        # ---- fused radix-4/radix-3 Pallas transform tables (ops/pallas_dft) —
        # permuted mode order on BOTH axes; the wavenumber table absorbs it.
        # bmat* from the closed form (valid at any f; symmetric about N/2).
        from .pallas_dft import (build_pallas_dft_tables, pallas_dft_ok,
                                 pallas_mode_perm_j, pallas_mode_perm_x)
        self._dft_np.update(build_pallas_dft_tables(itot, jtot, dt_))
        if pallas_dft_ok(itot, jtot):
            bmati_f = 2. * (np.cos(2. * np.pi * np.arange(itot) / itot)
                            - 1.) * dxidxi
            bmatj_f = 2. * (np.cos(2. * np.pi * np.arange(jtot) / jtot)
                            - 1.) * dyidyi
            bm_pl = (bmatj_f[pallas_mode_perm_j(jtot)][:, None]
                     + bmati_f[pallas_mode_perm_x(itot)][None, :])
            # Thomas pivots for the permuted mode order (O(kmax) solve on
            # the radix-permuted spectra; the mean mode sits at (0,0) after the
            # permutation and gets the p_top=0 BC, so no dense patch)
            b_pl = (dz[:, None, None] ** 2 * rhoref[:, None, None]
                    * bm_pl[None] - (a + c)[:, None, None])
            b_pl[0] += a[0]
            b_pl[kmax - 1] += c[kmax - 1]
            b_pl[kmax - 1, 0, 0] -= 2. * c[kmax - 1]
            w_pl = np.empty_like(b_pl)
            w_pl[0] = b_pl[0]
            for k in range(1, kmax):
                w_pl[k] = b_pl[k] - a[k] * (c[k - 1] / w_pl[k - 1])
            self._winv_pl_np = (1. / w_pl).astype(dt_)
            bm_pl = bm_pl.copy()
            bm_pl[0, 0] = -1.      # dummy: the (0,0) column is overwritten
            self._eig_np["eigbm_pl"] = bm_pl.astype(dt_)
        self._built = True

    def device_params(self):
        p = {"winv": jnp.asarray(self._winv_np)}
        if getattr(self, "_winv_pl_np", None) is not None:
            p["winv_pl"] = jnp.asarray(self._winv_pl_np)
        for k, v in self._eig_np.items():
            p[k] = jnp.asarray(v)
        for k, v in self._dft_np.items():
            p[k] = jnp.asarray(v)
        return p

    def _use_dft(self):
        """DFT-by-matmul spectral transform: default on TPU — measured
        1.5x faster than XLA's FFT at 256^2 planes and 1.55x at the whole-
        step level for 512^3 (0.512 -> 0.331 s/step).  Opt-out via
        MICROHH_DFT_POISSON=0."""
        sw = os.environ.get("MICROHH_DFT_POISSON", "auto")
        if sw == "0":
            return False
        if sw == "1":
            return True
        return jax.default_backend() == "tpu"

    @staticmethod
    def _use_dft_split():
        """Two-stage Cooley-Tukey transforms inside the DFT path (see
        ops/dft_split.py): ~2-4x fewer MXU flops per transform when the
        axis length is a multiple of 128.  The lane-splitting variants
        (=1/=y/=x) MEASURED SLOWER at 512^3 on v5e (279 vs 180 ms per 3
        solves): the (..., 128, N2) reshapes force lane-hostile layouts
        that cost more than the flops saved — kept opt-in.  =y4 selects
        the sublane-clean j-axis split with permuted mode order
        (dft_split.cdft_j4), whose reshape is a row-major no-op; in
        ISOLATION it solves 2.2x faster (44 vs 96 ms/solve at 512^3),
        but INSIDE the step it measured 255 vs 243 ms/step (2026-08-18):
        XLA's whole-program layout assignment already runs the dense
        matmuls on {0,2,1}-permuted spectra far below their isolated
        cost, and the split's batched-c dots break that.  Kept opt-in
        for grids where the dense tables dominate."""
        return os.environ.get("MICROHH_DFT_SPLIT", "0")

    @staticmethod
    def _use_dft_pallas(dtype):
        """Fused radix-4/radix-3 Pallas transform kernels (ops/pallas_dft): the
        forward x+j transforms in ONE per-plane kernel and likewise the
        inverse — 4x-shorter MXU contractions with VMEM-local butterflies
        and twiddles, where the XLA-level splits/folds lost to layout
        assignment.  MEASURED at 512^3 on v5e (2026-08-18): 188.8 vs 212.1
        ms/step, DIV unchanged (2.1e-5) — the default on TPU for f32
        (Mosaic cannot compile f64 kernels; see model.py's f64 fallback).
        MICROHH_DFT_PALLAS=0/1 overrides."""
        sw = os.environ.get("MICROHH_DFT_PALLAS", "auto")
        if sw == "0":
            return False
        if sw == "1":
            return True
        return (jax.default_backend() == "tpu"
                and dtype == jnp.float32)

    def _eigen_ri(self, Yr, Yi, pp, bm):
        """Fast-diagonalization vertical solve on separated real/imag
        spectra with the given per-mode wavenumber table; returns (xr, xi)
        with the mean-mode (0,0) dense patch applied."""
        lvl = os.environ.get("MICROHH_EIGEN_PRECISION",
                             "high" if Yr.dtype == jnp.float32
                             else "highest")
        ep = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}[lvl]
        ee = functools.partial(jnp.einsum, precision=ep)
        Vim, V = pp["eigVim"], pp["eigV"]
        denom = pp["eiglam"][:, None, None] + bm[None]
        gr = ee("kl,ljf->kjf", Vim, Yr) / denom
        gi = ee("kl,ljf->kjf", Vim, Yi) / denom
        xr = ee("kl,ljf->kjf", V, gr)
        xi = ee("kl,ljf->kjf", V, gi)
        x0r = jnp.einsum("kl,l->k", pp["eigM0"], Yr[:, 0, 0])
        x0i = jnp.einsum("kl,l->k", pp["eigM0"], Yi[:, 0, 0])
        return xr.at[:, 0, 0].set(x0r), xi.at[:, 0, 0].set(x0i)

    def _tdma_pl(self, Yr, Yi, pp):
        """Thomas solve on the radix-permuted spectra: one Pallas kernel
        over all permuted x-mode lanes (winv_pl encodes the per-mode pivots
        incl. the mean-mode top BC, so no dense patch).  O(kmax)
        elementwise work per mode at exact f32 vs the eigen path's
        O(kmax^2) MXU matmuls at HIGH — memory-bound at one read + one
        write of the spectra plus the pivot table."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        kmax, jtot, nf = Yr.shape
        dt = Yr.dtype
        t3 = jnp.stack([
            jnp.concatenate([jnp.zeros((1,), dt),
                             -self.a_k[1:, 0, 0].astype(dt)]),
            jnp.concatenate([-self.c_k[:-1, 0, 0].astype(dt),
                             jnp.zeros((1,), dt)]),
            self.dz2[:, 0, 0].astype(dt),
        ], axis=1)                           # (kmax, 3): [-a, -c, dz^2]
        TJ = 8 if jtot % 8 == 0 else 1
        blk = pl.BlockSpec((kmax, TJ, nf), lambda j: (0, j, 0))
        out_shape = jax.ShapeDtypeStruct(Yr.shape, dt)
        return pl.pallas_call(
            functools.partial(_tdma_dz2_kernel, kmax),
            grid=(jtot // TJ,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk, blk],
            out_specs=[blk, blk],
            out_shape=[out_shape, out_shape],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * (1 << 20)),
            interpret=jax.default_backend() != "tpu",
        )(t3, Yr, Yi, pp["winv_pl"])

    @staticmethod
    def _use_pl_tdma():
        """Thomas solve instead of the eigen matmuls inside the radix
        pipeline (default on: measured 147 -> ~135 ms/step at 512^3, DIV
        unchanged).  MICROHH_PL_TDMA=0 restores the eigen matmuls."""
        return os.environ.get("MICROHH_PL_TDMA", "1") == "1"

    def _solve_dft_pallas(self, ctx, rhs, pp):
        """Radix-4 Pallas transforms around the eigen solve (doubly
        permuted mode order; see ops/pallas_dft.py).  Mosaic lowers only
        DEFAULT/HIGHEST dot precisions, so the f32 kernels run HIGHEST
        (exact f32) both ways — the 4x-shorter contractions make that
        cheaper than the dense path's HIGH forward, and it removes the
        forward-transform rounding entirely."""
        from .pallas_dft import dft2_fwd, dft2_inv

        def kprec(p):
            if p is None or p == jax.lax.Precision.DEFAULT:
                return p
            return jax.lax.Precision.HIGHEST

        interp = jax.default_backend() != "tpu"
        Yr, Yi = dft2_fwd(rhs, pp, kprec(_fwd_precision(rhs.dtype)),
                          interpret=interp)
        if self._use_pl_tdma() and "winv_pl" in pp:
            xr, xi = self._tdma_pl(Yr, Yi, pp)
        else:
            xr, xi = self._eigen_ri(Yr, Yi, pp, pp["eigbm_pl"])
        return dft2_inv(xr, xi, pp, kprec(_mxu_precision(rhs.dtype)),
                        self.grid.itot, interpret=interp)

    def _solve_dft_sharded(self, ctx, rhs, pp, plan):
        """Distributed fast spectral solve — the TPU form of the
        reference's transpose-interleaved FFTs (transpose.cxx:118-245).

        The single-chip fast kernels run unchanged PER SHARD between the
        plan's all-to-all reshards: in the z-slab stage every device holds
        full (jtot, itot) planes for kmax/n levels, so the radix Pallas
        DFT (or the dense MXU-DFT einsums) is shard-local inside a
        shard_map; in the mode-slab stage every device holds full-kmax
        columns for jtot/n rows of modes, so the Pallas Thomas pivot sweep
        is shard-local with its pivot table sliced over j."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh, axes = plan.mesh, plan.axes
        zspec = P(axes, None, None)
        mspec = P(None, axes, None)
        interp = jax.default_backend() != "tpu"
        prec = _mxu_precision(rhs.dtype)
        fprec = _fwd_precision(rhs.dtype)

        use_pl = (self._use_dft_pallas(rhs.dtype) and "plxf_c0" in pp
                  and "winv_pl" in pp and self._use_pl_tdma())
        if interp and os.environ.get("MICROHH_DFT_PALLAS") == "1":
            # CPU tests exercise the Pallas path in interpret mode
            use_pl = "plxf_c0" in pp and "winv_pl" in pp

        self.solve_path = ("dft_sharded_pallas" if use_pl
                           else "dft_sharded_dense")
        rhs = plan.zslab(rhs)
        if use_pl:
            from .pallas_dft import dft2_fwd, dft2_inv

            def kprec(p):
                if p is None or p == jax.lax.Precision.DEFAULT:
                    return p
                return jax.lax.Precision.HIGHEST

            fwd_tabs = {n: pp[n] for n in FWD_TABLES}
            inv_tabs = {n: pp[n] for n in INV_TABLES}
            fwd = shard_map(
                lambda r, t: dft2_fwd(r, t, kprec(fprec), interpret=interp),
                mesh=mesh, in_specs=(zspec, P()),
                out_specs=(zspec, zspec), check_rep=False)
            Yr, Yi = fwd(rhs, fwd_tabs)
            Yr = plan.modeslab(Yr)
            Yi = plan.modeslab(Yi)
            tdma = shard_map(
                lambda a, b, w: self._tdma_pl(a, b, {"winv_pl": w}),
                mesh=mesh, in_specs=(mspec, mspec, mspec),
                out_specs=(mspec, mspec), check_rep=False)
            xr, xi = tdma(Yr, Yi, pp["winv_pl"])
            xr = plan.zslab(xr, from_modes=True)
            xi = plan.zslab(xi, from_modes=True)
            inv = shard_map(
                lambda a, b, t: dft2_inv(a, b, t, kprec(prec),
                                         self.grid.itot, interpret=interp),
                mesh=mesh, in_specs=(zspec, zspec, P()),
                out_specs=zspec, check_rep=False)
            return plan.pencil(inv(xr, xi, inv_tabs))

        # dense MXU-DFT stages: einsums contract only shard-local axes, so
        # GSPMD keeps them communication-free between the reshards
        e = functools.partial(jnp.einsum, precision=prec)
        ef = functools.partial(jnp.einsum, precision=fprec)
        C, S = pp["dftC"], pp["dftS"]
        Cy, Sy = pp["dftCy"], pp["dftSy"]
        Xr = ef("kji,if->kjf", rhs, C)
        Xi = -ef("kji,if->kjf", rhs, S)
        Yr = ef("kjf,jg->kgf", Xr, Cy) + ef("kjf,jg->kgf", Xi, Sy)
        Yi = ef("kjf,jg->kgf", Xi, Cy) - ef("kjf,jg->kgf", Xr, Sy)
        Yr = plan.modeslab(Yr)
        Yi = plan.modeslab(Yi)
        xr, xi = self._eigen_ri(Yr, Yi, pp, pp["eigbm"])
        xr = plan.zslab(xr, from_modes=True)
        xi = plan.zslab(xi, from_modes=True)
        n_j = xr.shape[1]
        Zr = (e("kgf,jg->kjf", xr, Cy) - e("kgf,jg->kjf", xi, Sy)) / n_j
        Zi = (e("kgf,jg->kjf", xi, Cy) + e("kgf,jg->kjf", xr, Sy)) / n_j
        return plan.pencil(self._idft_x(Zr, Zi, pp, self.grid.itot, e))

    def _solve_dft(self, ctx, rhs, pp):
        """Forward 2-D real DFT, eigen solve on real/imag parts, inverse —
        all as MXU matmuls (no complex arrays anywhere)."""
        if (self._use_dft_pallas(rhs.dtype) and "plxf_c0" in pp
                and "eigbm_pl" in pp and self._use_eigen()
                and not self._use_dft_tdma()
                and (rhs.dtype == jnp.float32
                     or jax.default_backend() != "tpu")):
            return self._solve_dft_pallas(ctx, rhs, pp)
        prec = _mxu_precision(rhs.dtype)
        fprec = _fwd_precision(rhs.dtype)
        C, S = pp["dftC"], pp["dftS"]
        Cy, Sy = pp["dftCy"], pp["dftSy"]
        Ci, Si = pp["dftCi"], pp["dftSi"]
        e = functools.partial(jnp.einsum, precision=prec)
        ef = functools.partial(jnp.einsum, precision=fprec)
        from .dft_split import rdft_last_fwd, cdft_axis1, cdft_j4
        split = self._use_dft_split()
        split_x = split in ("1", "x") and "dsx_twc" in pp
        split_y = split in ("1", "y") and "dsy_twc" in pp
        # the permuted-order j split needs the eigen path (its per-mode
        # tables are permuted to match; the TDMA pivots are not)
        split_y4 = (split == "y4" and "dy4_mc" in pp
                    and "eigbm_y4" in pp and not self._use_dft_tdma())
        # symmetric/antisymmetric j-fold (see set_values): needs the eigen
        # path (the folded spectra reuse its linearity) and excludes the
        # other j variants
        fold_j = (self._use_dft_foldj() and "dfj_C" in pp
                  and not (split_y or split_y4)
                  and self._use_dft_3m() == "0"
                  and not self._use_dft_tdma())
        n2x = self.grid.itot // 128
        n2y = self.grid.jtot // 128
        ihalf = self.grid.itot // 2 + 1

        # forward: rfft along i, then full fft along j
        if split_x:
            Xr, Xi = rdft_last_fwd(rhs, pp, "dsx", n2x, ihalf, ef)
        elif self._use_dft_foldi() and "dfi_C" in pp:
            # fold the REAL input about i -> itot-i: the cos transform
            # consumes the even part, the sin transform the odd part —
            # contraction length itot/2+1 instead of itot
            Hi = rhs.shape[2] // 2
            Rp = jnp.concatenate(
                [rhs[..., :1], rhs[..., 1:Hi] + rhs[..., :Hi:-1],
                 rhs[..., Hi:Hi + 1]], axis=-1)
            Rm = jnp.concatenate(
                [rhs[..., :1], rhs[..., 1:Hi] - rhs[..., :Hi:-1],
                 rhs[..., Hi:Hi + 1]], axis=-1)
            Xr = ef("kji,if->kjf", Rp, pp["dfi_C"])
            Xi = -ef("kji,if->kjf", Rm, pp["dfi_S"])
        else:
            Xr = ef("kji,if->kjf", rhs, C)
            Xi = -ef("kji,if->kjf", rhs, S)
        m3 = self._use_dft_3m()
        if fold_j:
            Zr, Zi = self._solve_dft_foldj(ctx, Xr, Xi, pp, rhs.shape[1],
                                           e, ef)
            return self._idft_x(Zr, Zi, pp, rhs.shape[2], e)
        if split_y4:
            Yr, Yi = cdft_j4(Xr, Xi, pp, -1, ef)
        elif split_y:
            Yr, Yi = cdft_axis1(Xr, Xi, pp, "dsy", n2y, -1, ef)
        elif m3 in ("1", "fwd"):
            t1 = ef("kjf,jg->kgf", Xr + Xi, Cy)
            Yr = t1 - ef("kjf,jg->kgf", Xi, pp["dftCmS"])
            Yi = t1 - ef("kjf,jg->kgf", Xr, pp["dftCpS"])
        else:
            Yr = ef("kjf,jg->kgf", Xr, Cy) + ef("kjf,jg->kgf", Xi, Sy)
            Yi = ef("kjf,jg->kgf", Xi, Cy) - ef("kjf,jg->kgf", Xr, Sy)

        if self._use_dft_tdma():
            # O(kmax) Thomas solve per mode in a Pallas kernel; the winv
            # pivot table already encodes the mean-mode top BC, so no
            # eigM0 patch is needed.
            xr, xi = self._tdma_ri(Yr * self.dz2, Yi * self.dz2,
                                   pp["winv"], Yr.shape[0])
        else:
            # fast-diagonalization vertical solve per component; its MXU
            # precision is independently tunable (MICROHH_EIGEN_PRECISION)
            # because its rounding feeds the divergence residual differently
            # from the transforms.  MEASURED at 512^3 (2026-08-17): eigen
            # at HIGH (bf16_3x) leaves DIV unchanged (4.02e-5 vs 3.99e-5)
            # and saves 12 ms/step, while HIGH transforms blow DIV up 25x
            # (the inverse-Laplacian k^2 amplifies their broadband error;
            # the eigen solve's error is concentrated at smooth modes) —
            # so HIGH is the f32 default HERE ONLY.
            lvl = os.environ.get("MICROHH_EIGEN_PRECISION",
                                 "high" if rhs.dtype == jnp.float32
                                 else "highest")
            ep = {"highest": jax.lax.Precision.HIGHEST,
                  "high": jax.lax.Precision.HIGH,
                  "default": jax.lax.Precision.DEFAULT}[lvl]
            ee = functools.partial(jnp.einsum, precision=ep)
            Vim, V = pp["eigVim"], pp["eigV"]
            bm_t = pp["eigbm_y4"] if split_y4 else pp["eigbm"]
            denom = pp["eiglam"][:, None, None] + bm_t[None]
            gr = ee("kl,ljf->kjf", Vim, Yr) / denom
            gi = ee("kl,ljf->kjf", Vim, Yi) / denom
            xr = ee("kl,ljf->kjf", V, gr)
            xi = ee("kl,ljf->kjf", V, gi)
            x0r = e("kl,l->k", pp["eigM0"], Yr[:, 0, 0])
            x0i = e("kl,l->k", pp["eigM0"], Yi[:, 0, 0])
            xr = xr.at[:, 0, 0].set(x0r)
            xi = xi.at[:, 0, 0].set(x0i)

        # inverse: ifft along j, then hermitian-weighted irfft along i
        n_j = rhs.shape[1]
        if split_y4:
            Zr, Zi = cdft_j4(xr, xi, pp, +1, e)
            Zr = Zr / n_j
            Zi = Zi / n_j
        elif split_y:
            Zr, Zi = cdft_axis1(xr, xi, pp, "dsy", n2y, +1, e)
            Zr = Zr / n_j
            Zi = Zi / n_j
        elif m3 in ("1", "inv"):
            t1 = e("kgf,jg->kjf", xr + xi, Cy)
            Zr = (t1 - e("kgf,jg->kjf", xi, pp["dftCpS"])) / n_j
            Zi = (t1 - e("kgf,jg->kjf", xr, pp["dftCmS"])) / n_j
        else:
            Zr = (e("kgf,jg->kjf", xr, Cy) - e("kgf,jg->kjf", xi, Sy)) / n_j
            Zi = (e("kgf,jg->kjf", xi, Cy) + e("kgf,jg->kjf", xr, Sy)) / n_j
        return self._idft_x(Zr, Zi, pp, rhs.shape[2], e)

    def _idft_x(self, Zr, Zi, pp, n_i, e):
        """Hermitian-weighted inverse real DFT along i.  With the i-fold
        enabled the two (ihalf x itot) matmuls shrink to (ihalf x ihalf):
        the weighted tables are symmetric (cos) / antisymmetric (sin)
        about i -> itot-i, so out[i'] = P+M and out[itot-i'] = P-M with
        P = Zr @ Ci_half, M = -Zi @ Si_half."""
        if self._use_dft_foldi() and "dfi_Ci" in pp and n_i % 2 == 0:
            H = n_i // 2
            P = e("kjf,fi->kji", Zr, pp["dfi_Ci"])
            M = -e("kjf,fi->kji", Zi, pp["dfi_Si"])
            return jnp.concatenate(
                [P + M, (P - M)[..., H - 1:0:-1]], axis=-1)
        return e("kjf,fi->kji", Zr, pp["dftCi"]) - e("kjf,fi->kji", Zi,
                                                     pp["dftSi"])

    @staticmethod
    def _use_dft_foldi():
        """Symmetry-folded x transforms: the forward rfft folds its REAL
        input into even/odd halves (cos/sin transforms of contraction
        length itot/2+1) and the inverse folds its OUTPUT — 2x fewer
        x-stage MACs.  The folds are lane-axis reversals (cheap VPU
        permutes).  Opt-in until measured in-step (MICROHH_DFT_FOLDI=1)."""
        return os.environ.get("MICROHH_DFT_FOLDI", "0") == "1"

    def _solve_dft_foldj(self, ctx, Xr, Xi, pp, n_j, e, ef):
        """j-stage of the DFT solve on symmetry-folded half spectra.

        The j-chain is a real symmetric circular convolution (forward DFT,
        per-mode diagonal eigen solve with bmatj[g] == bmatj[N-g], inverse
        DFT), so it splits into four independent half-size chains: the
        symmetric part of each of Xr/Xi through a cosine transform and the
        antisymmetric part through a sine transform.  4x fewer j-matmul
        MACs than the dense path; fold/unfold are slice adds/concats along
        the sublane axis (no reshapes).  Mean-mode (0,0) patch: the g=0
        row of the folded spectra IS the true g=0 mode (the sine parts
        vanish there), so the dense eigM0 solve patches the cosine chains
        exactly as the dense path patches Yr/Yi."""
        H = n_j // 2

        def foldp(a):
            return jnp.concatenate(
                [a[:, :1], a[:, 1:H] + a[:, :H:-1], a[:, H:H + 1]], axis=1)

        def foldm(a):
            # rows 0 and H multiply zero rows of the sine table; reuse the
            # unpaired values there rather than materializing zeros
            return jnp.concatenate(
                [a[:, :1], a[:, 1:H] - a[:, :H:-1], a[:, H:H + 1]], axis=1)

        Ch, Sh = pp["dfj_C"], pp["dfj_S"]
        Cr = ef("kjf,jg->kgf", foldp(Xr), Ch)
        Sr = ef("kjf,jg->kgf", foldm(Xr), Sh)
        Ci_ = ef("kjf,jg->kgf", foldp(Xi), Ch)
        Si_ = ef("kjf,jg->kgf", foldm(Xi), Sh)

        lvl = os.environ.get("MICROHH_EIGEN_PRECISION",
                             "high" if Xr.dtype == jnp.float32
                             else "highest")
        ep = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}[lvl]
        ee = functools.partial(jnp.einsum, precision=ep)
        Vim, V = pp["eigVim"], pp["eigV"]
        denom = pp["eiglam"][:, None, None] + pp["eigbm_fj"][None]

        def esolve(Y):
            g = ee("kl,ljf->kjf", Vim, Y) / denom
            return ee("kl,ljf->kjf", V, g)

        xCr, xSr = esolve(Cr), esolve(Sr)
        xCi, xSi = esolve(Ci_), esolve(Si_)
        x0r = e("kl,l->k", pp["eigM0"], Cr[:, 0, 0])
        x0i = e("kl,l->k", pp["eigM0"], Ci_[:, 0, 0])
        xCr = xCr.at[:, 0, 0].set(x0r)
        xCi = xCi.at[:, 0, 0].set(x0i)

        # inverse cosine/sine transforms (mode weights folded into the
        # tables), then unfold: x[j] = (P+M)/N, x[N-j] = (P-M)/N
        Cg, Sg = pp["dfj_Cg"], pp["dfj_Sg"]
        P_r = e("kgf,gj->kjf", xCr, Cg)
        M_r = e("kgf,gj->kjf", xSr, Sg)
        P_i = e("kgf,gj->kjf", xCi, Cg)
        M_i = e("kgf,gj->kjf", xSi, Sg)
        Zr = jnp.concatenate([P_r + M_r, (P_r - M_r)[:, H - 1:0:-1]],
                             axis=1) / n_j
        Zi = jnp.concatenate([P_i + M_i, (P_i - M_i)[:, H - 1:0:-1]],
                             axis=1) / n_j
        return Zr, Zi

    @staticmethod
    def _use_dft_foldj():
        """Symmetry-folded j transforms (see _solve_dft_foldj): 4x fewer
        j-stage MXU MACs via half-size cosine/sine tables.  Opt-in until
        measured in-step on the TPU (MICROHH_DFT_FOLDJ=1)."""
        return os.environ.get("MICROHH_DFT_FOLDJ", "0") == "1"

    @staticmethod
    def _use_dft_3m():
        """3M complex multiply for the j-axis DFT matmuls: 3 real matmuls
        + 1 elementwise add instead of 4 matmuls (12.5% fewer transform
        flops overall).  ``fwd``/``inv`` select one direction, ``1`` both.
        The subtractive cancellation in t1-t3 costs ~1 bit, which matters
        only on the k^2-amplified inverse — measure DIV alongside time."""
        return os.environ.get("MICROHH_DFT_3M", "0")

    @staticmethod
    def _use_eigen():
        return os.environ.get("MICROHH_EIGEN_POISSON", "1") == "1"

    def _solve_spectral_eigen(self, ctx, p_hat, pp, kmax):
        """x = V diag(1/(lam+bm)) V^-1 M^-1 (dz^2 p_hat) as two k-axis
        matmuls (real eigenbasis applied to the complex spectra; XLA lowers
        to real MXU dots)."""
        prec = _mxu_precision(p_hat.real.dtype)
        Vim = pp["eigVim"]
        V = pp["eigV"]
        lam = pp["eiglam"]
        bm = pp["eigbm"]
        g = jnp.einsum("kl,ljf->kjf", Vim, p_hat, precision=prec)
        g = g / (lam[:, None, None] + bm[None])
        x = jnp.einsum("kl,ljf->kjf", V, g, precision=prec)
        x0 = jnp.einsum("kl,l->k", pp["eigM0"], p_hat[:, 0, 0],
                        precision=prec)
        return x.at[:, 0, 0].set(x0)

    def input(self, ctx, s, t, dti):
        """RHS = divergence of rho*(tend + field/dt) (pres_2.cxx:156-196)."""
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        ut, vt, wt = t["u"], t["v"], t["w"]

        uu = (ut + u * dti)[ks:ke]
        vv = (vt + v * dti)[ks:ke]
        ww = (wt + w * dti)[ks:ke + 1]

        from .stencil import ip, jp
        rho = ctx.rhoref[ks:ke][:, None, None]
        rhoh = ctx.rhorefh[ks:ke + 1][:, None, None]
        dzi = ctx.dzi[ks:ke][:, None, None]
        rhs = (rho * ((ip(uu) - uu) * ctx.dxi + (jp(vv) - vv) * ctx.dyi)
               + (rhoh[1:] * ww[1:] - rhoh[:-1] * ww[:-1]) * dzi)
        return rhs  # (kmax, jtot, itot)

    def _use_dft_tdma(self):
        """Vertical Thomas solve inside the DFT path (real/imag spectra are
        already separated there, so no complex<->real packing applies).
        MEASURED SLOWER than the eigen matmuls at 256^3 on v5e (41.2 vs
        34.7 ms/step, 2026-08-17 ablation): the O(kmax) sequential scan
        dispatches ~2*kmax tiny VMEM steps while the O(kmax^2) eigen
        matmuls ride the MXU at full rate — flops are cheaper than
        latency here.  Opt-in via MICROHH_DFT_TDMA=1; requires
        lane-aligned (itot//2) %% 128 == 0."""
        sw = os.environ.get("MICROHH_DFT_TDMA", "0")
        if sw == "0":
            return False
        backend_ok = jax.default_backend() == "tpu" or self._tdma_interpret
        lanes_ok = (self.grid.itot // 2) % 128 == 0 \
            and self.grid.jtot % 8 == 0
        # the kernel holds ~10 (kmax, 8, nfm) f32 buffers in scoped VMEM
        # (operands + outputs, double-buffered): 16MB limit -> off for
        # kmax*nfm beyond ~48k (e.g. 512^3; the eigen path covers it)
        fits = 10 * self.grid.ktot * 8 * (self.grid.itot // 2) * 4 \
            <= 15 * 1024 * 1024
        if sw == "1":
            return lanes_ok
        return backend_ok and lanes_ok and fits

    def _use_pallas_tdma(self, ctx):
        # Measured neutral at 256^3 on v5e (the real/imag packing copies
        # around the kernel offset the scan-traffic savings); opt-in until
        # the FFT can feed the kernel without the complex<->real shuffles.
        if os.environ.get("MICROHH_PALLAS_TDMA", "0") != "1":
            return False
        backend_ok = jax.default_backend() == "tpu" or self._tdma_interpret
        # the kernel tiles (itot//2) lanes; Nyquist handled separately
        return backend_ok and (self.grid.itot // 2) % 128 == 0

    _tdma_interpret = False  # tests force interpret mode on CPU

    def _tdma_ri(self, dr, di, winv, kmax):
        """Batched Thomas solve on separated real/imag rhs (already
        multiplied by dz^2): Pallas kernel over the (ky, kx<Nyquist) lanes
        + associative-scan fallback for the single Nyquist plane.  O(kmax)
        work per mode vs the eigen path's O(kmax^2) matmul flops."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nfm = self.grid.itot // 2           # kernel lanes (excl. Nyquist)
        wv = winv[..., :nfm]

        af_cf = jnp.stack([
            jnp.concatenate([jnp.zeros((1,), dr.dtype),
                             -self.a_k[1:, 0, 0].astype(dr.dtype)]),
            jnp.concatenate([-self.c_k[:-1, 0, 0].astype(dr.dtype),
                             jnp.zeros((1,), dr.dtype)]),
        ], axis=1)                           # (kmax, 2): [af, cf] columns

        jtot = dr.shape[1]
        TJ = 8
        grid = (jtot // TJ,)
        blk = pl.BlockSpec((kmax, TJ, nfm), lambda j: (0, j, 0))
        out_shape = jax.ShapeDtypeStruct(dr[..., :nfm].shape, dr.dtype)
        xr, xi = pl.pallas_call(
            functools.partial(_tdma_kernel, kmax),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk, blk],
            out_specs=[blk, blk],
            out_shape=[out_shape, out_shape],
            interpret=self._tdma_interpret,
        )(af_cf, dr[..., :nfm], di[..., :nfm], wv)

        # Nyquist kx plane via the scan path (kmax, jtot, 1) — tiny
        w_ny = winv[..., nfm:]
        outs = []
        for dpart in (dr[..., nfm:], di[..., nfm:]):
            A_f = jnp.broadcast_to(-self.a_k * w_ny, dpart.shape).astype(dpart.dtype)
            A_f = A_f.at[0].set(0.)
            y = _assoc_linear_scan(A_f, dpart * w_ny, reverse=False)
            A_b = jnp.broadcast_to(-self.c_k * w_ny, dpart.shape).astype(dpart.dtype)
            A_b = A_b.at[kmax - 1].set(0.)
            outs.append(_assoc_linear_scan(A_b, y, reverse=True))
        return (jnp.concatenate([xr, outs[0]], axis=-1),
                jnp.concatenate([xi, outs[1]], axis=-1))

    def _solve_spectral_pallas(self, ctx, p_hat, winv, kmax):
        """Complex-spectrum wrapper around _tdma_ri."""
        d = p_hat * self.dz2
        xr, xi = self._tdma_ri(jnp.real(d), jnp.imag(d), winv, kmax)
        return xr + 1j * xi

    def solve(self, ctx, rhs, pp=None):
        """Return pressure interior (kmax, jtot, itot)."""
        winv = pp["winv"] if pp is not None else jnp.asarray(self._winv_np)
        kmax = rhs.shape[0]

        # Multi-chip: slab-transpose dataflow (reference transpose.cxx) —
        # z-slabs around the FFTs, mode-slabs around the vertical solve.
        from ..parallel.mesh import spectral_slab_plan
        plan = spectral_slab_plan(self.mesh, kmax, rhs.shape[1])

        if (self._use_dft() and pp is not None and "dftC" in pp
                and self._use_eigen()):
            if plan is None:
                self.solve_path = "dft"
                return self._solve_dft(ctx, rhs, pp).astype(rhs.dtype)
            return self._solve_dft_sharded(ctx, rhs, pp, plan).astype(rhs.dtype)

        self.solve_path = "fft" if plan is None else "fft_slab"
        if plan is not None:
            rhs = plan.zslab(rhs)
        p_hat = jnp.fft.rfft2(rhs, axes=(-2, -1))
        if plan is not None:
            p_hat = plan.modeslab(p_hat)

        if plan is None and self._use_pallas_tdma(ctx):
            x = self._solve_spectral_pallas(ctx, p_hat, winv, kmax)
        elif self._use_eigen():
            ep = pp if (pp is not None and "eigV" in pp) else {
                k: jnp.asarray(v) for k, v in self._eig_np.items()}
            x = self._solve_spectral_eigen(ctx, p_hat, ep, kmax)
        else:
            d = p_hat * self.dz2
            # Forward substitution: y[k] = (d[k] - a[k]*y[k-1]) / w[k].
            # The multipliers stay REAL (half the bytes of the complex rhs
            # through the scan's internal passes).
            A_f = jnp.broadcast_to(-self.a_k * winv, d.shape)
            A_f = A_f.at[0].set(0.)
            y = _assoc_linear_scan(A_f, d * winv, reverse=False)
            # Back substitution: x[k] = y[k] - (c[k]/w[k]) * x[k+1].
            A_b = jnp.broadcast_to(-self.c_k * winv, d.shape)
            A_b = A_b.at[kmax - 1].set(0.)
            x = _assoc_linear_scan(A_b, y, reverse=True)

        if plan is not None:
            x = plan.zslab(x, from_modes=True)
        p = jnp.fft.irfft2(x, s=rhs.shape[-2:], axes=(-2, -1))
        if plan is not None:
            p = plan.pencil(p)
        return p.astype(rhs.dtype)

    def output(self, ctx, t, p_full):
        """ut -= grad p (pres_2.cxx:364-387).  Written as pad+add (pure
        elementwise, fuses into one HBM pass per field) instead of
        .at[].add scatters, which XLA materializes separately."""
        ks, ke = ctx.ks, ctx.ke
        kc = t["u"].shape[0]
        t = dict(t)
        dp_x = (p_full - im(p_full))[ks:ke] * ctx.dxi
        dp_y = (p_full - jm(p_full))[ks:ke] * ctx.dyi
        dp_z = (p_full[ks + 1:ke] - p_full[ks:ke - 1]) * ctx.dzhi[ks + 1:ke][:, None, None]

        def pad(a, lo):
            return jnp.pad(a, ((lo, kc - lo - a.shape[0]), (0, 0), (0, 0)))

        t["u"] = t["u"] - pad(dp_x, ks)
        t["v"] = t["v"] - pad(dp_y, ks)
        t["w"] = t["w"] - pad(dp_z, ks + 1)
        return t

    def exec(self, ctx, s, t, aux, subdt, pp=None):
        if not self._built:
            raise RuntimeError("Pres2.set_values() not called")
        dti = 1. / subdt
        rhs = self.input(ctx, s, t, dti)
        p_int = self.solve(ctx, rhs, pp)
        # Store p with ghosts: zero-gradient at both walls
        # (pres_2.cxx:350-358); the top ghost feeds the budget statistics.
        p_full = jnp.zeros_like(s["u"])
        p_full = p_full.at[ctx.ks:ctx.ke].set(p_int)
        p_full = p_full.at[ctx.ks - 1].set(p_int[0])
        p_full = p_full.at[ctx.ke].set(p_int[-1])
        t = self.output(ctx, t, p_full)
        aux = dict(aux)
        aux["p"] = p_full
        return t, aux

    def exec_star(self, ctx, s_star, aux, subdt, pp=None):
        """Projection for the RK-folded kernel path: the fused tendency
        kernel already produced s* = s + subdt*t (pre-projection), so the
        rhs is div(rho s*)/subdt directly and the caller applies the
        returned gradient planes to both s* and the carried tendency
        (pres_2.cxx rhs/update split, :156-196 + :364-387)."""
        if not self._built:
            raise RuntimeError("Pres2.set_values() not called")
        ks, ke = ctx.ks, ctx.ke
        dti = 1. / subdt
        u, v, w = s_star["u"], s_star["v"], s_star["w"]
        from .stencil import ip, jp
        rho = ctx.rhoref[ks:ke][:, None, None]
        rhoh = ctx.rhorefh[ks:ke + 1][:, None, None]
        dzi = ctx.dzi[ks:ke][:, None, None]
        uu = u[ks:ke] * dti
        vv = v[ks:ke] * dti
        ww = w[ks:ke + 1] * dti
        rhs = (rho * ((ip(uu) - uu) * ctx.dxi + (jp(vv) - vv) * ctx.dyi)
               + (rhoh[1:] * ww[1:] - rhoh[:-1] * ww[:-1]) * dzi)
        p_int = self.solve(ctx, rhs, pp)
        p_full = jnp.zeros_like(u)
        p_full = p_full.at[ks:ke].set(p_int)
        p_full = p_full.at[ks - 1].set(p_int[0])
        p_full = p_full.at[ke].set(p_int[-1])

        kc = u.shape[0]

        def pad(a, lo):
            return jnp.pad(a, ((lo, kc - lo - a.shape[0]), (0, 0), (0, 0)))

        gx = pad((p_full - im(p_full))[ks:ke] * ctx.dxi, ks)
        gy = pad((p_full - jm(p_full))[ks:ke] * ctx.dyi, ks)
        gz = pad((p_full[ks + 1:ke] - p_full[ks:ke - 1])
                 * ctx.dzhi[ks + 1:ke][:, None, None], ks + 1)
        aux = dict(aux)
        aux["p"] = p_full
        return (gx, gy, gz), aux

    def divergence_max(self, ctx, s):
        """max |div(rho u)| (reference calc_divergence)."""
        ks, ke = ctx.ks, ctx.ke
        from .stencil import ip, jp
        u, v, w = s["u"][ks:ke], s["v"][ks:ke], s["w"]
        rho = ctx.rhoref[ks:ke][:, None, None]
        rhoh = ctx.rhorefh[ks:ke + 1][:, None, None]
        dzi = ctx.dzi[ks:ke][:, None, None]
        div = (rho * ((ip(u) - u) * ctx.dxi + (jp(v) - v) * ctx.dyi)
               + (rhoh[1:] * w[ks + 1:ke + 1] - rhoh[:-1] * w[ks:ke]) * dzi)
        return jnp.max(jnp.abs(div))
