"""4th-order spectral Poisson solver (reference ``src/pres_4.cxx``).

Same FFT structure as pres_2 but with 4th-order modified wavenumbers and a
**heptadiagonal** vertical system of kmax+4 rows (2 BC rows per wall).  The
TPU design exploits that the matrix is time-independent: the full hdma LU
factorization (pres_4.cxx:573-680) is done ONCE in float64 numpy, vectorized
over every (ky, kx) mode; the per-step work is just the forward/backward
substitutions — two depth-3 linear recurrences along k run as ``lax.scan``
with all modes vectorized across the VPU lanes.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import fd
from .stencil import im, ip, jm, jp


def _hdma_factorize(m):
    """Vectorized LU factorization of the hepta system.

    m: (7, N, ...) bands m1..m7 for N=kmax+4 rows.  Mirrors
    Pres_4::hdma's factorization exactly (pres_4.cxx).
    """
    m1, m2, m3, m4, m5, m6, m7 = [m[i].copy() for i in range(7)]
    N = m1.shape[0]
    kmax = N - 4

    # k = 0
    m1[0] = 1.
    m2[0] = 1.
    m3[0] = 1. / m4[0]
    m4[0] = 1.
    m5[0] = m5[0] * m3[0]
    m6[0] = m6[0] * m3[0]
    m7[0] = m7[0] * m3[0]
    # k = 1
    m1[1] = 1.
    m2[1] = 1.
    m3[1] = m3[1] / m4[0]
    m4[1] = m4[1] - m3[1] * m5[0]
    m5[1] = m5[1] - m3[1] * m6[0]
    m6[1] = m6[1] - m3[1] * m7[0]
    # k = 2
    m1[2] = 1.
    m2[2] = m2[2] / m4[0]
    m3[2] = (m3[2] - m2[2] * m5[0]) / m4[1]
    m4[2] = m4[2] - m3[2] * m5[1] - m2[2] * m6[0]
    m5[2] = m5[2] - m3[2] * m6[1] - m2[2] * m7[0]
    m6[2] = m6[2] - m3[2] * m7[1]
    # k = 3 .. kmax+1 (general)
    for k in range(3, kmax + 2):
        m1[k] = m1[k] / m4[k - 3]
        m2[k] = (m2[k] - m1[k] * m5[k - 3]) / m4[k - 2]
        m3[k] = (m3[k] - m2[k] * m5[k - 2] - m1[k] * m6[k - 3]) / m4[k - 1]
        m4[k] = m4[k] - m3[k] * m5[k - 1] - m2[k] * m6[k - 2] - m1[k] * m7[k - 3]
        m5[k] = m5[k] - m3[k] * m6[k - 1] - m2[k] * m7[k - 2]
        m6[k] = m6[k] - m3[k] * m7[k - 1]
    m7[kmax + 1] = 1.
    k = kmax + 2
    m1[k] = m1[k] / m4[k - 3]
    m2[k] = (m2[k] - m1[k] * m5[k - 3]) / m4[k - 2]
    m3[k] = (m3[k] - m2[k] * m5[k - 2] - m1[k] * m6[k - 3]) / m4[k - 1]
    m4[k] = m4[k] - m3[k] * m5[k - 1] - m2[k] * m6[k - 2] - m1[k] * m7[k - 3]
    m5[k] = m5[k] - m3[k] * m6[k - 1] - m2[k] * m7[k - 2]
    m6[k] = 1.
    m7[k] = 1.
    k = kmax + 3
    m1[k] = m1[k] / m4[k - 3]
    m2[k] = (m2[k] - m1[k] * m5[k - 3]) / m4[k - 2]
    m3[k] = (m3[k] - m2[k] * m5[k - 2] - m1[k] * m6[k - 3]) / m4[k - 1]
    m4[k] = m4[k] - m3[k] * m5[k - 1] - m2[k] * m6[k - 2] - m1[k] * m7[k - 3]
    m5[k] = 1.
    m6[k] = 1.
    m7[k] = 1.
    return np.stack([m1, m2, m3, m4, m5, m6, m7])


class Pres4:
    _eig_ok = False

    def __init__(self, ini, grid, fields, dtype=np.float64):
        self.grid = grid
        self.fields = fields
        self.dtype = dtype
        self._built = False
        self.mesh = None  # set via Model.set_mesh for multi-chip slab FFTs

    def set_values(self):
        g = self.grid
        itot, jtot, kmax, ks = g.itot, g.jtot, g.ktot, g.kstart
        ihalf = itot // 2 + 1
        dxidxi = 1. / (g.dx * g.dx)
        dyidyi = 1. / (g.dy * g.dy)

        def bmat(n, total, didi):
            ang = np.pi * np.arange(total // 2 + 1) / total
            b = (2. * (1. / 576.) * np.cos(6. * ang)
                 - 2. * (54. / 576.) * np.cos(4. * ang)
                 + 2. * (783. / 576.) * np.cos(2. * ang)
                 - (1460. / 576.)) * didi
            full = np.empty(total)
            full[:total // 2 + 1] = b
            for j in range(total // 2 + 1, total):
                full[j] = full[total - j]
            return full[:n] if n != total else full

        bmati = bmat(ihalf, itot, dxidxi)
        bmatj = bmat(jtot, jtot, dyidyi)
        bm = bmatj[:, None] + bmati[None, :]  # (jtot, ihalf)

        dzi4, dzhi4 = g.dzi4, g.dzhi4
        mk = np.zeros((7, kmax))
        # Interior + wall rows (pres_4.cxx:216-258).
        k = 0
        kc = ks
        mk[0, 0] = 0.
        mk[1, 0] = (1. / 576.) * (-27. * dzhi4[kc]) * dzi4[kc]
        mk[2, 0] = (1. / 576.) * (-1. * dzhi4[kc + 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1]) * dzi4[kc]
        mk[3, 0] = (1. / 576.) * (27. * dzhi4[kc + 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] - 1. * dzhi4[kc + 2]) * dzi4[kc]
        mk[4, 0] = (1. / 576.) * (-27. * dzhi4[kc + 1] + 27. * dzhi4[kc] + 729. * dzhi4[kc + 1] + 27. * dzhi4[kc + 2]) * dzi4[kc]
        mk[5, 0] = (1. / 576.) * (1. * dzhi4[kc + 1] - 27. * dzhi4[kc + 1] - 27. * dzhi4[kc + 2]) * dzi4[kc]
        mk[6, 0] = (1. / 576.) * (1. * dzhi4[kc + 2]) * dzi4[kc]
        for k in range(1, kmax - 1):
            kc = ks + k
            mk[0, k] = (1. / 576.) * (1. * dzhi4[kc - 1]) * dzi4[kc]
            mk[1, k] = (1. / 576.) * (-27. * dzhi4[kc - 1] - 27. * dzhi4[kc]) * dzi4[kc]
            mk[2, k] = (1. / 576.) * (27. * dzhi4[kc - 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1]) * dzi4[kc]
            mk[3, k] = (1. / 576.) * (-1. * dzhi4[kc - 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] - 1. * dzhi4[kc + 2]) * dzi4[kc]
            mk[4, k] = (1. / 576.) * (27. * dzhi4[kc] + 729. * dzhi4[kc + 1] + 27. * dzhi4[kc + 2]) * dzi4[kc]
            mk[5, k] = (1. / 576.) * (-27. * dzhi4[kc + 1] - 27. * dzhi4[kc + 2]) * dzi4[kc]
            mk[6, k] = (1. / 576.) * (1. * dzhi4[kc + 2]) * dzi4[kc]
        k = kmax - 1
        kc = ks + k
        mk[0, k] = (1. / 576.) * (1. * dzhi4[kc - 1]) * dzi4[kc]
        mk[1, k] = (1. / 576.) * (-27. * dzhi4[kc - 1] - 27. * dzhi4[kc] + 1. * dzhi4[kc]) * dzi4[kc]
        mk[2, k] = (1. / 576.) * (27. * dzhi4[kc - 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1] - 27. * dzhi4[kc]) * dzi4[kc]
        mk[3, k] = (1. / 576.) * (-1. * dzhi4[kc - 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] + 27. * dzhi4[kc]) * dzi4[kc]
        mk[4, k] = (1. / 576.) * (27. * dzhi4[kc] + 729. * dzhi4[kc + 1] - 1. * dzhi4[kc]) * dzi4[kc]
        mk[5, k] = (1. / 576.) * (-27. * dzhi4[kc + 1]) * dzi4[kc]
        mk[6, k] = 0.

        # Build the full kmax+4 row system per mode (pres_4.cxx solve()).
        N = kmax + 4
        m = np.zeros((7, N, jtot, ihalf))
        # Bottom BC rows: zero-gradient (rows 0 and 1).
        m[3, 0] = 1.
        m[6, 0] = -1.
        m[3, 1] = 1.
        m[4, 1] = -1.
        # Interior rows 2..kmax+1.
        for k in range(kmax):
            for b in range(7):
                m[b, k + 2] = mk[b, k]
            m[3, k + 2] += bm
        # Top BC rows (mean mode pins p; others zero-gradient).
        mean = np.zeros((jtot, ihalf), dtype=bool)
        mean[0, 0] = True
        r = kmax + 2
        m[0, r] = 0.
        m[1, r] = np.where(mean, -1. / 3., 0.)
        m[2, r] = np.where(mean, 2., -1.)
        m[3, r] = 1.
        r = kmax + 3
        m[0, r] = np.where(mean, -2., -1.)
        m[1, r] = np.where(mean, 9., 0.)
        m[2, r] = 0.
        m[3, r] = 1.

        fac = _hdma_factorize(m)
        self._lu_np = fac.astype(self.dtype)
        self._mk_np = mk          # raw m1..m7 bands (oracle-tested)
        self._bmati_np = bmati
        self._bmatj_np = bmatj
        self.kmax = kmax
        self._build_eigen(mk, bm, m, mean)

        # DFT-as-matmul transform tables (see pres_2: XLA's TPU FFT is
        # layout-copy bound; the batched real DFT as MXU matmuls is ~1.5x
        # faster and keeps the solve real-valued).
        ihalf_ = itot // 2 + 1
        ang = 2. * np.pi * np.outer(np.arange(itot), np.arange(ihalf_)) / itot
        angy = 2. * np.pi * np.outer(np.arange(jtot), np.arange(jtot)) / jtot
        wk = np.ones(ihalf_)
        wk[1:ihalf_ - (itot % 2 == 0)] = 2.
        dt_ = self.dtype
        self._dft_np = {
            "dftC": np.cos(ang).astype(dt_),
            "dftS": np.sin(ang).astype(dt_),
            "dftCy": np.cos(angy).astype(dt_),
            "dftSy": np.sin(angy).astype(dt_),
            "dftCi": ((np.cos(ang) * wk[None, :]).T / itot).astype(dt_),
            "dftSi": ((np.sin(ang) * wk[None, :]).T / itot).astype(dt_),
        }
        from .dft_split import build_split_tables
        self._dft_np.update(build_split_tables(itot, dt_, "dsx"))
        self._dft_np.update(build_split_tables(jtot, dt_, "dsy"))
        self._built = True

    def _build_eigen(self, mk, bm, m_sys, mean):
        """Fast-diagonalization setup (cf. Pres2): the ghost BC rows are pure
        mirrors (x0=x3, x1=x2, x[k+2]=x[k+1], x[k+3]=x[k] for non-mean
        modes), so eliminating them gives a mode-INDEPENDENT kmax x kmax
        banded T_eff with the mode entering as ``+ bm * I``.  One dense
        nonsymmetric eig of T_eff (host, f64; cond(V) ~ few even on
        stretched channel grids) turns the per-step heptadiagonal solve
        into two k-axis matmuls.  The mean mode's pinned-pressure system is
        precomputed as a dense inverse slice."""
        kmax = self.kmax
        N = kmax + 4
        # dense non-mean system WITHOUT bm, then eliminate ghost rows
        A = np.zeros((N, N))
        for r in range(N):
            for b in range(7):
                c = r + b - 3
                if 0 <= c < N:
                    A[r, c] = m_sys[b, r, 0, 1]
        # remove this mode's bm from the interior diagonal
        bm_ref = bm[0, 1]
        for k in range(kmax):
            A[k + 2, k + 2] -= bm_ref
        T = A[2:kmax + 2, 2:kmax + 2].copy()
        T[:, 1] += A[2:kmax + 2, 0]
        T[:, 0] += A[2:kmax + 2, 1]
        T[:, kmax - 1] += A[2:kmax + 2, kmax + 2]
        T[:, kmax - 2] += A[2:kmax + 2, kmax + 3]
        lam, V = np.linalg.eig(T)
        self._eig_ok = (np.abs(lam.imag).max() < 1e-8 * max(1., np.abs(lam.real).max())
                        and np.linalg.cond(V.real) < 1e8)
        if not self._eig_ok:
            self._eig_np = {}
            return
        lam, V = lam.real, V.real
        Vinv = np.linalg.inv(V)
        # mean mode: full (kmax+4) system, rhs nonzero only on interior rows
        A0 = np.zeros((N, N))
        for r in range(N):
            for b in range(7):
                c = r + b - 3
                if 0 <= c < N:
                    A0[r, c] = m_sys[b, r, 0, 0]
        M0 = np.linalg.inv(A0)[2:kmax + 2, 2:kmax + 2]
        bmji = bm.copy()
        bmji[0, 0] = -1.   # dummy; the (0,0) column is overwritten
        dt_ = self.dtype
        self._eig_np = {"eigV": V.astype(dt_), "eigVi": Vinv.astype(dt_),
                        "eiglam": lam.astype(dt_), "eigM0": M0.astype(dt_),
                        "eigbm": bmji.astype(dt_)}

    @staticmethod
    def _use_eigen():
        return os.environ.get("MICROHH_EIGEN_POISSON", "1") == "1"

    def device_params(self):
        p = {"lu": jnp.asarray(self._lu_np)}
        for k, v in self._eig_np.items():
            p[k] = jnp.asarray(v)
        for k, v in self._dft_np.items():
            p[k] = jnp.asarray(v)
        return p

    def _use_dft(self):
        sw = os.environ.get("MICROHH_DFT_POISSON", "auto")
        if sw == "0":
            return False
        if sw == "1":
            return True
        return jax.default_backend() == "tpu"

    def _solve_dft(self, ctx, rhs, ep):
        """Real DFT via matmuls + eigen hepta solve on real/imag parts."""
        import functools
        from .pres_2 import _mxu_precision, _fwd_precision
        prec = _mxu_precision(rhs.dtype)
        e = functools.partial(jnp.einsum, precision=prec)
        # forward transforms at HIGH by default: their rounding reaches the
        # divergence residual unamplified (see pres_2._fwd_precision)
        ef = functools.partial(jnp.einsum, precision=_fwd_precision(rhs.dtype))
        C, S = ep["dftC"], ep["dftS"]
        Cy, Sy = ep["dftCy"], ep["dftSy"]
        Ci, Si = ep["dftCi"], ep["dftSi"]

        from .dft_split import rdft_last_fwd, cdft_axis1
        from .pres_2 import Pres2
        split = Pres2._use_dft_split()
        split_x = split in ("1", "x") and "dsx_twc" in ep
        split_y = split in ("1", "y") and "dsy_twc" in ep
        itot_, jtot_ = rhs.shape[2], rhs.shape[1]
        if split_x:
            Xr, Xi = rdft_last_fwd(rhs, ep, "dsx", itot_ // 128,
                                   itot_ // 2 + 1, ef)
        else:
            Xr = ef("kji,if->kjf", rhs, C)
            Xi = -ef("kji,if->kjf", rhs, S)
        if split_y:
            Yr, Yi = cdft_axis1(Xr, Xi, ep, "dsy", jtot_ // 128, -1, ef)
        else:
            Yr = ef("kjf,jg->kgf", Xr, Cy) + ef("kjf,jg->kgf", Xi, Sy)
            Yi = ef("kjf,jg->kgf", Xi, Cy) - ef("kjf,jg->kgf", Xr, Sy)

        denom = ep["eiglam"][:, None, None] + ep["eigbm"][None]
        gr = e("kl,ljf->kjf", ep["eigVi"], Yr) / denom
        gi = e("kl,ljf->kjf", ep["eigVi"], Yi) / denom
        xr = e("kl,ljf->kjf", ep["eigV"], gr)
        xi = e("kl,ljf->kjf", ep["eigV"], gi)
        x0r = e("kl,l->k", ep["eigM0"], Yr[:, 0, 0])
        x0i = e("kl,l->k", ep["eigM0"], Yi[:, 0, 0])
        xr = xr.at[:, 0, 0].set(x0r)
        xi = xi.at[:, 0, 0].set(x0i)

        n_j = rhs.shape[1]
        if split_y:
            Zr, Zi = cdft_axis1(xr, xi, ep, "dsy", jtot_ // 128, +1, e)
            Zr = Zr / n_j
            Zi = Zi / n_j
        else:
            Zr = (e("kgf,jg->kjf", xr, Cy) - e("kgf,jg->kjf", xi, Sy)) / n_j
            Zi = (e("kgf,jg->kjf", xi, Cy) + e("kgf,jg->kjf", xr, Sy)) / n_j
        return e("kjf,fi->kji", Zr, Ci) - e("kjf,fi->kji", Zi, Si)

    # ------------------------------------------------------------------
    def input(self, ctx, s, t, dti):
        """4th-order divergence RHS with antisymmetric wt ghosts
        (pres_4.cxx:260-318)."""
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        ut, vt, wt = t["u"], t["v"], t["w"]

        wt = wt.at[ks - 1].set(-wt[ks + 1])
        wt = wt.at[ke + 1].set(-wt[ke - 1])

        uu = ut + u * dti
        ww = wt + w * dti
        rhs = (fd.cg0 * im(uu) + fd.cg1 * uu + fd.cg2 * ip(uu) + fd.cg3 * ip(uu, 2))[ks:ke] * ctx.dxi
        if ctx.jtot > 1:
            vv = vt + v * dti
            rhs = rhs + (fd.cg0 * jm(vv) + fd.cg1 * vv + fd.cg2 * jp(vv) + fd.cg3 * jp(vv, 2))[ks:ke] * ctx.dyi
        rhs = rhs + (fd.cg0 * ww[ks - 1:ke - 1] + fd.cg1 * ww[ks:ke]
                     + fd.cg2 * ww[ks + 1:ke + 1] + fd.cg3 * ww[ks + 2:ke + 2]) * ctx.dzi4[ks:ke][:, None, None]
        return rhs

    def solve(self, ctx, rhs, pp=None):
        kmax = self.kmax
        lu = pp["lu"] if pp is not None else jnp.asarray(self._lu_np)
        m1, m2, m3, m4, m5, m6, m7 = (lu[i] for i in range(7))

        # Multi-chip: slab-transpose dataflow (reference transpose.cxx) —
        # z-slabs around the FFTs, mode-slabs around the heptadiagonal solve.
        from ..parallel.mesh import spectral_slab_plan
        plan = spectral_slab_plan(self.mesh, kmax, rhs.shape[1])
        if plan is not None:
            rhs = plan.zslab(rhs)
        p_hat = jnp.fft.rfft2(rhs, axes=(-2, -1))
        if plan is not None:
            p_hat = plan.modeslab(p_hat)

        if self._use_eigen() and self._eig_ok:
            ep = pp if (pp is not None and "eigV" in pp) else {
                k: jnp.asarray(v)
                for k, v in {**self._eig_np, **self._dft_np}.items()}
            if plan is None and self._use_dft() and "dftC" in ep:
                return self._solve_dft(ctx, rhs, ep).astype(rhs.dtype)
            from .pres_2 import _mxu_precision
            prec = _mxu_precision(p_hat.real.dtype)
            g = jnp.einsum("kl,ljf->kjf", ep["eigVi"], p_hat, precision=prec)
            g = g / (ep["eiglam"][:, None, None] + ep["eigbm"][None])
            x = jnp.einsum("kl,ljf->kjf", ep["eigV"], g, precision=prec)
            x0 = jnp.einsum("kl,l->k", ep["eigM0"], p_hat[:, 0, 0],
                            precision=prec)
            p_modes = x.at[:, 0, 0].set(x0)
            if plan is not None:
                p_modes = plan.zslab(p_modes, from_modes=True)
            p = jnp.fft.irfft2(p_modes, s=rhs.shape[-2:], axes=(-2, -1))
            if plan is not None:
                p = plan.pencil(p)
            return p.astype(rhs.dtype)

        # RHS rows: 0,1 and kmax+2, kmax+3 are zero.
        zero = jnp.zeros_like(p_hat[0])
        y = jnp.concatenate([zero[None], zero[None], p_hat, zero[None], zero[None]], axis=0)

        # Forward: Ly = p.  Rows 0..2 explicit (y0 = y1 = 0 after the BC
        # rhs; y2 = p_hat[0] - 0 - 0), then the depth-3 recurrence.
        def fwd(carry, xs):
            pm1, pm2, pm3 = carry
            rk, a1, a2, a3 = xs
            pk = rk - pm1 * a3 - pm2 * a2 - pm3 * a1
            return (pk, pm1, pm2), pk

        y0 = y[0] * m3[0]
        y1 = y[1] - y0 * m3[1]
        y2 = y[2] - y1 * m3[2] - y0 * m2[2]
        xs = (y[3:], m1[3:], m2[3:], m3[3:])
        _, ys = jax.lax.scan(fwd, (y2, y1, y0), xs)
        yfull = jnp.concatenate([y0[None], y1[None], y2[None], ys], axis=0)

        # Backward: Ux = y.
        def bwd(carry, xs):
            pp1, pp2, pp3 = carry
            yk, a4, a5, a6, a7 = xs
            pk = (yk - pp1 * a5 - pp2 * a6 - pp3 * a7) / a4
            return (pk, pp1, pp2), pk

        kN = kmax + 3
        xN = yfull[kN] / m4[kN]
        xN1 = (yfull[kN - 1] - xN * m5[kN - 1]) / m4[kN - 1]
        xN2 = (yfull[kN - 2] - xN1 * m5[kN - 2] - xN * m6[kN - 2]) / m4[kN - 2]
        xs = (yfull[:kN - 2][::-1], m4[:kN - 2][::-1], m5[:kN - 2][::-1],
              m6[:kN - 2][::-1], m7[:kN - 2][::-1])
        _, xr = jax.lax.scan(bwd, (xN2, xN1, xN), xs)
        xfull = jnp.concatenate([xr[::-1], xN2[None], xN1[None], xN[None]], axis=0)

        p_modes = xfull[2:kmax + 2]
        if plan is not None:
            p_modes = plan.zslab(p_modes, from_modes=True)
        p = jnp.fft.irfft2(p_modes, s=rhs.shape[-2:], axes=(-2, -1))
        if plan is not None:
            p = plan.pencil(p)
        return p.astype(rhs.dtype)

    def output(self, ctx, t, p_full):
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        p = p_full
        dp_x = (fd.cg0 * im(p, 2) + fd.cg1 * im(p) + fd.cg2 * p + fd.cg3 * ip(p))[ks:ke] * ctx.dxi
        t["u"] = t["u"].at[ks:ke].add(-dp_x)
        if ctx.jtot > 1:
            dp_y = (fd.cg0 * jm(p, 2) + fd.cg1 * jm(p) + fd.cg2 * p + fd.cg3 * jp(p))[ks:ke] * ctx.dyi
            t["v"] = t["v"].at[ks:ke].add(-dp_y)
        dp_z = ((fd.cg0 * p[ks - 1:ke - 2] + fd.cg1 * p[ks:ke - 1]
                 + fd.cg2 * p[ks + 1:ke] + fd.cg3 * p[ks + 2:ke + 1])
                * ctx.dzhi4[ks + 1:ke][:, None, None])
        t["w"] = t["w"].at[ks + 1:ke].add(-dp_z)
        return t

    def exec(self, ctx, s, t, aux, subdt, pp=None):
        if not self._built:
            raise RuntimeError("Pres4.set_values() not called")
        dti = 1. / subdt
        rhs = self.input(ctx, s, t, dti)
        p_int = self.solve(ctx, rhs, pp)
        ks, ke = ctx.ks, ctx.ke
        p_full = jnp.zeros_like(s["u"])
        p_full = p_full.at[ks:ke].set(p_int)
        # Zero-gradient ghosts bottom/top, two levels (pres_4.cxx:497-521).
        p_full = p_full.at[ks - 1].set(p_int[0])
        p_full = p_full.at[ks - 2].set(p_int[1])
        p_full = p_full.at[ke].set(p_int[-1])
        p_full = p_full.at[ke + 1].set(p_int[-2])
        t = self.output(ctx, t, p_full)
        aux = dict(aux)
        aux["p"] = p_full
        return t, aux

    def divergence_max(self, ctx, s):
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        div = (fd.cg0 * im(u) + fd.cg1 * u + fd.cg2 * ip(u) + fd.cg3 * ip(u, 2))[ks:ke] * ctx.dxi
        if ctx.jtot > 1:
            div = div + (fd.cg0 * jm(v) + fd.cg1 * v + fd.cg2 * jp(v) + fd.cg3 * jp(v, 2))[ks:ke] * ctx.dyi
        div = div + (fd.cg0 * w[ks - 1:ke - 1] + fd.cg1 * w[ks:ke]
                     + fd.cg2 * w[ks + 1:ke + 1] + fd.cg3 * w[ks + 2:ke + 2]) * ctx.dzi4[ks:ke][:, None, None]
        return jnp.max(jnp.abs(div))
