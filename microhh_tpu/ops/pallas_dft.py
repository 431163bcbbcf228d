"""Fused radix-4 / radix-3 2-D DFT Pallas kernels for the spectral Poisson
solve.

The dense DFT-by-matmul path (pres_2._solve_dft) contracts every axis with
an (N x N)-class table: O(N) MACs per point, and at f32 the inverse runs at
HIGHEST precision (6-pass bf16 emulation), so the transform matmuls dominate
the whole Poisson solve at 512^3.  Both Cooley-Tukey splits and the
symmetric/antisymmetric folds expressed at the XLA level measured SLOWER
in-step (MICROHH_DFT_SPLIT / _FOLDI / _FOLDJ ablations): whole-program
layout assignment turns their reshapes/fold-slices into HBM passes that
cost more than the MACs saved.  These kernels do the same radix
factorization where layout is under our control — per k-plane, entirely in
VMEM:

  forward   rhs(j,i) --[x: butterfly + kept-block dots]--> X(j, nxb*Bx)
                     --[j: butterfly + r_j block dots]--> Y(p_j, nxb*Bx)
  inverse   x(p_j, nxb*Bx) --[j: block dots + butterfly]--> Z(j, nxb*Bx)
                     --[x: dots + Hermitian butterfly]--> p(j,i)

with n = r*B per axis (r = 4 when n % 512 == 0, else r = 3 when
n % 384 == 0; B is always a multiple of 128) and ONE shared set of
(B x B) tables per residue class m: mode f = m + r*g lives at
block-position p = m*B + g.  All lane slices are B-aligned, the r-point
butterflies are pure VPU slice adds, and the r-times-shorter contractions
cut the MXU pass count where it hurts most (the HIGHEST-precision
inverse).  The radix-3 instance covers the 384/768-class grids that
previously fell back to the dense einsum path.

x-axis Hermitian storage: the rhs is real, so only residue blocks
m = 0..r/2 are kept (nxb = r//2 + 1 blocks: 3*B lanes for radix 4 — the
lane-tile footprint the dense path's zero-padded modes already occupy —
and 2*B lanes for radix 3).  For radix 4, blocks m=0 and m=2 are
self-conjugate and carried in full; the dropped blocks (m=3, or m=2 for
radix 3) are conj-mirrors of block m=1 and are reconstructed for free in
the inverse: after the inverse-j transform each row is again the spectrum
of a REAL signal, so A_{r-1} = conj(A_1) in the final butterfly.

Mode order is PERMUTED (p = m*B + g on both axes); nothing reorders it —
the vertical eigen/Thomas solve treats modes as batch entries, so pres_2
builds doubly-permuted wavenumber tables once at setup
(``pallas_mode_perm_x`` / ``_j``).  The mean mode (0,0) maps to permuted
(0,0), so the dense mean-mode patch position is unchanged.

Reference parity: the composition equals the reference's FFTW r2c/c2c
transform pair around the tridiagonal solve (src/pres_2.cxx:198-263); f64
agreement with the dense path is tested in tests/test_pallas_dft.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S3H = np.sqrt(3.) / 2.   # sin(2*pi/3)


def pallas_radix(n):
    """Radix with 128-aligned blocks: 4 when n = 4*B (B % 128 == 0),
    else 3 when n = 3*B (B % 128 == 0)."""
    if n % 512 == 0:
        return 4
    if n % 384 == 0:
        return 3
    return None


def pallas_dft_ok(itot, jtot):
    return pallas_radix(itot) is not None and pallas_radix(jtot) is not None


def _mode_perm(n, nblocks):
    r = pallas_radix(n)
    B = n // r
    return np.array([m + r * g for m in range(nblocks) for g in range(B)])


def pallas_mode_perm_x(n):
    """True mode index at permuted lane position (kept Hermitian blocks)."""
    return _mode_perm(n, pallas_radix(n) // 2 + 1)


def pallas_mode_perm_j(n):
    """True mode index at permuted row position (all blocks)."""
    return _mode_perm(n, pallas_radix(n))


def fwd_table_names(itot, jtot):
    rx, ry = pallas_radix(itot), pallas_radix(jtot)
    return (["plxf_c%d" % m for m in range(rx // 2 + 1)]
            + ["plxf_s%d" % m for m in range(rx // 2 + 1)]
            + ["plj_c%d" % m for m in range(ry)]
            + ["plj_s%d" % m for m in range(ry)])


def inv_table_names(itot, jtot):
    rx, ry = pallas_radix(itot), pallas_radix(jtot)
    return (["plj_c%d" % m for m in range(ry)]
            + ["plj_s%d" % m for m in range(ry)]
            + ["plxi_c%d" % m for m in range(rx // 2 + 1)]
            + ["plxi_s%d" % m for m in range(rx // 2 + 1)])


def build_pallas_dft_tables(itot, jtot, dtype):
    """(B x B) cos/sin tables per residue class m; the combined twiddle is
    folded in (angle = 2 pi u (m + r g) / n — the dense table column of the
    true mode restricted to one block).  The inverse-x tables carry the
    full 1/(itot*jtot) normalization of the 2-D transform pair."""
    if not pallas_dft_ok(itot, jtot):
        return {}
    out = {}
    rx, ry = pallas_radix(itot), pallas_radix(jtot)
    Bx = itot // rx
    i2 = np.arange(Bx)[:, None]
    g2 = np.arange(Bx)[None, :]
    scale = 1. / (itot * jtot)
    for m in range(rx // 2 + 1):
        ang = 2. * np.pi * i2 * (m + rx * g2) / itot
        out["plxf_c%d" % m] = np.cos(ang).astype(dtype)
        out["plxf_s%d" % m] = np.sin(ang).astype(dtype)
        out["plxi_c%d" % m] = (np.cos(ang).T * scale).astype(dtype)
        out["plxi_s%d" % m] = (np.sin(ang).T * scale).astype(dtype)
    Bj = jtot // ry
    j2 = np.arange(Bj)[:, None]
    gj = np.arange(Bj)[None, :]
    for m in range(ry):
        ang = 2. * np.pi * j2 * (m + ry * gj) / jtot
        out["plj_c%d" % m] = np.cos(ang).astype(dtype)
        out["plj_s%d" % m] = np.sin(ang).astype(dtype)
    return out


# ==========================================================================
#  radix butterflies (VPU slice adds; real/imag separated)
# ==========================================================================

def _fwd_real_blocks(r, xs):
    """S_m = sum_c x_c W_r^{cm} for a REAL input split into r lane blocks;
    returns kept blocks m = 0..r//2 as (Sr, Si-or-None)."""
    if r == 4:
        x0, x1, x2, x3 = xs
        ar, br = x0 + x2, x0 - x2
        cr, dr = x1 + x3, x1 - x3
        # S0/S2 real; S1 = br - i*dr (S3 = conj(S1), dropped)
        return [(ar + cr, None), (br, -dr), (ar - cr, None)]
    x0, x1, x2 = xs
    t1 = x1 + x2
    # S0 real; S1 = (x0 - t1/2) - i*s3*(x1 - x2) (S2 = conj(S1), dropped)
    return [(x0 + t1, None), (x0 - 0.5 * t1, -_S3H * (x1 - x2))]


def _fwd_cplx_blocks(r, rs, is_):
    """S_m = sum_c z_c W_r^{cm} for complex row blocks; returns all r."""
    if r == 4:
        r0, r1, r2, r3 = rs
        i0, i1, i2, i3 = is_
        ar, br = r0 + r2, r0 - r2
        cr, dr = r1 + r3, r1 - r3
        ai, bi = i0 + i2, i0 - i2
        ci, di = i1 + i3, i1 - i3
        return [(ar + cr, ai + ci), (br + di, bi - dr),
                (ar - cr, ai - ci), (br - di, bi + dr)]
    r0, r1, r2 = rs
    i0, i1, i2 = is_
    pr, pi = r1 + r2, i1 + i2
    t2r, t2i = r0 - 0.5 * pr, i0 - 0.5 * pi
    ur, ui = _S3H * (r1 - r2), _S3H * (i1 - i2)
    return [(r0 + pr, i0 + pi), (t2r + ui, t2i - ur), (t2r - ui, t2i + ur)]


def _inv_cplx_blocks(r, Ts):
    """z_c = sum_m T_m W_r^{-cm} (inverse butterfly); Ts = [(Tr, Ti)]."""
    if r == 4:
        (t0r, t0i), (t1r, t1i), (t2r, t2i), (t3r, t3i) = Ts
        ar, br = t0r + t2r, t0r - t2r
        cr, dr = t1r + t3r, t1r - t3r
        ai, bi = t0i + t2i, t0i - t2i
        ci, di = t1i + t3i, t1i - t3i
        return [(ar + cr, ai + ci), (br - di, bi + dr),
                (ar - cr, ai - ci), (br + di, bi - dr)]
    (t0r, t0i), (t1r, t1i), (t2r, t2i) = Ts
    pr, pi = t1r + t2r, t1i + t2i
    ur, ui = _S3H * (t1r - t2r), _S3H * (t1i - t2i)
    er, ei = t0r - 0.5 * pr, t0i - 0.5 * pi
    return [(t0r + pr, t0i + pi), (er - ui, ei + ur), (er + ui, ei - ur)]


def _inv_final_x(r, A):
    """x_c = sum_m A_m W_r^{-cm} with Hermitian reconstruction of the
    dropped blocks (A_{r-1} = conj(A_1), A_0 [and A_2 for r=4] real).
    A = [A0r, A1r, A1i] (+ [A2r] for r=4)."""
    if r == 4:
        A0r, A1r, A1i, A2r = A
        e, o = A0r + A2r, A0r - A2r
        return [e + 2. * A1r, o - 2. * A1i, e - 2. * A1r, o + 2. * A1i]
    A0r, A1r, A1i = A
    b = A0r - A1r
    s3 = np.sqrt(3.)
    return [A0r + 2. * A1r, b - s3 * A1i, b + s3 * A1i]


# ==========================================================================
#  kernel bodies
# ==========================================================================

def _fwd_body(rx, ry, Bj, Bx, prec, rhs_ref, *refs):
    nxb = rx // 2 + 1
    cxs = refs[0:nxb]
    sxs = refs[nxb:2 * nxb]
    cjs = refs[2 * nxb:2 * nxb + ry]
    sjs = refs[2 * nxb + ry:2 * nxb + 2 * ry]
    yr_ref, yi_ref = refs[-2], refs[-1]
    x = rhs_ref[0]
    dt_ = x.dtype

    def dotx(a, t):
        return jax.lax.dot_general(a, t[...], (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dt_)

    def dotj(t, s):
        return jax.lax.dot_general(t[...], s, (((0,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dt_)

    # ---- x stage: real-input butterfly over the rx lane blocks, then
    # per-kept-block table dots; X_m = S_m (cos - i sin).
    xs = [x[:, c * Bx:(c + 1) * Bx] for c in range(rx)]
    Ss = _fwd_real_blocks(rx, xs)
    Xr_parts, Xi_parts = [], []
    for (sr, si), cm, sm in zip(Ss, cxs, sxs):
        if si is None:
            Xr_parts.append(dotx(sr, cm))
            Xi_parts.append(-dotx(sr, sm))
        else:
            Xr_parts.append(dotx(sr, cm) + dotx(si, sm))
            Xi_parts.append(dotx(si, cm) - dotx(sr, sm))
    Xr = jnp.concatenate(Xr_parts, axis=1)
    Xi = jnp.concatenate(Xi_parts, axis=1)

    # ---- j stage: complex butterfly over the ry sublane blocks
    rs = [Xr[c * Bj:(c + 1) * Bj, :] for c in range(ry)]
    is_ = [Xi[c * Bj:(c + 1) * Bj, :] for c in range(ry)]
    Sj = _fwd_cplx_blocks(ry, rs, is_)
    for m, ((sr, si), cjm, sjm) in enumerate(zip(Sj, cjs, sjs)):
        yr_ref[0, m * Bj:(m + 1) * Bj, :] = dotj(cjm, sr) + dotj(sjm, si)
        yi_ref[0, m * Bj:(m + 1) * Bj, :] = dotj(cjm, si) - dotj(sjm, sr)


def _inv_body(rx, ry, Bj, Bx, prec, xr_ref, xi_ref, *refs):
    nxb = rx // 2 + 1
    cjs = refs[0:ry]
    sjs = refs[ry:2 * ry]
    uxs = refs[2 * ry:2 * ry + nxb]
    vxs = refs[2 * ry + nxb:2 * ry + 2 * nxb]
    p_ref = refs[-1]
    xr = xr_ref[0]
    xi = xi_ref[0]
    dt_ = xr.dtype

    def dotg(t, a):
        # contract the permuted g axis back to j2 rows
        return jax.lax.dot_general(t[...], a, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dt_)

    def dotx(a, t):
        return jax.lax.dot_general(a, t[...], (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dt_)

    # ---- inverse j: per-block e^{+i} dots, then the inverse butterfly
    Ts = []
    for m in range(ry):
        xm_r = xr[m * Bj:(m + 1) * Bj, :]
        xm_i = xi[m * Bj:(m + 1) * Bj, :]
        Ts.append((dotg(cjs[m], xm_r) - dotg(sjs[m], xm_i),
                   dotg(cjs[m], xm_i) + dotg(sjs[m], xm_r)))
    zs = _inv_cplx_blocks(ry, Ts)
    Zr = jnp.concatenate([z[0] for z in zs], axis=0)
    Zi = jnp.concatenate([z[1] for z in zs], axis=0)

    # ---- inverse x: A_m = Z_m (cos + i sin); dropped blocks never
    # stored — each row of Z is the spectrum of a REAL signal, so the
    # final butterfly needs only A0r, A1r, A1i (+ A2r for radix 4).
    zbr = [Zr[:, m * Bx:(m + 1) * Bx] for m in range(nxb)]
    zbi = [Zi[:, m * Bx:(m + 1) * Bx] for m in range(nxb)]
    A = [dotx(zbr[0], uxs[0]) - dotx(zbi[0], vxs[0]),
         dotx(zbr[1], uxs[1]) - dotx(zbi[1], vxs[1]),
         dotx(zbi[1], uxs[1]) + dotx(zbr[1], vxs[1])]
    if rx == 4:
        A.append(dotx(zbr[2], uxs[2]) - dotx(zbi[2], vxs[2]))
    xc = _inv_final_x(rx, A)
    for c in range(rx):
        p_ref[0, :, c * Bx:(c + 1) * Bx] = xc[c]


def _table_specs(tables):
    return [pl.BlockSpec(t.shape, lambda k, _nd=t.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM) for t in tables]


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def dft2_fwd(rhs, pp, prec, interpret=False):
    """Forward 2-D real DFT of (kt, jtot, itot) -> permuted half spectra
    (Yr, Yi) of shape (kt, jtot, (rx//2+1)*itot//rx)."""
    kt, jtot, itot = rhs.shape
    rx, ry = pallas_radix(itot), pallas_radix(jtot)
    Bx, Bj = itot // rx, jtot // ry
    nxb = rx // 2 + 1
    tabs = [pp[n] for n in fwd_table_names(itot, jtot)]
    body = functools.partial(_fwd_body, rx, ry, Bj, Bx, prec)
    spec_in = pl.BlockSpec((1, jtot, itot), lambda k: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, jtot, nxb * Bx), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((kt, jtot, nxb * Bx), rhs.dtype)
    return pl.pallas_call(
        body, grid=(kt,), in_specs=[spec_in] + _table_specs(tabs),
        out_specs=[spec_out, spec_out], out_shape=[shape, shape],
        interpret=interpret,
        compiler_params=None if interpret else _CPARAMS,
    )(rhs, *tabs)


def dft2_inv(xr, xi, pp, prec, itot, interpret=False):
    """Inverse of dft2_fwd: permuted half spectra -> real (kt, jtot, itot),
    including the 1/(itot*jtot) normalization (in the plxi tables)."""
    kt, jtot, _ = xr.shape
    rx, ry = pallas_radix(itot), pallas_radix(jtot)
    Bx, Bj = itot // rx, jtot // ry
    nxb = rx // 2 + 1
    tabs = [pp[n] for n in inv_table_names(itot, jtot)]
    body = functools.partial(_inv_body, rx, ry, Bj, Bx, prec)
    spec_in = pl.BlockSpec((1, jtot, nxb * Bx), lambda k: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, jtot, itot), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((kt, jtot, itot), xr.dtype)
    return pl.pallas_call(
        body, grid=(kt,), in_specs=[spec_in, spec_in] + _table_specs(tabs),
        out_specs=spec_out, out_shape=shape, interpret=interpret,
        compiler_params=None if interpret else _CPARAMS,
    )(xr, xi, *tabs)
