"""Fused radix-4 2-D DFT Pallas kernels for the spectral Poisson solve.

The dense DFT-by-matmul path (pres_2._solve_dft) contracts every axis with
an (N x N)-class table: O(N) MACs per point, and at f32 the inverse runs at
HIGHEST precision (6-pass bf16 emulation), so the transform matmuls dominate
the whole Poisson solve at 512^3.  Both Cooley-Tukey splits and the
symmetric/antisymmetric folds expressed at the XLA level measured SLOWER
in-step (MICROHH_DFT_SPLIT / _FOLDI / _FOLDJ ablations): whole-program
layout assignment turns their reshapes/fold-slices into HBM passes that
cost more than the MACs saved.  These kernels do the same radix-4
factorization where layout is under our control — per k-plane, entirely in
VMEM:

  forward   rhs(j,i) --[x: butterfly + 3 block dots]--> X(j, 3*Bx)
                     --[j: butterfly + 16 block dots]--> Y(p_j, 3*Bx)
  inverse   x(p_j, 3*Bx) --[j: 16 dots + butterfly]--> Z(j, 3*Bx)
                     --[x: 8 dots + Hermitian butterfly]--> p(j,i)

with n = 4*B per axis and ONE shared set of (B x B) tables per residue
class m: mode f = m + 4*g2 lives at block-position p = m*B + g2.  All lane
slices are B-aligned (B = n/4, a multiple of 128), the 4-point butterflies
are pure VPU slice adds, and the 4x-shorter contractions cut the MXU pass
count where it hurts most (the HIGHEST-precision inverse).

x-axis Hermitian storage: the rhs is real, so only residue blocks m=0,1,2
are kept (3*B = 384 lanes at 512^3 — exactly the lane-tile footprint the
dense path's zero-padded 257 modes already occupy).  Blocks m=0 and m=2 are
self-conjugate (f and itot-f share the block) and carried in full; block
m=3 is conj(block m=1) mirrored, and is reconstructed for free in the
inverse because after the inverse-j transform each row is again the
spectrum of a REAL signal, so A_3 = conj(A_1) in the final butterfly.

Mode order is PERMUTED (p = m*B + g2 on both axes); nothing reorders it —
the vertical eigen solve treats modes as batch entries, so pres_2 builds a
doubly-permuted ``eigbm_pl`` wavenumber table once at setup
(``pallas_mode_perm``).  The mean mode (0,0) maps to permuted (0,0), so the
dense mean-mode patch position is unchanged.

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


def pallas_dft_ok(itot, jtot):
    """Radix-4 with 128-aligned blocks: n = 4*B, B % 128 == 0."""
    return itot % 512 == 0 and jtot % 512 == 0


FWD_TABLES = ["plxf_c0", "plxf_s0", "plxf_c1", "plxf_s1", "plxf_c2",
              "plxf_s2", "plj_c0", "plj_s0", "plj_c1", "plj_s1",
              "plj_c2", "plj_s2", "plj_c3", "plj_s3"]
INV_TABLES = ["plj_c0", "plj_s0", "plj_c1", "plj_s1", "plj_c2", "plj_s2",
              "plj_c3", "plj_s3", "plxi_c0", "plxi_s0", "plxi_c1",
              "plxi_s1", "plxi_c2", "plxi_s2"]


def build_pallas_dft_tables(itot, jtot, dtype):
    """(B x B) cos/sin tables per residue class m; the combined twiddle is
    folded in (angle = 2 pi u (m + 4 g) / n — the dense table column of the
    true mode restricted to one block).  The inverse-x tables carry the
    full 1/(itot*jtot) normalization of the 2-D transform pair."""
    if not pallas_dft_ok(itot, jtot):
        return {}
    out = {}
    Bx = itot // 4
    i2 = np.arange(Bx)[:, None]
    g2 = np.arange(Bx)[None, :]
    for m in range(3):
        ang = 2. * np.pi * i2 * (m + 4 * g2) / itot
        out["plxf_c%d" % m] = np.cos(ang).astype(dtype)
        out["plxf_s%d" % m] = np.sin(ang).astype(dtype)
        scale = 1. / (itot * jtot)
        out["plxi_c%d" % m] = (np.cos(ang).T * scale).astype(dtype)
        out["plxi_s%d" % m] = (np.sin(ang).T * scale).astype(dtype)
    Bj = jtot // 4
    j2 = np.arange(Bj)[:, None]
    gj = np.arange(Bj)[None, :]
    for m in range(4):
        ang = 2. * np.pi * j2 * (m + 4 * gj) / jtot
        out["plj_c%d" % m] = np.cos(ang).astype(dtype)
        out["plj_s%d" % m] = np.sin(ang).astype(dtype)
    return out


def pallas_mode_perm(n, nblocks):
    """true mode index held at permuted position p = m*B + g2."""
    B = n // 4
    return np.array([m + 4 * g2 for m in range(nblocks) for g2 in range(B)])


def _fwd_body(Bj, Bx, prec, rhs_ref, cx0, sx0, cx1, sx1, cx2, sx2,
              cj0, sj0, cj1, sj1, cj2, sj2, cj3, sj3, yr_ref, yi_ref):
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

    # ---- x stage: real-input radix-4 butterfly over the 4 lane blocks
    x0, x1 = x[:, :Bx], x[:, Bx:2 * Bx]
    x2, x3 = x[:, 2 * Bx:3 * Bx], x[:, 3 * Bx:]
    ar, br = x0 + x2, x0 - x2
    cr, dr = x1 + x3, x1 - x3
    # S_m = sum_c x_c W4^{-cm}: S0/S2 real, S1 = br - i*dr (S3 = conj(S1),
    # dropped — Hermitian).  X_m = S_m (cos - i sin).
    s0, s2 = ar + cr, ar - cr
    Xr = jnp.concatenate(
        [dotx(s0, cx0), dotx(br, cx1) - dotx(dr, sx1), dotx(s2, cx2)],
        axis=1)
    Xi = jnp.concatenate(
        [-dotx(s0, sx0), -(dotx(dr, cx1) + dotx(br, sx1)), -dotx(s2, sx2)],
        axis=1)

    # ---- j stage: complex radix-4 butterfly over the 4 sublane blocks
    def blk(a, c):
        return a[c * Bj:(c + 1) * Bj, :]

    arj, brj = blk(Xr, 0) + blk(Xr, 2), blk(Xr, 0) - blk(Xr, 2)
    crj, drj = blk(Xr, 1) + blk(Xr, 3), blk(Xr, 1) - blk(Xr, 3)
    aij, bij = blk(Xi, 0) + blk(Xi, 2), blk(Xi, 0) - blk(Xi, 2)
    cij, dij = blk(Xi, 1) + blk(Xi, 3), blk(Xi, 1) - blk(Xi, 3)
    Ss = ((arj + crj, aij + cij), (brj + dij, bij - drj),
          (arj - crj, aij - cij), (brj - dij, bij + drj))
    cjs = ((cj0, sj0), (cj1, sj1), (cj2, sj2), (cj3, sj3))
    for m, ((sr, si), (cjm, sjm)) in enumerate(zip(Ss, cjs)):
        yr_ref[0, m * Bj:(m + 1) * Bj, :] = dotj(cjm, sr) + dotj(sjm, si)
        yi_ref[0, m * Bj:(m + 1) * Bj, :] = dotj(cjm, si) - dotj(sjm, sr)


def _inv_body(Bj, Bx, prec, xr_ref, xi_ref, cj0, sj0, cj1, sj1, cj2, sj2,
              cj3, sj3, ux0, vx0, ux1, vx1, ux2, vx2, p_ref):
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

    # ---- inverse j: per-block e^{+i} dots, then the transposed butterfly
    cjs = ((cj0, sj0), (cj1, sj1), (cj2, sj2), (cj3, sj3))
    Tr, Ti = [], []
    for m, (cjm, sjm) in enumerate(cjs):
        xm_r = xr[m * Bj:(m + 1) * Bj, :]
        xm_i = xi[m * Bj:(m + 1) * Bj, :]
        Tr.append(dotg(cjm, xm_r) - dotg(sjm, xm_i))
        Ti.append(dotg(cjm, xm_i) + dotg(sjm, xm_r))
    ar, br = Tr[0] + Tr[2], Tr[0] - Tr[2]
    cr, dr = Tr[1] + Tr[3], Tr[1] - Tr[3]
    ai, bi = Ti[0] + Ti[2], Ti[0] - Ti[2]
    ci, di = Ti[1] + Ti[3], Ti[1] - Ti[3]
    Zr = jnp.concatenate([ar + cr, br - di, ar - cr, br + di], axis=0)
    Zi = jnp.concatenate([ai + ci, bi + dr, ai - ci, bi - dr], axis=0)

    # ---- inverse x: A_m = Z_m (cos + i sin); block m=3 never stored —
    # each row of Z is the spectrum of a REAL signal, so A_3 = conj(A_1)
    # and the W4^{+c2 m} butterfly needs only A0r, A1r, A1i, A2r.
    z0r, z1r, z2r = Zr[:, :Bx], Zr[:, Bx:2 * Bx], Zr[:, 2 * Bx:]
    z0i, z1i, z2i = Zi[:, :Bx], Zi[:, Bx:2 * Bx], Zi[:, 2 * Bx:]
    A0r = dotx(z0r, ux0) - dotx(z0i, vx0)
    A1r = dotx(z1r, ux1) - dotx(z1i, vx1)
    A1i = dotx(z1i, ux1) + dotx(z1r, vx1)
    A2r = dotx(z2r, ux2) - dotx(z2i, vx2)
    e, o = A0r + A2r, A0r - A2r
    p_ref[0, :, :Bx] = e + 2. * A1r
    p_ref[0, :, Bx:2 * Bx] = o - 2. * A1i
    p_ref[0, :, 2 * Bx:3 * Bx] = e - 2. * A1r
    p_ref[0, :, 3 * Bx:] = o + 2. * A1i


def _table_specs(tables):
    return [pl.BlockSpec(t.shape, lambda k, _nd=t.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM) for t in tables]


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def dft2_fwd(rhs, pp, prec, interpret=False):
    """Forward 2-D real DFT of (kt, jtot, itot) -> permuted half spectra
    (Yr, Yi) of shape (kt, jtot, 3*itot//4)."""
    kt, jtot, itot = rhs.shape
    Bx, Bj = itot // 4, jtot // 4
    tabs = [pp[n] for n in FWD_TABLES]
    body = functools.partial(_fwd_body, Bj, Bx, prec)
    spec_in = pl.BlockSpec((1, jtot, itot), lambda k: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, jtot, 3 * Bx), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((kt, jtot, 3 * Bx), rhs.dtype)
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
    Bx, Bj = itot // 4, jtot // 4
    tabs = [pp[n] for n in INV_TABLES]
    body = functools.partial(_inv_body, Bj, Bx, prec)
    spec_in = pl.BlockSpec((1, jtot, 3 * Bx), lambda k: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, jtot, itot), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((kt, jtot, itot), xr.dtype)
    return pl.pallas_call(
        body, grid=(kt,), in_specs=[spec_in, spec_in] + _table_specs(tabs),
        out_specs=spec_out, out_shape=shape, interpret=interpret,
        compiler_params=None if interpret else _CPARAMS,
    )(xr, xi, *tabs)
