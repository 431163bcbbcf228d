"""Two-stage (Cooley-Tukey) DFT-by-matmul for the spectral Poisson solve.

The direct DFT-as-matmul (pres_2._solve_dft) multiplies every axis by a
dense (N x N)-class table: O(N) MACs per point.  Factoring N = 128 * N2
with the input split n = n1*N2 + n2 (n1 slow) gives the classic DIT form

  stage 1:  A[n2, r] = sum_{n1} x[n1, n2] * W_128^{n1 r}
            (ONE shared 128-point DFT table — a single MXU matmul with
            contraction length 128, the lane-aligned sweet spot)
  twiddle:  B[n2, r] = W_N^{n2 r} * A[n2, r]          (elementwise, VPU)
  stage 2:  X[q*128 + r] = sum_{n2} W_N2^{q n2} B[n2, r]
            (an unrolled length-N2 butterfly, pure VPU)

which is O(128 + N2) MACs per point — ~2x fewer MXU flops for the real
x-transform and ~4x for the complex y-transforms at N=512.  The output
index f = q*128 + r means concatenating the q-blocks lands in NATURAL
frequency order: no transposes anywhere.  The real forward transform
just slices each q-block to the half spectrum (f <= N/2).

Used by pres_2/pres_4 _solve_dft when the axis length is a multiple of
128 (MICROHH_DFT_SPLIT=0 opts out).  f64 agreement with the direct path
is tested in tests/test_dft_split.py.
"""

import numpy as np
import jax.numpy as jnp


def splittable(N):
    return N % 128 == 0 and N // 128 >= 2


def build_split_tables(N, dtype, prefix):
    """Twiddle tables (N2, 128) for one axis length N = 128*N2, plus the
    shared 128-point DFT tables under the 'ds128' prefix."""
    if not splittable(N):
        return {}
    N2 = N // 128
    b = np.arange(N2)[:, None]
    r = np.arange(128)[None, :]
    ang = 2. * np.pi * b * r / N
    a = np.arange(128)[:, None]
    ang1 = 2. * np.pi * a * r / 128.
    return {"%s_twc" % prefix: np.cos(ang).astype(dtype),
            "%s_tws" % prefix: np.sin(ang).astype(dtype),
            "ds128_c": np.cos(ang1).astype(dtype),
            "ds128_s": np.sin(ang1).astype(dtype)}


def _stage2_coeffs(N2):
    return [[(float(np.cos(2. * np.pi * q * b / N2)),
              float(np.sin(2. * np.pi * q * b / N2))) for b in range(N2)]
            for q in range(N2)]


def rdft_last_fwd(x, tables, prefix, n2, ihalf, e):
    """Real forward DFT along the LAST axis -> half spectrum (Xr, Xi),
    ihalf entries (convention X = sum x e^{-i theta}, matching dftC/dftS
    in pres_2._solve_dft)."""
    N2 = n2
    C1, S1 = tables["ds128_c"], tables["ds128_s"]
    TwC = tables["%s_twc" % prefix]
    TwS = tables["%s_tws" % prefix]
    x2 = x.reshape(x.shape[:-1] + (128, N2))   # n = n1*N2 + n2
    Ar = e("...ab,ar->...br", x2, C1)          # (..., n2, r)
    Ai = -e("...ab,ar->...br", x2, S1)
    # twiddle W_N^{n2 r} = cos - i sin
    Br = TwC * Ar + TwS * Ai
    Bi = TwC * Ai - TwS * Ar
    co = _stage2_coeffs(N2)
    blocks_r, blocks_i = [], []
    for q in range((ihalf + 127) // 128):
        r_cnt = min(128, ihalf - 128 * q)
        xr_o = 0.
        xi_o = 0.
        for b in range(N2):
            c, s = co[q][b]
            br = Br[..., b, :r_cnt]
            bi = Bi[..., b, :r_cnt]
            # W_N2^{-qb} = c - i s
            xr_o = xr_o + c * br + s * bi
            xi_o = xi_o + c * bi - s * br
        blocks_r.append(xr_o)
        blocks_i.append(xi_o)
    return (jnp.concatenate(blocks_r, axis=-1),
            jnp.concatenate(blocks_i, axis=-1))


def cdft_axis1(xr, xi, tables, prefix, n2, sign, e):
    """Complex DFT along axis 1 of (k, N, f) arrays, full N outputs in
    natural order.  sign=-1: forward kernel e^{-i}; sign=+1: inverse
    kernel e^{+i} WITHOUT the 1/N scale (the caller divides, mirroring
    the direct path)."""
    N2 = n2
    C1, S1 = tables["ds128_c"], tables["ds128_s"]
    TwC = tables["%s_twc" % prefix][:, :, None]
    TwS = tables["%s_tws" % prefix][:, :, None] * (-sign)
    sh = (xr.shape[0], 128, N2) + xr.shape[2:]
    xr2 = xr.reshape(sh)
    xi2 = xi.reshape(sh)
    # stage 1 with kernel cos + sign*i*sin  (S1s = sign * -?; write out)
    if sign < 0:
        Ar = e("kabf,ar->kbrf", xr2, C1) + e("kabf,ar->kbrf", xi2, S1)
        Ai = e("kabf,ar->kbrf", xi2, C1) - e("kabf,ar->kbrf", xr2, S1)
    else:
        Ar = e("kabf,ar->kbrf", xr2, C1) - e("kabf,ar->kbrf", xi2, S1)
        Ai = e("kabf,ar->kbrf", xi2, C1) + e("kabf,ar->kbrf", xr2, S1)
    # twiddle W_N^{sign * n2 r} = TwC - i*TwS  (TwS already sign-folded)
    Br = TwC * Ar + TwS * Ai
    Bi = TwC * Ai - TwS * Ar
    co = _stage2_coeffs(N2)
    blocks_r, blocks_i = [], []
    for q in range(N2):
        xr_o = 0.
        xi_o = 0.
        for b in range(N2):
            c, s = co[q][b]
            s = -sign * s          # W_N2^{sign*qb} = c - i*s_eff
            br, bi = Br[:, b], Bi[:, b]
            xr_o = xr_o + c * br + s * bi
            xi_o = xi_o + c * bi - s * br
        blocks_r.append(xr_o)
        blocks_i.append(xi_o)
    return (jnp.concatenate(blocks_r, axis=1),
            jnp.concatenate(blocks_i, axis=1))


# ==========================================================================
#  sublane-clean split for the j-axis (axis -2) transforms
#
#  The lane-splitting variants above measured SLOWER: reshaping the LAST
#  axis to (..., 128, N2) forces 4-lane minor dims.  For the j-axis of
#  (k, j, f) arrays the factorization j = j1*128 + j2 (j1 slow) is a
#  row-major NO-OP reshape (contiguous 128-row slabs), so the split costs
#  zero data movement:
#
#    stage A: N1-point butterfly over the slab index j1 (VPU adds; N1 =
#             jtot/128, i.e. 4 at the 512^3 north star);
#    twiddle: W_N^{sign j2 g1}, elementwise;
#    stage B: ONE 128-contraction MXU matmul per real component pair —
#             4x fewer MXU flops than the dense (N x N) tables.
#
#  The output lands in PERMUTED mode order p = g1*128 + g2 <-> true mode
#  g = g1 + N1*g2.  Nothing reorders it: the vertical eigen-solve treats
#  modes as batch entries, so pres_2 permutes its per-mode eigbm table
#  once at setup (j4_mode_perm) and the inverse transform consumes the
#  permuted order directly.  The mean mode (0,0) maps to permuted row 0,
#  so the dense mean-mode patch position is unchanged.
# ==========================================================================

def j4_splittable(N):
    return N % 128 == 0 and N >= 256


def build_j4_tables(N, dtype, prefix="dy4"):
    """Butterfly (N1, N1) tables plus the COMBINED twiddle+128-DFT tables
    (N1, 128, 128): the twiddle W_N^{c b} times the 128-point kernel
    W_128^{b g} collapses to cos/sin(2 pi b (c + N1 g) / N) — the N-point
    DFT column of the true mode g_true = c + N1*g restricted to b — so no
    separate twiddle pass ever materializes.  Angles in f64 then cast."""
    if not j4_splittable(N):
        return {}
    N1 = N // 128
    c = np.arange(N1)
    a = np.arange(N1)
    ang1 = 2. * np.pi * np.outer(c, a) / N1
    b = np.arange(128)
    g = np.arange(128)
    gt = c[:, None, None] + N1 * g[None, None, :]        # (N1, 1, 128)
    angm = 2. * np.pi * b[None, :, None] * gt / N        # (N1, 128, 128)
    return {"%s_bc" % prefix: np.cos(ang1).astype(dtype),
            "%s_bs" % prefix: np.sin(ang1).astype(dtype),
            "%s_mc" % prefix: np.cos(angm).astype(dtype),
            "%s_ms" % prefix: np.sin(angm).astype(dtype)}


def j4_mode_perm(N):
    """perm[p] = true mode index held at permuted position p."""
    N1 = N // 128
    return np.array([c + N1 * g2 for c in range(N1) for g2 in range(128)])


def _butterfly(x2r, x2i, C1, S1, sign, N1):
    """N1-point DFT over axis 1 with kernel cos + sign*i*sin.  For N1 in
    {2, 4} the kernel entries are 0/+-1, so the transform is explicit
    slice adds (pure VPU work XLA fuses with the adjacent twiddle) — an
    einsum here would burn a full 128-contraction MXU pass at <4/128
    occupancy, which is what made the first measurement SLOWER."""
    if N1 == 2:
        Sr = jnp.stack([x2r[:, 0] + x2r[:, 1], x2r[:, 0] - x2r[:, 1]], 1)
        Si = jnp.stack([x2i[:, 0] + x2i[:, 1], x2i[:, 0] - x2i[:, 1]], 1)
        return Sr, Si
    if N1 == 4:
        ar, br = x2r[:, 0] + x2r[:, 2], x2r[:, 0] - x2r[:, 2]
        ai, bi = x2i[:, 0] + x2i[:, 2], x2i[:, 0] - x2i[:, 2]
        cr, dr = x2r[:, 1] + x2r[:, 3], x2r[:, 1] - x2r[:, 3]
        ci, di = x2i[:, 1] + x2i[:, 3], x2i[:, 1] - x2i[:, 3]
        # (b - i*sign_eff*d) pattern: sign=-1 fwd -> S1 = b - i d rotated
        if sign < 0:
            Sr = jnp.stack([ar + cr, br + di, ar - cr, br - di], 1)
            Si = jnp.stack([ai + ci, bi - dr, ai - ci, bi + dr], 1)
        else:
            Sr = jnp.stack([ar + cr, br - di, ar - cr, br + di], 1)
            Si = jnp.stack([ai + ci, bi + dr, ai - ci, bi - dr], 1)
        return Sr, Si
    e_ = jnp.einsum
    Sr = e_("kabf,ca->kcbf", x2r, C1) + e_("kabf,ca->kcbf", x2i, S1)
    Si = e_("kabf,ca->kcbf", x2i, C1) - e_("kabf,ca->kcbf", x2r, S1)
    return Sr, Si


def _butterfly_t(Tr, Ti, C1, S1, sign, N1):
    """Transposed butterfly (contract the g1 axis back to j1 slabs)."""
    if N1 == 2:
        xr = jnp.stack([Tr[:, 0] + Tr[:, 1], Tr[:, 0] - Tr[:, 1]], 1)
        xi = jnp.stack([Ti[:, 0] + Ti[:, 1], Ti[:, 0] - Ti[:, 1]], 1)
        return xr, xi
    if N1 == 4:
        # x[a] = sum_c T[c] * (cos + sign*i*sin)(2 pi a c / 4); the table
        # is symmetric, so this is the same combination pattern.
        ar, br = Tr[:, 0] + Tr[:, 2], Tr[:, 0] - Tr[:, 2]
        ai, bi = Ti[:, 0] + Ti[:, 2], Ti[:, 0] - Ti[:, 2]
        cr, dr = Tr[:, 1] + Tr[:, 3], Tr[:, 1] - Tr[:, 3]
        ci, di = Ti[:, 1] + Ti[:, 3], Ti[:, 1] - Ti[:, 3]
        if sign < 0:
            xr = jnp.stack([ar + cr, br + di, ar - cr, br - di], 1)
            xi = jnp.stack([ai + ci, bi - dr, ai - ci, bi + dr], 1)
        else:
            xr = jnp.stack([ar + cr, br - di, ar - cr, br + di], 1)
            xi = jnp.stack([ai + ci, bi + dr, ai - ci, bi - dr], 1)
        return xr, xi
    e_ = jnp.einsum
    xr = e_("kcbf,ca->kabf", Tr, C1) + e_("kcbf,ca->kabf", Ti, S1)
    xi = e_("kcbf,ca->kabf", Ti, C1) - e_("kcbf,ca->kabf", Tr, S1)
    return xr, xi


def cdft_j4(xr, xi, tables, sign, e, prefix="dy4"):
    """Complex DFT along axis 1 of (k, N, f) arrays in PERMUTED output
    order (forward, sign=-1), or consuming that order (inverse, sign=+1,
    without the 1/N scale).  Slice-add butterfly + ONE batched
    128-contraction matmul per component pair; the combined tables carry
    the twiddle, so the only intermediate is the butterfly output (which
    XLA fuses into the matmul operand read)."""
    C1 = tables["%s_bc" % prefix]
    S1 = tables["%s_bs" % prefix] * (-sign)      # kernel cos + sign*i*sin
    Mc = tables["%s_mc" % prefix]
    Ms = tables["%s_ms" % prefix]
    k, N, f = xr.shape
    N1 = N // 128
    x2r = xr.reshape(k, N1, 128, f)
    x2i = xi.reshape(k, N1, 128, f)
    if sign < 0:
        # forward: butterfly (contract j1) -> combined matmul (contract b)
        Sr, Si = _butterfly(x2r, x2i, C1, S1, sign, N1)
        # kernel e^{-i theta}: (Sr + iSi)(Mc - iMs)
        Yr = e("kcbf,cbg->kcgf", Sr, Mc) + e("kcbf,cbg->kcgf", Si, Ms)
        Yi = e("kcbf,cbg->kcgf", Si, Mc) - e("kcbf,cbg->kcgf", Sr, Ms)
        return Yr.reshape(k, N, f), Yi.reshape(k, N, f)
    # inverse: combined matmul (contract g) -> butterfly (contract g1)
    # kernel e^{+i theta}: (Xr + iXi)(Mc + iMs)
    Tr = e("kcgf,cbg->kcbf", x2r, Mc) - e("kcgf,cbg->kcbf", x2i, Ms)
    Ti = e("kcgf,cbg->kcbf", x2i, Mc) + e("kcgf,cbg->kcbf", x2r, Ms)
    xr_o, xi_o = _butterfly_t(Tr, Ti, C1, S1, sign, N1)
    return xr_o.reshape(k, N, f), xi_o.reshape(k, N, f)
