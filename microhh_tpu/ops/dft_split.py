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
