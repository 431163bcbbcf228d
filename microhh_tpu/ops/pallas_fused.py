"""Pallas-fused stencil kernels for the 2nd-order LES hot path.

The jnp op pipeline (advec_2 + diff_smag2 + buoyancy, each with its own
``.at[].add``) costs hundreds of HBM passes per substep; these kernels fuse
everything that reads the same 3x3x3 neighborhoods into ONE pass over the
fields per RK substep:

* evisc kernel       — strain^2 + stability-corrected Smagorinsky eddy
                       viscosity (diff_smag2.cxx calc_strain2 + calc_evisc).
* uv / wth kernels   — advec_2 (advec_2.cxx) + diff_smag2 flux divergence
                       (diff_smag2.cxx diff_u/v/w/c) + dry buoyancy
                       (thermo_dry.cxx calc_buoyancy_tend_2nd), split in two
                       passes to fit VMEM.

Layout: (k, j, i) with i on the 128 lanes.  Two variants share the same
stencil math:

* **full-plane** (plane set fits VMEM): grid over k; each program reads
  (1, jtot, itot) planes at k-1/k/k+1 via three index maps per field and
  rolls in VMEM for the horizontal stencil.
* **j-tiled** (large planes): grid over (k, j-tiles); operands stay in HBM
  (memory_space=ANY) and each program DMAs (TJ+4, itot) windows — TJ body
  rows plus a 2-row periodic halo on each side, fetched with three
  contiguous DMAs (top-halo/body/bottom-halo, wrap-aware).  The in-tile
  rolls are exact for the TJ body rows because the deepest j-shift chain in
  the math is 2.

Wall rows (the MO surface layer, k = ks and ke-1 flux replacements) are
patched afterwards in XLA as cheap 2-D fixups; the kernels compute the pure
interior formula everywhere.  Per-level column constants ride along as an
(ktot, NCONST) SMEM operand.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as cst

# column-constant slots.  C_FACZ..C_VG carry the folded Rayleigh-sponge
# (buffer.cxx) and geostrophic-Coriolis (force.cxx coriolis_2nd) per-level
# data so those ops ride the same HBM pass as advection+diffusion.
# C_TOPS holds the scalar top-ghost offset (grad_top*dzh[ke], nonzero only
# on the last row) for the ghost-free clamped-index kernel variant.
(C_DZI, C_DZHI, C_DZHI1, C_RHO, C_RHOH, C_RHOH1, C_MLEN2, C_Z,
 C_THREFH, C_DZI_M1, C_FACZ, C_FACZH, C_UREF, C_VREF, C_SREF,
 C_UG, C_VG, C_TOPS, C_ADDU, C_ADDV, C_ADDS, C_WLSDN, C_WLSUP,
 N_CONST) = range(24)

# The deepest j-shift chain in the stencil math is 2 rows, but Mosaic
# requires HBM slices to be 8-aligned along the sublane dim, so halos are
# fetched as one 8-row tile block per side.
HALO_J = 8

# All fused kernels get a raised per-kernel scoped-vmem cap: the Mosaic
# default is 16 MB, v5e has 128 MB, and both the full-plane variant at
# 512^2 planes and the merged pressure applies legitimately exceed the
# default (what previously read as a "Mosaic compiler crash" at tj=128
# was this limit).
_VMEM_LIMIT = int(os.environ.get("MICROHH_PALLAS_VMEM_MB", "100")) * (1 << 20)


def _pallas_call(*args, interpret=False, compiler_params=None, **kw):
    if not interpret and compiler_params is None:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(*args, interpret=interpret,
                          compiler_params=compiler_params, **kw)


def _im(a):
    return jnp.roll(a, 1, axis=-1)


def _ip(a):
    return jnp.roll(a, -1, axis=-1)


def _jm(a):
    return jnp.roll(a, 1, axis=-2)


def _jp(a):
    return jnp.roll(a, -1, axis=-2)


def _i2(a, b):
    return 0.5 * (a + b)


class _CCRow:
    """Column-constant accessor with an explicit row (streaming kernels run
    the grid two steps ahead of the output plane, so the row is g-2, not
    program_id)."""

    def __init__(self, ref, row):
        self.ref = ref
        self.row = row


def _cc(cc_ref, slot):
    if isinstance(cc_ref, _CCRow):
        return cc_ref.ref[cc_ref.row, slot]
    return cc_ref[pl.program_id(0), slot]


# ==========================================================================
#  shared stencil math (operates on 2-D planes or padded tiles)
# ==========================================================================

def _evisc_math(tPr, dxi, dyi, has_thermo, cc_ref,
                u_dn, u, u_up, v_dn, v, v_up, w, w1, th_dn, th_up, n2=None):
    dzi = _cc(cc_ref, C_DZI)
    dzhi = _cc(cc_ref, C_DZHI)
    dzhi1 = _cc(cc_ref, C_DZHI1)
    mlen2 = _cc(cc_ref, C_MLEN2)

    dudx = (_ip(u) - u) * dxi
    dvdy = (_jp(v) - v) * dyi
    dwdz = (w1 - w) * dzi

    c = (u - _jm(u)) * dyi + (v - _im(v)) * dxi
    horiz = 0.125 * (c * c + _ip(c) ** 2 + _jp(c) ** 2 + _ip(_jp(c)) ** 2)

    duz_lo = (u - u_dn) * dzhi + (w - _im(w)) * dxi
    duz_hi = (u_up - u) * dzhi1 + (w1 - _im(w1)) * dxi
    vert_x = 0.125 * (duz_lo ** 2 + _ip(duz_lo) ** 2 + duz_hi ** 2 + _ip(duz_hi) ** 2)

    dvz_lo = (v - v_dn) * dzhi + (w - _jm(w)) * dyi
    dvz_hi = (v_up - v) * dzhi1 + (w1 - _jm(w1)) * dyi
    vert_y = 0.125 * (dvz_lo ** 2 + _jp(dvz_lo) ** 2 + dvz_hi ** 2 + _jp(dvz_hi) ** 2)

    strain2 = 2. * (dudx ** 2 + dvdy ** 2 + dwdz ** 2 + horiz + vert_x + vert_y) + cst.dsmall

    if n2 is not None:
        # externally-computed buoyancy frequency (moist/buoy thermo).
        # strain2*(1 - min(n2/(tPr*strain2), 1-dsmall)) rewritten as a
        # max(): one sqrt, no divides (this kernel is VPU-bound).
        return mlen2 * jnp.sqrt(jnp.maximum(
            n2 * (-1. / tPr) + strain2, strain2 * cst.dsmall))
    if has_thermo:
        thref = _cc(cc_ref, C_THREFH)  # full-level thref in the evisc table
        # C_TOPS patches the clamped th_up on the last row (ghost-free
        # variant: ghost = th[ke-1] + grad_top*dzh[ke]); zero otherwise.
        n2 = cst.grav / thref * 0.5 * (th_up + _cc(cc_ref, C_TOPS) - th_dn) * dzi
        return mlen2 * jnp.sqrt(jnp.maximum(
            n2 * (-1. / tPr) + strain2, strain2 * cst.dsmall))
    return mlen2 * jnp.sqrt(strain2)


def _uv_math(tPr, dxi, dyi, visc, cc_ref,
             u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up,
             advec=True):
    dzi = _cc(cc_ref, C_DZI)
    dzhi = _cc(cc_ref, C_DZHI)
    dzhi1 = _cc(cc_ref, C_DZHI1)
    rho = _cc(cc_ref, C_RHO)
    rhoh = _cc(cc_ref, C_RHOH)
    rhoh1 = _cc(cc_ref, C_RHOH1)
    # one scalar divide per row instead of a per-point vector divide (the
    # VPU divide is ~7x a multiply; these kernels are VPU-bound)
    rdzi = dzi / rho

    # ---- u (advec_2.cxx:80-109 + diff_smag2.cxx diff_u) ----
    # advec=False: the scheme is a 2i* interpolated stencil computed by
    # the XLA op BEFORE the kernels (an additive tendency producer); the
    # kernels carry diffusion + folds only.
    zero = u * 0.
    adv_u = zero if not advec else -((_i2(u, _ip(u)) ** 2 - _i2(_im(u), u) ** 2) * dxi
              + (_i2(_im(_jp(v)), _jp(v)) * _i2(u, _jp(u))
                 - _i2(_im(v), v) * _i2(_jm(u), u)) * dyi
              + (rhoh1 * _i2(_im(w_up), w_up) * _i2(u, u_up)
                 - rhoh * _i2(_im(w), w) * _i2(u_dn, u)) * rdzi)

    ev_e = e + visc
    ev_w = _im(e) + visc
    ev_n = 0.25 * (_im(e) + e + _im(_jp(e)) + _jp(e)) + visc
    ev_s = _jm(ev_n)
    ev_t = 0.25 * (_im(e) + e + _im(e_up) + e_up) + visc
    ev_b = 0.25 * (_im(e_dn) + e_dn + _im(e) + e) + visc
    dif_u = ((ev_e * (_ip(u) - u) - ev_w * (u - _im(u))) * 2. * dxi * dxi
             + (ev_n * ((_jp(u) - u) * dyi + (_jp(v) - _im(_jp(v))) * dxi)
                - ev_s * ((u - _jm(u)) * dyi + (v - _im(v)) * dxi)) * dyi
             + (rhoh1 * ev_t * ((u_up - u) * dzhi1 + (w_up - _im(w_up)) * dxi)
                - rhoh * ev_b * ((u - u_dn) * dzhi + (w - _im(w)) * dxi)) * rdzi)

    # ---- v ----
    adv_v = zero if not advec else -((_i2(_jm(_ip(u)), _ip(u)) * _i2(v, _ip(v))
               - _i2(_jm(u), u) * _i2(_im(v), v)) * dxi
              + (_i2(v, _jp(v)) ** 2 - _i2(_jm(v), v) ** 2) * dyi
              + (rhoh1 * _i2(_jm(w_up), w_up) * _i2(v, v_up)
                 - rhoh * _i2(_jm(w), w) * _i2(v_dn, v)) * rdzi)

    ev_e2 = 0.25 * (_jm(e) + e + _ip(_jm(e)) + _ip(e)) + visc
    ev_w2 = _im(ev_e2)
    ev_n2 = e + visc
    ev_s2 = _jm(e) + visc
    ev_t2 = 0.25 * (_jm(e) + e + _jm(e_up) + e_up) + visc
    ev_b2 = 0.25 * (_jm(e_dn) + e_dn + _jm(e) + e) + visc
    dif_v = ((ev_e2 * ((_ip(v) - v) * dxi + (_ip(u) - _jm(_ip(u))) * dyi)
              - ev_w2 * ((v - _im(v)) * dxi + (u - _jm(u)) * dyi)) * dxi
             + (ev_n2 * (_jp(v) - v) - ev_s2 * (v - _jm(v))) * 2. * dyi * dyi
             + (rhoh1 * ev_t2 * ((v_up - v) * dzhi1 + (w_up - _jm(w_up)) * dyi)
                - rhoh * ev_b2 * ((v - v_dn) * dzhi + (w - _jm(w)) * dyi)) * rdzi)
    return adv_u + dif_u, adv_v + dif_v


def _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_ref,
              u_dn, u, v_dn, v, w_dn, w, w_up, a_dn, a, a_up, e_dn, e, e_up):
    dzi = _cc(cc_ref, C_DZI)
    dzhi = _cc(cc_ref, C_DZHI)
    dzhi1 = _cc(cc_ref, C_DZHI1)
    dzi_m1 = _cc(cc_ref, C_DZI_M1)
    rho = _cc(cc_ref, C_RHO)
    rhoh = _cc(cc_ref, C_RHOH)
    rhoh1 = _cc(cc_ref, C_RHOH1)
    threfh = _cc(cc_ref, C_THREFH)
    rho_m1 = _cc(cc_ref, C_Z)  # slot reused for rho[k-1]
    # scalar divides per row, not per-point vector divides (VPU-bound kernel)
    rdzi = dzi / rho
    rdzhi = dzhi / rhoh
    tPri = 1. / tPr

    # ---- w (half level k) ----
    adv_w = -((_i2(_ip(u_dn), _ip(u)) * _i2(w, _ip(w))
               - _i2(u_dn, u) * _i2(_im(w), w)) * dxi
              + (_i2(_jp(v_dn), _jp(v)) * _i2(w, _jp(w))
                 - _i2(v_dn, v) * _i2(_jm(w), w)) * dyi
              + (rho * _i2(w, w_up) ** 2 - rho_m1 * _i2(w_dn, w) ** 2)
              * rdzhi)

    ev_xw = 0.25 * (_im(e_dn) + _im(e) + e_dn + e) + visc
    ev_yw = 0.25 * (_jm(e_dn) + _jm(e) + e_dn + e) + visc
    dif_w = ((_ip(ev_xw) * ((_ip(w) - w) * dxi + (_ip(u) - _ip(u_dn)) * dzhi)
              - ev_xw * ((w - _im(w)) * dxi + (u - u_dn) * dzhi)) * dxi
             + (_jp(ev_yw) * ((_jp(w) - w) * dyi + (_jp(v) - _jp(v_dn)) * dzhi)
                - ev_yw * ((w - _jm(w)) * dyi + (v - v_dn) * dzhi)) * dyi
             + (rho * (e + visc) * (w_up - w) * dzi
                - rho_m1 * (e_dn + visc) * (w - w_dn) * dzi_m1) * (2. * rdzhi))
    wt = adv_w + dif_w
    if has_thermo:
        wt = wt + cst.grav / threfh * (_i2(a_dn, a) - threfh)

    # ---- scalar (th) ----
    if has_thermo:
        adv_s = -((_ip(u) * _i2(a, _ip(a)) - u * _i2(_im(a), a)) * dxi
                  + (_jp(v) * _i2(a, _jp(a)) - v * _i2(_jm(a), a)) * dyi
                  + (rhoh1 * w_up * _i2(a, a_up) - rhoh * w * _i2(a_dn, a)) * rdzi)
        se = 0.5 * (e + _ip(e)) * tPri + svisc
        sw_ = 0.5 * (_im(e) + e) * tPri + svisc
        sn = 0.5 * (e + _jp(e)) * tPri + svisc
        ss = 0.5 * (_jm(e) + e) * tPri + svisc
        st_ = 0.5 * (e + e_up) * tPri + svisc
        sb = 0.5 * (e_dn + e) * tPri + svisc
        dif_s = ((se * (_ip(a) - a) - sw_ * (a - _im(a))) * dxi * dxi
                 + (sn * (_jp(a) - a) - ss * (a - _jm(a))) * dyi * dyi
                 + (rhoh1 * st_ * (a_up - a) * dzhi1
                    - rhoh * sb * (a - a_dn) * dzhi) * rdzi)
        tht = adv_s + dif_s
    else:
        tht = jnp.zeros_like(u)
    return wt, tht


def _w_math(dxi, dyi, visc, cc_ref,
            u_dn, u, v_dn, v, w_dn, w, w_up, e_dn, e, advec=True):
    """advec_2 + diff_smag2 for w alone (the generic fused mode's w pass;
    buoyancy stays in the thermo op)."""
    dzi = _cc(cc_ref, C_DZI)
    dzhi = _cc(cc_ref, C_DZHI)
    dzi_m1 = _cc(cc_ref, C_DZI_M1)
    rho = _cc(cc_ref, C_RHO)
    rhoh = _cc(cc_ref, C_RHOH)
    rho_m1 = _cc(cc_ref, C_Z)  # slot reused for rho[k-1]
    rdzhi = dzhi / rhoh  # scalar divide per row (VPU-bound kernel)

    adv_w = (w * 0.) if not advec else \
        -((_i2(_ip(u_dn), _ip(u)) * _i2(w, _ip(w))
           - _i2(u_dn, u) * _i2(_im(w), w)) * dxi
          + (_i2(_jp(v_dn), _jp(v)) * _i2(w, _jp(w))
             - _i2(v_dn, v) * _i2(_jm(w), w)) * dyi
          + (rho * _i2(w, w_up) ** 2 - rho_m1 * _i2(w_dn, w) ** 2)
          * rdzhi)
    ev_xw = 0.25 * (_im(e_dn) + _im(e) + e_dn + e) + visc
    ev_yw = 0.25 * (_jm(e_dn) + _jm(e) + e_dn + e) + visc
    dif_w = ((_ip(ev_xw) * ((_ip(w) - w) * dxi + (_ip(u) - _ip(u_dn)) * dzhi)
              - ev_xw * ((w - _im(w)) * dxi + (u - u_dn) * dzhi)) * dxi
             + (_jp(ev_yw) * ((_jp(w) - w) * dyi + (_jp(v) - _jp(v_dn)) * dzhi)
                - ev_yw * ((w - _jm(w)) * dyi + (v - v_dn) * dzhi)) * dyi
             + (rho * (e + visc) * (w_up - w) * dzi
                - rho_m1 * (e_dn + visc) * (w - w_dn) * dzi_m1) * (2. * rdzhi))
    wt = adv_w + dif_w
    fb = _cc(cc_ref, C_FACZH)
    return wt - fb * w


def _scalar_math(tPr, dxi, dyi, svisc, cc_ref,
                 u, v, w, w_up, a_dn, a, a_up, e_dn, e, e_up, advec=True):
    """advec_2 + diff_smag2 (diff_c) for one generic scalar."""
    dzi = _cc(cc_ref, C_DZI)
    dzhi = _cc(cc_ref, C_DZHI)
    dzhi1 = _cc(cc_ref, C_DZHI1)
    rho = _cc(cc_ref, C_RHO)
    rhoh = _cc(cc_ref, C_RHOH)
    rhoh1 = _cc(cc_ref, C_RHOH1)
    rdzi = dzi / rho     # scalar divides per row (VPU-bound kernel)
    tPri = 1. / tPr
    adv_s = (a * 0.) if not advec else \
        -((_ip(u) * _i2(a, _ip(a)) - u * _i2(_im(a), a)) * dxi
          + (_jp(v) * _i2(a, _jp(a)) - v * _i2(_jm(a), a)) * dyi
          + (rhoh1 * w_up * _i2(a, a_up) - rhoh * w * _i2(a_dn, a)) * rdzi)
    se = 0.5 * (e + _ip(e)) * tPri + svisc
    sw_ = 0.5 * (_im(e) + e) * tPri + svisc
    sn = 0.5 * (e + _jp(e)) * tPri + svisc
    ss = 0.5 * (_jm(e) + e) * tPri + svisc
    st_ = 0.5 * (e + e_up) * tPri + svisc
    sb = 0.5 * (e_dn + e) * tPri + svisc
    dif_s = ((se * (_ip(a) - a) - sw_ * (a - _im(a))) * dxi * dxi
             + (sn * (_jp(a) - a) - ss * (a - _jm(a))) * dyi * dyi
             + (rhoh1 * st_ * (a_up - a) * dzhi1
                - rhoh * sb * (a - a_dn) * dzhi) * rdzi)
    return adv_s + dif_s


# ==========================================================================
#  full-plane kernel bodies
# ==========================================================================

def _evisc_body(tPr, dxi, dyi, has_thermo, cc_ref,
                um, uc, up, vm, vc, vp, wm, wc, wp, thm, thc, thp, out_ref):
    out_ref[0] = _evisc_math(tPr, dxi, dyi, has_thermo, cc_ref,
                             um[0], uc[0], up[0], vm[0], vc[0], vp[0],
                             wc[0], wp[0], thm[0], thp[0])


def _evisc_n2_body(tPr, dxi, dyi, cc_ref,
                   um, uc, up, vm, vc, vp, wc, wp, n2c, out_ref):
    """Eddy viscosity with an externally-computed N2 plane (moist/buoy
    thermo: sat_adjust etc. run in XLA, the stability correction here)."""
    out_ref[0] = _evisc_math(tPr, dxi, dyi, False, cc_ref,
                             um[0], uc[0], up[0], vm[0], vc[0], vp[0],
                             wc[0], wp[0], uc[0], uc[0], n2=n2c[0])


def _limits_body(tPr, dxi, dyi, has_thermo, cc_ref,
                 um, uc, up, vm, vc, vp, wc, wp, thm, thp,
                 cfl_ref, ev_ref):
    """Per-plane maxima of the CFL rate (advec_2.cxx:50-78 pointwise
    expression) and the Smagorinsky eddy viscosity (diff_smag2.cxx
    calc_dnmul input) in ONE read of (u, v, w, th) — the adaptive-dt
    limits without materializing evisc or re-reading the velocities.
    Exactness: the pointwise expressions are the same ops as the XLA
    cfl_max / evisc pipeline and max is reassociation-safe, so the
    step's dt limits match to fma-contraction ulps."""
    ev = _evisc_math(tPr, dxi, dyi, has_thermo, cc_ref,
                     um[0], uc[0], up[0], vm[0], vc[0], vp[0],
                     wc[0], wp[0], thm[0], thp[0])
    dzi = _cc(cc_ref, C_DZI)
    cfl = (jnp.abs(_i2(uc[0], _ip(uc[0]))) * dxi
           + jnp.abs(_i2(vc[0], _jp(vc[0]))) * dyi
           + jnp.abs(_i2(wc[0], wp[0])) * dzi)
    # whole-(1, kt) SMEM blocks with a constant index map: the TPU grid
    # runs sequentially, so each plane writes its own slot
    k = pl.program_id(0)
    cfl_ref[0, k] = jnp.max(cfl)
    ev_ref[0, k] = jnp.max(ev)


def _w_body(dxi, dyi, visc, cc_ref, tw,
            um, uc, vm, vc, wm, wc, wp, em, ec, wt_ref, advec=True):
    wt = _w_math(dxi, dyi, visc, cc_ref,
                 um[0], uc[0], vm[0], vc[0], wm[0], wc[0], wp[0],
                 em[0], ec[0], advec=advec)
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)  # wall half level
    wt_ref[0] = tw[0] + wt


def _scalar_cols(cc_ref, am, ac, ap):
    """Generic column fold for one scalar (see _extra_uv fold_add)."""
    return (_cc(cc_ref, C_ADDS) - _cc(cc_ref, C_FACZ) * ac
            + _cc(cc_ref, C_WLSDN) * (ac - am)
            + _cc(cc_ref, C_WLSUP) * (ap - ac))


def _scalar_body(tPr, dxi, dyi, svisc, fold_add, cc_ref, ta,
                 uc, vc, wc, wp, am, ac, ap, em, ec, ep, at_ref,
                 advec=True):
    tt = ta[0] + _scalar_math(
        tPr, dxi, dyi, svisc, cc_ref,
        uc[0], vc[0], wc[0], wp[0], am[0], ac[0], ap[0],
        em[0], ec[0], ep[0], advec=advec)
    if fold_add:
        tt = tt + _scalar_cols(cc_ref, am[0], ac[0], ap[0])
    at_ref[0] = tt


def _w_rk_body(dxi, dyi, visc, carry, cc_ref, rk_ref, tw,
               um, uc, vm, vc, wm, wc, wp, em, ec, *outs, advec=True):
    """Generic-path w pass with the low-storage RK update folded in: the
    carried t (which already holds thermo/micro/force contributions)
    enters as input; the kernel writes w* = w + cB*dt*t_total and the
    scaled carry cA_next*t_total (see _tend_uv_rk_body)."""
    wt = _w_math(dxi, dyi, visc, cc_ref,
                 um[0], uc[0], vm[0], vc[0], wm[0], wc[0], wp[0],
                 em[0], ec[0], advec=advec)
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)  # wall half level
    tt = tw[0] + wt
    outs[0][0] = wc[0] + rk_ref[0] * tt
    if carry:
        outs[1][0] = rk_ref[1] * tt


def _scalar_rk_body(tPr, dxi, dyi, svisc, carry, fold_add, cc_ref, rk_ref,
                    ta, uc, vc, wc, wp, am, ac, ap, em, ec, ep, *outs,
                    advec=True):
    """Generic-path scalar pass with the RK update folded in."""
    tt = ta[0] + _scalar_math(
        tPr, dxi, dyi, svisc, cc_ref,
        uc[0], vc[0], wc[0], wp[0], am[0], ac[0], ap[0],
        em[0], ec[0], ep[0], advec=advec)
    if fold_add:
        tt = tt + _scalar_cols(cc_ref, am[0], ac[0], ap[0])
    outs[0][0] = ac[0] + rk_ref[0] * tt
    if carry:
        outs[1][0] = rk_ref[1] * tt


def _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans, cc_ref,
              u, v, ut, vt, fold_add=False, u_dn=None, u_up=None,
              v_dn=None, v_up=None):
    """Folded buffer u/v-relaxation + geostrophic Coriolis (force.cxx
    coriolis_2nd) — extra FMAs on planes the uv pass already holds.

    ``fold_add`` is the GENERIC column fold (traced per-substep tables,
    see generic_col_tables): an additive per-level constant C_ADDU/C_ADDV
    (large-scale sources, dpdx, buffer reference pull, mean subsidence,
    nudging), a relaxation rate C_FACZ (buffer + decay), and the local-
    subsidence vertical stencil C_WLSDN/C_WLSUP on the neighbor planes
    the pass already reads."""
    if fold_buffer:
        facz = _cc(cc_ref, C_FACZ)
        ut = ut - facz * (u - _cc(cc_ref, C_UREF))
        vt = vt - facz * (v - _cc(cc_ref, C_VREF))
    if fold_add:
        facz = _cc(cc_ref, C_FACZ)
        ut = ut + _cc(cc_ref, C_ADDU) - facz * u
        vt = vt + _cc(cc_ref, C_ADDV) - facz * v
        if u_dn is not None:
            wdn = _cc(cc_ref, C_WLSDN)
            wup = _cc(cc_ref, C_WLSUP)
            ut = ut + wdn * (u - u_dn) + wup * (u_up - u)
            vt = vt + wdn * (v - v_dn) + wup * (v_up - v)
    if fold_coriolis:
        v_at_u = 0.25 * (v + _ip(v) + _jm(v) + _jm(_ip(v)))
        u_at_v = 0.25 * (u + _im(u) + _jp(u) + _im(_jp(u)))
        ut = ut + fc * (v_at_u + vtrans - _cc(cc_ref, C_VG))
        vt = vt - fc * (u_at_v + utrans - _cc(cc_ref, C_UG))
    return ut, vt


def _extra_wth(fold_buffer, cc_ref, w, th, wt, tht, has_thermo):
    """Folded buffer w/scalar relaxation (buffer.cxx)."""
    if fold_buffer:
        wt = wt - _cc(cc_ref, C_FACZH) * w
        if has_thermo:
            tht = tht - _cc(cc_ref, C_FACZ) * (th - _cc(cc_ref, C_SREF))
    return wt, tht


def _scalars_rk_body(tPr, dxi, dyi, sviscs, carry, fold_add, advec,
                     *args):
    """ALL scalars' advec+diff+RK fold in one pass: the (u, v, w, evisc)
    planes are read once instead of once per scalar (4 scalars share
    ~7 operand planes, so the merged pass saves ~40% of the scalar-kernel
    HBM traffic).  args = [cc_0..cc_{S-1}, rk, ta_0..ta_{S-1}, uc, vc,
    wc, wp, (am, ac, ap) x S, em, ec, ep, outs...]; per-scalar column
    tables ride in the cc SMEM refs."""
    S = len(sviscs)
    cc_refs = args[:S]
    rk_ref = args[S]
    args = args[S + 1:]
    tas = args[:S]
    uc, vc, wc, wp = args[S:S + 4]
    ablks = args[S + 4:S + 4 + 3 * S]
    em, ec, ep = args[S + 4 + 3 * S:S + 7 + 3 * S]
    outs = args[S + 7 + 3 * S:]
    for si in range(S):
        am, ac, ap = ablks[3 * si:3 * si + 3]
        cc_ref = cc_refs[si]
        tt = tas[si][0] + _scalar_math(
            tPr, dxi, dyi, sviscs[si], cc_ref,
            uc[0], vc[0], wc[0], wp[0], am[0], ac[0], ap[0],
            em[0], ec[0], ep[0], advec=advec)
        if fold_add:
            tt = tt + _scalar_cols(cc_ref, am[0], ac[0], ap[0])
        outs[si][0] = ac[0] + rk_ref[0] * tt
        if carry:
            outs[S + si][0] = rk_ref[1] * tt


def _tend_uv_body(tPr, dxi, dyi, visc, extras, cc_ref,
                  tu, tv, um, uc, up, vm, vc, vp, wc, wp, em, ec, ep,
                  ut_ref, vt_ref, fold_add=False, advec=True):
    """uv tendencies ACCUMULATED onto the aliased carried-tendency blocks
    (tu/tv alias ut_ref/vt_ref, so the XLA-side pad+add pass disappears)."""
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_ref,
                      um[0], uc[0], up[0], vm[0], vc[0], vp[0],
                      wc[0], wp[0], em[0], ec[0], ep[0], advec=advec)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_ref, uc[0], vc[0], ut, vt, fold_add=fold_add,
                       u_dn=um[0], u_up=up[0], v_dn=vm[0], v_up=vp[0])
    ut_ref[0] = tu[0] + ut
    vt_ref[0] = tv[0] + vt


def _tend_wth_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras, cc_ref,
                   tw, tth, um, uc, vm, vc, wm, wc, wp, thm, thc, thp,
                   em, ec, ep, wt_ref, tht_ref):
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_ref,
                        um[0], uc[0], vm[0], vc[0], wm[0], wc[0], wp[0],
                        thm[0], thc[0], thp[0], em[0], ec[0], ep[0])
    fold_buffer = extras[0]
    wt, tht = _extra_wth(fold_buffer, cc_ref, wc[0], thc[0], wt, tht,
                         has_thermo)
    # half level ks is the wall: no w tendency on the first row
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)
    wt_ref[0] = tw[0] + wt
    tht_ref[0] = tth[0] + tht


def _tend_uv_rk_body(tPr, dxi, dyi, visc, extras, carry, first, cc_ref,
                     rk_ref, *args, fold_add=False, advec=True):
    """uv tendencies with the low-storage RK update FOLDED IN: besides the
    scaled carried tendency (cA_next * t_total, aliased on tu/tv) the
    kernel writes the pre-projection state s* = s + cB*dt*t_total — the
    separate XLA axpy+scale pass over all prognostics disappears
    (timeloop.cxx:250-285 update, done in-register here).  carry=False
    (last substep, cA_next == 0) drops the dead t outputs; first=True
    (first substep, cA[0] == 0 so the carried t is identically zero)
    drops the t INPUTS — no zero buffers are materialized or read."""
    if first:
        tu = tv = None
        (um, uc, up, vm, vc, vp, wc, wp, em, ec, ep) = args[:11]
        outs = args[11:]
    else:
        (tu, tv, um, uc, up, vm, vc, vp, wc, wp, em, ec, ep) = args[:13]
        outs = args[13:]
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_ref,
                      um[0], uc[0], up[0], vm[0], vc[0], vp[0],
                      wc[0], wp[0], em[0], ec[0], ep[0], advec=advec)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_ref, uc[0], vc[0], ut, vt, fold_add=fold_add,
                       u_dn=um[0], u_up=up[0], v_dn=vm[0], v_up=vp[0])
    cbdt, can = rk_ref[0], rk_ref[1]
    ttu = ut if first else tu[0] + ut
    ttv = vt if first else tv[0] + vt
    outs[0][0] = uc[0] + cbdt * ttu
    outs[1][0] = vc[0] + cbdt * ttv
    if carry:
        outs[2][0] = can * ttu
        outs[3][0] = can * ttv


def _tend_wth_rk_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras,
                      carry, first, cc_ref, rk_ref, *args):
    if first:
        tw = tth = None
        (um, uc, vm, vc, wm, wc, wp, thm, thc, thp, em, ec, ep) = args[:13]
        outs = args[13:]
    else:
        (tw, tth, um, uc, vm, vc, wm, wc, wp, thm, thc, thp,
         em, ec, ep) = args[:15]
        outs = args[15:]
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_ref,
                        um[0], uc[0], vm[0], vc[0], wm[0], wc[0], wp[0],
                        thm[0], thc[0], thp[0], em[0], ec[0], ep[0])
    fold_buffer = extras[0]
    wt, tht = _extra_wth(fold_buffer, cc_ref, wc[0], thc[0], wt, tht,
                         has_thermo)
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)
    cbdt, can = rk_ref[0], rk_ref[1]
    ttw = wt if first else tw[0] + wt
    tt_th = tht if first else tth[0] + tht
    outs[0][0] = wc[0] + cbdt * ttw
    outs[1][0] = thc[0] + cbdt * tt_th
    if carry:
        outs[2][0] = can * ttw
        outs[3][0] = can * tt_th


# ==========================================================================
#  k-streaming kernel bodies
#
#  The blocked kernels above fetch each field THREE times per k-step (one
#  copy per k-offset BlockSpec).  The streaming variants fetch each plane
#  ONCE: the grid runs kt+2 steps, each step DMAs plane g+ks-1 of every
#  field into a 3-plane shift register in VMEM scratch, and from step 2 on
#  computes the output for plane k = g-2 from the register.  The output
#  BlockSpec maps to max(g-2, 0); Mosaic only flushes an output block when
#  its index changes, so the warm-up steps write nothing.  HBM traffic
#  drops from 3*nf+nout to nf+nout planes per k-step.
# ==========================================================================

def _stream_body(nf, nout, math_fn, cc_ref, *args):
    inc = args[:nf]
    outs = args[nf:nf + nout]
    ring = args[nf + nout]
    g = pl.program_id(0)

    # shift register: drop the oldest plane, append the incoming one
    for f in range(nf):
        ring[f, 0] = ring[f, 1]
        ring[f, 1] = ring[f, 2]
        ring[f, 2] = inc[f][0]

    @pl.when(g >= 2)
    def _compute():
        row = g - 2
        planes = tuple((ring[f, 0], ring[f, 1], ring[f, 2])
                       for f in range(nf))
        res = math_fn(_CCRow(cc_ref, row), planes)
        for o, r in zip(outs, res):
            o[0] = r


def _evisc_stream_math(tPr, dxi, dyi, has_thermo, cc, planes):
    (u_dn, u, u_up), (v_dn, v, v_up), (w_dn, w, w_up), (th_dn, th, th_up) = planes
    return (_evisc_math(tPr, dxi, dyi, has_thermo, cc,
                        u_dn, u, u_up, v_dn, v, v_up, w, w_up,
                        th_dn, th_up),)


def _uv_stream_math(tPr, dxi, dyi, visc, extras, cc, planes):
    (u_dn, u, u_up), (v_dn, v, v_up), (w_dn, w, w_up), (e_dn, e, e_up) = planes
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc,
                      u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    return _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                     cc, u, v, ut, vt)


def _wth_stream_math(tPr, dxi, dyi, visc, svisc, has_thermo, extras, cc,
                     planes):
    ((u_dn, u, u_up), (v_dn, v, v_up), (w_dn, w, w_up),
     (th_dn, th, th_up), (e_dn, e, e_up)) = planes
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc,
                        u_dn, u, v_dn, v, w_dn, w, w_up,
                        th_dn, th, th_up, e_dn, e, e_up)
    return _extra_wth(extras[0], cc, w, th, wt, tht, has_thermo)


# ==========================================================================
#  j-tiled kernel bodies (manual double-buffered DMA with wrap-aware halos)
# ==========================================================================

def _window_copies(hbm_refs, koffs, scratch, sems, ks, TJ, jtot,
                   slot, k_idx, jt_idx, bounds=None):
    """The DMA descriptors for one grid step's windows into buffer `slot`:
    per (field, k-offset), TJ body rows of j-tile `jt_idx` at level
    ``ks + k_idx + koff`` plus HALO_J-row periodic halos, as three
    contiguous copies (offsets 8-aligned by construction).  ``bounds``:
    optional per-window (base, lo, hi) for the ghost-free variant — the
    level index becomes clip(k_idx + base + koff, lo, hi)."""
    j0 = pl.multiple_of(jt_idx * TJ, 8)
    top = pl.multiple_of(
        jax.lax.rem(jnp.int32(j0 - HALO_J + jtot), jnp.int32(jtot)), 8)
    bot = pl.multiple_of(jax.lax.rem(jnp.int32(j0 + TJ), jnp.int32(jtot)), 8)
    copies = []
    for wdx, (ref, koff) in enumerate(zip(hbm_refs, koffs)):
        if bounds is None:
            k_abs = k_idx + ks + koff
        else:
            base, lo, hi = bounds[wdx]
            k_abs = jnp.clip(k_idx + base + koff, lo, hi)
        copies.append(pltpu.make_async_copy(
            ref.at[k_abs, pl.ds(top, HALO_J)],
            scratch.at[slot, wdx, pl.ds(0, HALO_J)], sems.at[slot, wdx, 0]))
        copies.append(pltpu.make_async_copy(
            ref.at[k_abs, pl.ds(j0, TJ)],
            scratch.at[slot, wdx, pl.ds(HALO_J, TJ)], sems.at[slot, wdx, 1]))
        copies.append(pltpu.make_async_copy(
            ref.at[k_abs, pl.ds(bot, HALO_J)],
            scratch.at[slot, wdx, pl.ds(HALO_J + TJ, HALO_J)],
            sems.at[slot, wdx, 2]))
    return copies


def _fetch_windows(hbm_refs, koffs, scratch, sems, ks, TJ, jtot,
                   bounds=None):
    """Double-buffered window fetch over the sequential (k, jt) grid:
    wait for this step's windows (prefetched by the previous step), then
    start the NEXT step's windows into the other buffer — overlapping HBM
    transfers with this step's compute.  Returns the ready buffer."""
    k = pl.program_id(0)
    jt = pl.program_id(1)
    njt = pl.num_programs(1)
    nk = pl.num_programs(0)
    n = jnp.int32(k * njt + jt)
    slot = jax.lax.rem(n, jnp.int32(2))
    nslot = jax.lax.rem(n + 1, jnp.int32(2))

    def start(s_, ki, ji):
        for c in _window_copies(hbm_refs, koffs, scratch, sems,
                                ks, TJ, jtot, s_, ki, ji, bounds):
            c.start()

    @pl.when(n == 0)
    def _prime():
        start(slot, k, jt)

    # prefetch the next step's windows (wraps from (k, njt-1) to (k+1, 0))
    nn = n + 1
    k_n = nn // jnp.int32(njt)
    jt_n = jax.lax.rem(nn, jnp.int32(njt))

    @pl.when(nn < nk * njt)
    def _prefetch():
        start(nslot, k_n, jt_n)

    for c in _window_copies(hbm_refs, koffs, scratch, sems,
                            ks, TJ, jtot, slot, k, jt, bounds):
        c.wait()
    return slot


# ==========================================================================
#  k-ring j-tiled fetch: each field plane is DMAed ONCE per tile pass
# ==========================================================================
#  _fetch_windows above fetches every field at THREE k-offsets per grid
#  step, so each plane of u/v/w/th/e crosses HBM three times per substep.
#  The ring variant reorders the grid to (jt, k) — k fastest — and keeps a
#  4-deep ring of (TJ+2H, itot) windows per field in VMEM, addressed by
#  clamped plane index mod 4.  Per step each field fetches ONE new window
#  (plane k+2, one step ahead of first use), cutting the RK kernels' HBM
#  reads by ~40% at 512^3 (measured memory-bound at ~88% of HBM peak).

def _ring_copies(ref, bound, scratch, sems, f, r_signed, TJ, jtot, jt_idx,
                 depth=4):
    """DMA descriptors for ring field f at signed relative plane r_signed
    (clamped per the field's (base, lo, hi) bound): TJ body rows of tile
    jt_idx plus HALO_J-row periodic halos into ring slot (r_abs - lo) %
    depth (same 8-aligned three-copy layout as _window_copies)."""
    base, lo, hi = bound
    r_abs = jnp.clip(jnp.int32(r_signed + base), jnp.int32(lo), jnp.int32(hi))
    slot = jax.lax.rem(r_abs - jnp.int32(lo), jnp.int32(depth))
    j0 = pl.multiple_of(jt_idx * TJ, 8)
    top = pl.multiple_of(
        jax.lax.rem(jnp.int32(j0 - HALO_J + jtot), jnp.int32(jtot)), 8)
    bot = pl.multiple_of(jax.lax.rem(jnp.int32(j0 + TJ), jnp.int32(jtot)), 8)
    return [
        pltpu.make_async_copy(
            ref.at[r_abs, pl.ds(top, HALO_J)],
            scratch.at[slot, f, pl.ds(0, HALO_J)], sems.at[slot, f, 0]),
        pltpu.make_async_copy(
            ref.at[r_abs, pl.ds(j0, TJ)],
            scratch.at[slot, f, pl.ds(HALO_J, TJ)], sems.at[slot, f, 1]),
        pltpu.make_async_copy(
            ref.at[r_abs, pl.ds(bot, HALO_J)],
            scratch.at[slot, f, pl.ds(HALO_J + TJ, HALO_J)],
            sems.at[slot, f, 2]),
    ]


def _ring_fetch(hbm_refs, bounds, scratch, sems, TJ, jtot, extra=0):
    """Ring orchestration for the (jt, k) grid: at k == 0 prime planes
    0..1+extra (offset -1 clamps onto plane 0); every step but the last
    starts the fetch of plane k+2+extra; every step k >= 1 waits for
    plane k+1+extra (started one step earlier).  ``extra`` raises the
    lookahead (and the ring depth to 4+extra) for kernels that read up to
    offset +1+extra (the evisc fold needs +2).  Clamped duplicate fetches
    at the top edge rewrite a slot with identical bytes — benign.
    Returns a reader ``win(f, off)`` for the (TJ+2H, itot) window of
    field f at the clamped plane k+off."""
    jt = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    nf = len(hbm_refs)
    depth = 4 + extra

    def copies(f, r_signed):
        return _ring_copies(hbm_refs[f], bounds[f], scratch, sems, f,
                            r_signed, TJ, jtot, jt, depth=depth)

    @pl.when(k == 0)
    def _prime():
        prime_rs = list(range(2 + extra))
        for f in range(nf):
            for r in prime_rs:
                for c in copies(f, r):
                    c.start()
        for f in range(nf):
            for r in prime_rs:
                for c in copies(f, r):
                    c.wait()

    @pl.when(k < nk - 1)
    def _prefetch():
        for f in range(nf):
            for c in copies(f, k + 2 + extra):
                c.start()

    @pl.when(k >= 1)
    def _wait():
        for f in range(nf):
            for c in copies(f, k + 1 + extra):
                c.wait()

    def win(f, off):
        base, lo, hi = bounds[f]
        r_abs = jnp.clip(jnp.int32(k + off + base),
                         jnp.int32(lo), jnp.int32(hi))
        slot = jax.lax.rem(r_abs - jnp.int32(lo), jnp.int32(depth))
        return scratch[slot, f]

    return win


def _all_tiled_rk_ring_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras,
                            ks, ke, TJ, jtot, carry, first, want_rhs,
                            cc_ref, rk_ref, *rest):
    """k-ring variant of _all_tiled_rk_body (fold_ghosts only): grid is
    (jt, k) with k fastest; u/v/w/th/e (and the carried tv under
    want_rhs) ride the plane ring, so each HBM plane is read once per
    substep instead of three times.  Math and write semantics are
    identical to _all_tiled_rk_body."""
    kt = ke - ks
    if first:
        tu = tw = tth = tv_blk = None
        hbm = list(rest[:5])          # u, v, w, th, e
        rest = rest[5:]
        kinds = ["c", "c", "w", "c", "e"]
    elif want_rhs:
        tu, tw, tth = rest[:3]
        tv_blk = None
        hbm = list(rest[3:9])         # u, v, w, th, e, tv
        rest = rest[9:]
        kinds = ["c", "c", "w", "c", "e", "c"]
    else:
        tu, tv_blk, tw, tth = rest[:4]
        hbm = list(rest[4:9])
        rest = rest[9:]
        kinds = ["c", "c", "w", "c", "e"]
    bounds = _tiled_bounds(True, ks, ke, kinds)
    if want_rhs:
        outs, scratch, sems, xbuf = rest[:-3], rest[-3], rest[-2], rest[-1]
    else:
        outs, scratch, sems = rest[:-2], rest[-2], rest[-1]
    win = _ring_fetch(hbm, bounds, scratch, sems, TJ, jtot)
    k = pl.program_id(1)
    u_dn, u, u_up = win(0, -1), win(0, 0), win(0, 1)
    v_dn, v, v_up = win(1, -1), win(1, 0), win(1, 1)
    w_dn, w, w_up = win(2, -1), win(2, 0), win(2, 1)
    th_dn, th, th_up = win(3, -1), win(3, 0), win(3, 1)
    e_dn, e, e_up = win(4, -1), win(4, 0), win(4, 1)
    tv_win = win(5, 0) if (want_rhs and not first) else None
    # the flush step (k == kt) recomputes plane kt-1 purely to feed the
    # rhs completion; clamp the constant-table row
    cc_k = _CCRow(cc_ref, jnp.minimum(k, kt - 1))
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_k,
                      u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up)
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_k,
                        u_dn, u, v_dn, v, w_dn, w, w_up,
                        th_dn, th, th_up, e_dn, e, e_up)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_k, u, v, ut, vt)
    wt, tht = _extra_wth(fold_buffer, cc_k, w, th, wt, tht, has_thermo)
    wt = jnp.where(k == 0, 0., wt)
    H = HALO_J
    cbdt, can = rk_ref[0], rk_ref[1]
    ttu = ut[H:H + TJ] if first else tu[0] + ut[H:H + TJ]
    if want_rhs and not first:
        ttv = tv_win[H:H + TJ] + vt[H:H + TJ]
    else:
        ttv = vt[H:H + TJ] if first else tv_blk[0] + vt[H:H + TJ]
    ttw = wt[H:H + TJ] if first else tw[0] + wt[H:H + TJ]
    ttth = tht[H:H + TJ] if first else tth[0] + tht[H:H + TJ]
    us_b = u[H:H + TJ] + cbdt * ttu
    ws_b = w[H:H + TJ] + cbdt * ttw
    outs[0][0] = us_b
    outs[1][0] = v[H:H + TJ] + cbdt * ttv
    outs[2][0] = ws_b
    outs[3][0] = th[H:H + TJ] + cbdt * ttth
    if carry:
        outs[4][0] = can * ttu
        outs[5][0] = can * ttv
        outs[6][0] = can * ttw
        outs[7][0] = can * ttth
    if want_rhs:
        dti = rk_ref[2]
        ttv_ext = (vt[H:H + TJ + 1] if first
                   else tv_win[H:H + TJ + 1] + vt[H:H + TJ + 1])
        vsx = v[H:H + TJ + 1] + cbdt * ttv_ext
        rho = _cc(cc_k, C_RHO)
        rhoh = _cc(cc_k, C_RHOH)
        divh = ((_ip(us_b) - us_b) * dxi + (vsx[1:] - vsx[:-1]) * dyi)
        xnew = rho * divh - rhoh * ws_b * _cc(cc_k, C_DZI)
        j0 = pl.multiple_of(pl.program_id(0) * TJ, 8)
        wflux = jnp.where(k == kt, 0., rhoh * ws_b * _cc(cc_k, C_DZI_M1))
        outs[-1][0] = dti * (xbuf[pl.ds(j0, TJ)] + wflux)
        xbuf[pl.ds(j0, TJ)] = xnew


def _all_tiled_rk_ev_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras,
                          ks, ke, TJ, jtot, carry, first, want_rhs, surface,
                          cc_ref, cce_ref, rk_ref, *rest):
    """k-ring RK body with the Smagorinsky viscosity FOLDED IN: the
    separate evisc pass (its 4 field reads + 1 write + the RK kernel's
    re-read) disappears.  At step k the kernel computes the evisc plane
    k+1 from the field ring (which runs one plane deeper, offsets up to
    +2) into a 4-deep VMEM e-ring; plane 0 is primed from the XLA
    surface-row input (MOST wall form) or computed in-kernel with clamped
    planes.  Each step also writes e(k) out, so the wall-row patches and
    any aux consumer see exactly the array the standalone pass produced."""
    kt = ke - ks
    if first:
        tu = tw = tth = tv_blk = None
        hbm = list(rest[:4])          # u, v, w, th
        rest = rest[4:]
        kinds = ["c", "c", "w", "c"]
    elif want_rhs:
        tu, tw, tth = rest[:3]
        tv_blk = None
        hbm = list(rest[3:8])         # u, v, w, th, tv
        rest = rest[8:]
        kinds = ["c", "c", "w", "c", "c"]
    else:
        tu, tv_blk, tw, tth = rest[:4]
        hbm = list(rest[4:8])
        rest = rest[8:]
        kinds = ["c", "c", "w", "c"]
    if surface:
        se_ref = rest[0]
        rest = rest[1:]
    bounds = _tiled_bounds(True, ks, ke, kinds)
    if want_rhs:
        outs, rest = rest[:-5], rest[-5:]
        scratch, sems, ering, esem, xbuf = rest
    else:
        outs, rest = rest[:-4], rest[-4:]
        scratch, sems, ering, esem = rest
    win = _ring_fetch(hbm, bounds, scratch, sems, TJ, jtot, extra=1)
    k = pl.program_id(1)
    jt = pl.program_id(0)
    H = HALO_J

    def eslot(p):
        pc = jnp.clip(jnp.int32(p), jnp.int32(0), jnp.int32(kt - 1))
        return jax.lax.rem(pc, jnp.int32(4))

    # ---- prime e(0): the XLA MOST surface row, or the interior formula
    # with clamped lower planes (matching the standalone kernel's row 0)
    @pl.when(k == 0)
    def _prime_e0():
        if surface:
            j0 = pl.multiple_of(jt * TJ, 8)
            top = pl.multiple_of(
                jax.lax.rem(jnp.int32(j0 - H + jtot), jnp.int32(jtot)), 8)
            bot = pl.multiple_of(
                jax.lax.rem(jnp.int32(j0 + TJ), jnp.int32(jtot)), 8)
            cps = [pltpu.make_async_copy(
                       se_ref.at[pl.ds(top, H)],
                       ering.at[0, pl.ds(0, H)], esem.at[0]),
                   pltpu.make_async_copy(
                       se_ref.at[pl.ds(j0, TJ)],
                       ering.at[0, pl.ds(H, TJ)], esem.at[1]),
                   pltpu.make_async_copy(
                       se_ref.at[pl.ds(bot, H)],
                       ering.at[0, pl.ds(H + TJ, H)], esem.at[2])]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
        else:
            ering[0] = _evisc_math(
                tPr, dxi, dyi, has_thermo, _CCRow(cce_ref, jnp.int32(0)),
                win(0, -1), win(0, 0), win(0, 1),
                win(1, -1), win(1, 0), win(1, 1),
                win(2, 0), win(2, 1), win(3, -1), win(3, 1))

    # ---- compute e(k+1) while it exists (the ring holds planes to k+2)
    @pl.when(k + 1 <= kt - 1)
    def _compute_e():
        ev = _evisc_math(
            tPr, dxi, dyi, has_thermo,
            _CCRow(cce_ref, jnp.minimum(jnp.int32(k + 1), jnp.int32(kt - 1))),
            win(0, 0), win(0, 1), win(0, 2),
            win(1, 0), win(1, 1), win(1, 2),
            win(2, 1), win(2, 2), win(3, 0), win(3, 2))
        ering[eslot(k + 1)] = ev

    u_dn, u, u_up = win(0, -1), win(0, 0), win(0, 1)
    v_dn, v, v_up = win(1, -1), win(1, 0), win(1, 1)
    w_dn, w, w_up = win(2, -1), win(2, 0), win(2, 1)
    th_dn, th, th_up = win(3, -1), win(3, 0), win(3, 1)
    e_dn, e, e_up = ering[eslot(k - 1)], ering[eslot(k)], ering[eslot(k + 1)]
    tv_win = win(4, 0) if (want_rhs and not first) else None
    cc_k = _CCRow(cc_ref, jnp.minimum(k, kt - 1))
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_k,
                      u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up)
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_k,
                        u_dn, u, v_dn, v, w_dn, w, w_up,
                        th_dn, th, th_up, e_dn, e, e_up)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_k, u, v, ut, vt)
    wt, tht = _extra_wth(fold_buffer, cc_k, w, th, wt, tht, has_thermo)
    wt = jnp.where(k == 0, 0., wt)
    cbdt, can = rk_ref[0], rk_ref[1]
    ttu = ut[H:H + TJ] if first else tu[0] + ut[H:H + TJ]
    if want_rhs and not first:
        ttv = tv_win[H:H + TJ] + vt[H:H + TJ]
    else:
        ttv = vt[H:H + TJ] if first else tv_blk[0] + vt[H:H + TJ]
    ttw = wt[H:H + TJ] if first else tw[0] + wt[H:H + TJ]
    ttth = tht[H:H + TJ] if first else tth[0] + tht[H:H + TJ]
    us_b = u[H:H + TJ] + cbdt * ttu
    ws_b = w[H:H + TJ] + cbdt * ttw
    outs[0][0] = us_b
    outs[1][0] = v[H:H + TJ] + cbdt * ttv
    outs[2][0] = ws_b
    outs[3][0] = th[H:H + TJ] + cbdt * ttth
    if carry:
        outs[4][0] = can * ttu
        outs[5][0] = can * ttv
        outs[6][0] = can * ttw
        outs[7][0] = can * ttth
    # e(k) is final at step k — emit it for the wall patches / aux
    outs[-1][0] = e[H:H + TJ]
    if want_rhs:
        dti = rk_ref[2]
        ttv_ext = (vt[H:H + TJ + 1] if first
                   else tv_win[H:H + TJ + 1] + vt[H:H + TJ + 1])
        vsx = v[H:H + TJ + 1] + cbdt * ttv_ext
        rho = _cc(cc_k, C_RHO)
        rhoh = _cc(cc_k, C_RHOH)
        divh = ((_ip(us_b) - us_b) * dxi + (vsx[1:] - vsx[:-1]) * dyi)
        xnew = rho * divh - rhoh * ws_b * _cc(cc_k, C_DZI)
        j0 = pl.multiple_of(jt * TJ, 8)
        wflux = jnp.where(k == kt, 0., rhoh * ws_b * _cc(cc_k, C_DZI_M1))
        outs[-2][0] = dti * (xbuf[pl.ds(j0, TJ)] + wflux)
        xbuf[pl.ds(j0, TJ)] = xnew


def _tiled_bounds(fold, ks, ke, kinds):
    """(base, lo, hi) per window for the ghost-free tiled variant (see
    _field_specs): 'c' clamps to interior cell levels, 'w' to half levels,
    'e' indexes the interior evisc array directly."""
    if not fold:
        return None
    out = []
    for kind in kinds:
        if kind == "c":
            out.append((ks, ks, ke - 1))
        elif kind == "w":
            out.append((ks, ks, ke))
        else:  # 'e': interior (ktot) array
            out.append((0, 0, ke - ks - 1))
    return out


def _evisc_tiled_body(tPr, dxi, dyi, has_thermo, fold, ks, ke, TJ, jtot,
                      cc_ref, u_ref, v_ref, w_ref, th_ref, out_ref,
                      scratch, sems):
    refs = [u_ref, u_ref, u_ref, v_ref, v_ref, v_ref, w_ref, w_ref,
            th_ref, th_ref]
    koffs = [-1, 0, 1, -1, 0, 1, 0, 1, -1, 1]
    bounds = _tiled_bounds(fold, ks, ke,
                           ["c"] * 6 + ["w"] * 2 + ["c"] * 2)
    slot = _fetch_windows(refs, koffs, scratch, sems, ks, TJ, jtot, bounds)
    s = scratch[slot]
    ev = _evisc_math(tPr, dxi, dyi, has_thermo, cc_ref,
                     s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7],
                     s[8], s[9])
    out_ref[0] = ev[HALO_J:HALO_J + TJ]


def _evisc_tiled_ring_body(tPr, dxi, dyi, has_thermo, ks, ke, TJ, jtot,
                           cc_ref, u_ref, v_ref, w_ref, th_ref, out_ref,
                           scratch, sems):
    """k-ring variant of _evisc_tiled_body (fold_ghosts only, grid
    (jt, k)): 4 plane fetches per step instead of 10 windows."""
    bounds = _tiled_bounds(True, ks, ke, ["c", "c", "w", "c"])
    win = _ring_fetch([u_ref, v_ref, w_ref, th_ref], bounds,
                      scratch, sems, TJ, jtot)
    k = pl.program_id(1)
    ev = _evisc_math(tPr, dxi, dyi, has_thermo, _CCRow(cc_ref, k),
                     win(0, -1), win(0, 0), win(0, 1),
                     win(1, -1), win(1, 0), win(1, 1),
                     win(2, 0), win(2, 1), win(3, -1), win(3, 1))
    out_ref[0] = ev[HALO_J:HALO_J + TJ]


def _all_tiled_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras, fold,
                    ks, ke, TJ, jtot, cc_ref,
                    tu, tv, tw, tth,
                    u_ref, v_ref, w_ref, th_ref,
                    e_ref, ut_ref, vt_ref, wt_ref, tht_ref, scratch, sems):
    """Merged u/v/w/th tendency pass: one window fetch per (field, k-offset)
    feeds BOTH the uv and wth math — 15 HBM window reads instead of the
    split passes' 24.  The carried tendencies alias in/out, so the pass
    ACCUMULATES (ghost planes pass through untouched)."""
    refs = ([u_ref] * 3 + [v_ref] * 3 + [w_ref] * 3 + [th_ref] * 3
            + [e_ref] * 3)
    koffs = [-1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1]
    bounds = _tiled_bounds(fold, ks, ke,
                           ["c"] * 6 + ["w"] * 3 + ["c"] * 3 + ["e"] * 3)
    slot = _fetch_windows(refs, koffs, scratch, sems, ks, TJ, jtot, bounds)
    s = scratch[slot]
    u_dn, u, u_up = s[0], s[1], s[2]
    v_dn, v, v_up = s[3], s[4], s[5]
    w_dn, w, w_up = s[6], s[7], s[8]
    th_dn, th, th_up = s[9], s[10], s[11]
    e_dn, e, e_up = s[12], s[13], s[14]
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_ref,
                      u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up)
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_ref,
                        u_dn, u, v_dn, v, w_dn, w, w_up,
                        th_dn, th, th_up, e_dn, e, e_up)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_ref, u, v, ut, vt)
    wt, tht = _extra_wth(fold_buffer, cc_ref, w, th, wt, tht, has_thermo)
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)  # wall half level
    ut_ref[0] = tu[0] + ut[HALO_J:HALO_J + TJ]
    vt_ref[0] = tv[0] + vt[HALO_J:HALO_J + TJ]
    wt_ref[0] = tw[0] + wt[HALO_J:HALO_J + TJ]
    tht_ref[0] = tth[0] + tht[HALO_J:HALO_J + TJ]


def _all_tiled_rk_body(tPr, dxi, dyi, visc, svisc, has_thermo, extras, fold,
                       ks, ke, TJ, jtot, carry, first, want_rhs, cc_ref,
                       rk_ref, *rest):
    """Tiled merged tendency pass with the RK update folded in (see
    _tend_uv_rk_body): writes s* = s + cB*dt*t_total and the scaled
    carried tendency cA_next*t_total in the same HBM sweep.  first=True
    drops the carried-t inputs (identically zero on the first substep).
    want_rhs: the Poisson rhs dti*div(rho s*) (pres_2.cxx:156-196) is
    emitted in the SAME sweep — the separate rhs kernel's re-read of
    u*/v*/w* disappears.  Plane k's horizontal-divergence + lower-w-flux
    part is stashed in a VMEM plane and completed one k step later when
    w*(k+1) exists; an extra flush grid step emits the last plane (its
    dead s*/t writes land in ghost plane 0, never read under
    fold_ghosts).  The carried tv rides a 16th DMA window (its j+1 halo
    row builds v* at the tile edge); it is NOT input/output-aliased —
    the wrap tile's halo row would race tile 0's already-written out
    block."""
    if first:
        tu = tv = tw = tth = tv_win = None
        u_ref, v_ref, w_ref, th_ref, e_ref = rest[:5]
        rest = rest[5:]
    elif want_rhs:
        (tu, tw, tth, u_ref, v_ref, w_ref, th_ref, e_ref, tv_ref) = rest[:9]
        tv = None
        rest = rest[9:]
    else:
        (tu, tv, tw, tth, u_ref, v_ref, w_ref, th_ref, e_ref) = rest[:9]
        tv_win = None
        rest = rest[9:]
    refs = ([u_ref] * 3 + [v_ref] * 3 + [w_ref] * 3 + [th_ref] * 3
            + [e_ref] * 3)
    koffs = [-1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1]
    kinds = ["c"] * 6 + ["w"] * 3 + ["c"] * 3 + ["e"] * 3
    if want_rhs and not first:
        refs.append(tv_ref)
        koffs.append(0)
        kinds.append("c")
    bounds = _tiled_bounds(fold, ks, ke, kinds)
    if want_rhs:
        outs, scratch, sems, xbuf = rest[:-3], rest[-3], rest[-2], rest[-1]
    else:
        outs, scratch, sems = rest[:-2], rest[-2], rest[-1]
    slot = _fetch_windows(refs, koffs, scratch, sems, ks, TJ, jtot, bounds)
    s = scratch[slot]
    kt = ke - ks
    # the flush step (k == kt) recomputes plane kt-1 with clamped windows
    # purely to feed the rhs completion; clamp the constant-table row too
    cc_k = (_CCRow(cc_ref, jnp.minimum(pl.program_id(0), kt - 1))
            if want_rhs else cc_ref)
    u_dn, u, u_up = s[0], s[1], s[2]
    v_dn, v, v_up = s[3], s[4], s[5]
    w_dn, w, w_up = s[6], s[7], s[8]
    th_dn, th, th_up = s[9], s[10], s[11]
    e_dn, e, e_up = s[12], s[13], s[14]
    if want_rhs and not first:
        tv_win = s[15]
    ut, vt = _uv_math(tPr, dxi, dyi, visc, cc_k,
                      u_dn, u, u_up, v_dn, v, v_up, w, w_up, e_dn, e, e_up)
    wt, tht = _wth_math(tPr, dxi, dyi, visc, svisc, has_thermo, cc_k,
                        u_dn, u, v_dn, v, w_dn, w, w_up,
                        th_dn, th, th_up, e_dn, e, e_up)
    fold_buffer, fold_coriolis, fc, utrans, vtrans = extras
    ut, vt = _extra_uv(fold_buffer, fold_coriolis, fc, utrans, vtrans,
                       cc_k, u, v, ut, vt)
    wt, tht = _extra_wth(fold_buffer, cc_k, w, th, wt, tht, has_thermo)
    wt = jnp.where(pl.program_id(0) == 0, 0., wt)
    H = HALO_J
    cbdt, can = rk_ref[0], rk_ref[1]
    ttu = ut[H:H + TJ] if first else tu[0] + ut[H:H + TJ]
    if want_rhs and not first:
        ttv = tv_win[H:H + TJ] + vt[H:H + TJ]
    else:
        ttv = vt[H:H + TJ] if first else tv[0] + vt[H:H + TJ]
    ttw = wt[H:H + TJ] if first else tw[0] + wt[H:H + TJ]
    ttth = tht[H:H + TJ] if first else tth[0] + tht[H:H + TJ]
    us_b = u[H:H + TJ] + cbdt * ttu
    ws_b = w[H:H + TJ] + cbdt * ttw
    outs[0][0] = us_b
    outs[1][0] = v[H:H + TJ] + cbdt * ttv
    outs[2][0] = ws_b
    outs[3][0] = th[H:H + TJ] + cbdt * ttth
    if carry:
        outs[4][0] = can * ttu
        outs[5][0] = can * ttv
        outs[6][0] = can * ttw
        outs[7][0] = can * ttth
    if want_rhs:
        k = pl.program_id(0)
        dti = rk_ref[2]
        # v* on rows H..H+TJ inclusive: the j-difference needs one row
        # past the tile body (vt is valid on the window halo rows)
        ttv_ext = (vt[H:H + TJ + 1] if first
                   else tv_win[H:H + TJ + 1] + vt[H:H + TJ + 1])
        vsx = v[H:H + TJ + 1] + cbdt * ttv_ext
        rho = _cc(cc_k, C_RHO)
        rhoh = _cc(cc_k, C_RHOH)
        divh = ((_ip(us_b) - us_b) * dxi + (vsx[1:] - vsx[:-1]) * dyi)
        xnew = rho * divh - rhoh * ws_b * _cc(cc_k, C_DZI)
        j0 = pl.multiple_of(pl.program_id(1) * TJ, 8)
        # complete plane k-1: + rhoh(k) * w*(k) * dzi(k-1); at the flush
        # step w*(kt) is the top wall (zero), so the term drops out
        wflux = jnp.where(k == kt, 0., rhoh * ws_b * _cc(cc_k, C_DZI_M1))
        outs[-1][0] = dti * (xbuf[pl.ds(j0, TJ)] + wflux)
        xbuf[pl.ds(j0, TJ)] = xnew


class FusedLES2:
    """Builder for the fused 2nd-order LES kernels on ghost-padded fields.

    ``tiled=False``: full-plane blocked variant; ``tiled=True``: j-tiled
    manual-DMA variant with tile height ``tj``."""

    sharded_mesh = None  # set by Model for the shard_map-wrapped variant
    generic = False      # per-field kernels + XLA thermo (any scalar list)
    no_advec = False     # 2i*-scheme mode: advection is an upstream
                         # additive op; kernels carry diffusion+folds only
    advec_pallas = None  # fused 2i* advection producer
                         # (advec_interp_pallas.AdvecInterpPallas)
    n2_scalar = None     # generic-mode in-kernel N2: the scalar whose
                         # vertical gradient gives N2 with C_THREFH as
                         # the reference profile (moist/vapor thl; saves
                         # the XLA get_n2 pass + its HBM intermediate)

    def __init__(self, ctx, smag, thermo, has_thermo, interpret=False,
                 tiled=False, tj=64, buffer=None, force=None,
                 fold_ghosts=False, top_grad_th=0.):
        self.ctx = ctx
        self.interpret = interpret
        self.smag = smag
        self.thermo = thermo
        self.has_thermo = has_thermo
        self.tiled = tiled
        self.tj = tj
        # Ghost-free variant: the kernels read raw (unfilled) fields with
        # CLAMPED k index maps.  A clamped neighbor equals the true ghost
        # wherever the BC is zero-gradient (u/v freeslip top, evisc edge
        # copies); the remaining wall rows are replaced by the XLA patches
        # in fused_tendencies / fused_exec_viscosity, which mirror the
        # clamp semantics.  Skips two full ghost-fill passes per substep.
        self.fold_ghosts = fold_ghosts
        # Fold the Smagorinsky viscosity into the RK kernel sweep (kills
        # the separate evisc pass; see _all_tiled_rk_ev_body).  Engaged
        # only when the caller passes evisc_full=None.
        self.fold_evisc = (tiled and fold_ghosts
                           and os.environ.get("MICROHH_EVFOLD", "1") == "1"
                           and os.environ.get("MICROHH_RKRING", "1") == "1")
        # Folded ops: a Buffer (non-swupdate) and/or a geo-Coriolis Force.
        self.fold_buffer = buffer is not None
        self.fold_coriolis = force is not None
        self.fc = float(getattr(force, "fc", 0.)) if force is not None else 0.
        self.utrans = float(ctx.utrans)
        self.vtrans = float(ctx.vtrans)
        if tiled and ctx.jtot % tj != 0:
            raise ValueError("jtot must be divisible by the tile height")
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot

        cc_e = np.zeros((kt, N_CONST), dtype=np.float64)
        cc_t = np.zeros((kt, N_CONST), dtype=np.float64)
        g_dzi = np.asarray(ctx.dzi)
        g_dzhi = np.asarray(ctx.dzhi)
        rho = np.asarray(ctx.rhoref)
        rhoh = np.asarray(ctx.rhorefh)
        z = np.asarray(ctx.z)
        thref = np.asarray(thermo.thref) if hasattr(thermo, "thref") else None
        threfh = np.asarray(thermo.threfh) if hasattr(thermo, "threfh") else None
        for k in range(kt):
            ka = ks + k
            for cc in (cc_e, cc_t):
                cc[k, C_DZI] = g_dzi[ka]
                cc[k, C_DZHI] = g_dzhi[ka]
                cc[k, C_DZHI1] = g_dzhi[ka + 1]
                cc[k, C_DZI_M1] = g_dzi[ka - 1]
                cc[k, C_RHO] = rho[ka]
                cc[k, C_RHOH] = rhoh[ka]
                cc[k, C_RHOH1] = rhoh[ka + 1]
                cc[k, C_MLEN2] = smag.mlen2[k] if hasattr(smag, "mlen2") else 0.
            cc_e[k, C_Z] = z[ka]
            cc_t[k, C_Z] = rho[ka - 1]  # reused slot: rho[k-1]
            if has_thermo and thref is not None:
                cc_e[k, C_THREFH] = thref[ka]   # evisc N2 uses full-level thref
                cc_t[k, C_THREFH] = threfh[ka]  # buoyancy uses half-level
        if self.fold_buffer:
            cc_t[:, C_FACZ] = np.asarray(buffer.fac_z)[:, 0, 0]
            cc_t[:, C_FACZH] = np.asarray(buffer.fac_zh)[:, 0, 0]
            cc_t[:, C_UREF] = np.asarray(buffer.profs["u"])[:, 0, 0]
            cc_t[:, C_VREF] = np.asarray(buffer.profs["v"])[:, 0, 0]
            if has_thermo:
                cc_t[:, C_SREF] = np.asarray(buffer.profs["th"])[:, 0, 0]
        if self.fold_coriolis:
            cc_t[:, C_UG] = np.asarray(force.ug)[:, 0, 0]
            cc_t[:, C_VG] = np.asarray(force.vg)[:, 0, 0]
        if self.fold_ghosts and has_thermo:
            # scalar top ghost = th[ke-1] + grad_top * dzh[ke]
            cc_e[kt - 1, C_TOPS] = top_grad_th / g_dzhi[ke]
        self.cc_evisc = cc_e
        self.cc_tend = cc_t

    def _extras(self):
        return (self.fold_buffer, self.fold_coriolis, self.fc,
                self.utrans, self.vtrans)

    # -- spec helpers -------------------------------------------------------
    def _spec_at(self, off, ks):
        return pl.BlockSpec((1, self.ctx.jtot, self.ctx.itot),
                            functools.partial(lambda k, o: (k + ks + o, 0, 0), o=off),
                            memory_space=pltpu.VMEM)

    def _spec_clamped(self, off, lo, hi):
        """Plane at k+off with the index clamped to [lo, hi]: at the walls
        this reads the edge plane instead of a ghost, which equals the true
        ghost for zero-gradient BCs (see fold_ghosts)."""
        def imap(k, o=off, lo=lo, hi=hi):
            return (jnp.clip(k + o, lo, hi), 0, 0)
        return pl.BlockSpec((1, self.ctx.jtot, self.ctx.itot), imap,
                            memory_space=pltpu.VMEM)

    def _field_specs(self, offs, ks, ke, kind):
        """Specs for one field's k-offsets: ghost-filled absolute indexing,
        or clamped raw-field indexing under fold_ghosts.  kind: 'c' for
        cell-centered (clamp to [ks, ke-1]), 'w' for half-level (clamp to
        [ks, ke]), 'e' for the interior-only evisc array."""
        if not self.fold_ghosts:
            # ghost-filled arrays (evisc padded to kcells like the fields)
            return [self._spec_at(o, ks) for o in offs]
        kt = self.ctx.ktot
        if kind == "c":
            return [self._spec_clamped(ks + o, ks, ke - 1) for o in offs]
        if kind == "w":
            return [self._spec_clamped(ks + o, ks, ke) for o in offs]
        return [self._spec_clamped(o, 0, kt - 1) for o in offs]  # 'e'

    def _out_spec_full(self):
        return pl.BlockSpec((1, self.ctx.jtot, self.ctx.itot),
                            lambda k: (k, 0, 0), memory_space=pltpu.VMEM)

    def _out_spec_tiled(self):
        TJ = self.tj
        return pl.BlockSpec((1, TJ, self.ctx.itot),
                            lambda k, jt: (k, jt, 0), memory_space=pltpu.VMEM)

    def _tiled_scratch(self, nwin, dtype):
        TJ = self.tj
        return [pltpu.VMEM((2, nwin, TJ + 2 * HALO_J, self.ctx.itot), dtype),
                pltpu.SemaphoreType.DMA((2, nwin, 3))]

    # -- streaming caller ----------------------------------------------------
    def _stream_call(self, math_fn, cc, arrays, nout):
        """k-streaming pallas_call: each field is DMAed once per plane into
        a 3-plane VMEM shift register (see the _stream_body note)."""
        ctx = self.ctx
        ks, kt = ctx.ks, ctx.ktot
        dtype = arrays[0].dtype
        nf = len(arrays)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                               lambda g: (g + ks - 1, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                                lambda g: (jnp.maximum(g - 2, 0), 0, 0),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), dtype)
        body = functools.partial(_stream_body, nf, nout, math_fn)
        out = _pallas_call(
            body, grid=(kt + 2,),
            in_specs=[cc_spec] + [in_spec] * nf,
            out_specs=[out_spec] * nout, out_shape=[shape] * nout,
            scratch_shapes=[pltpu.VMEM((nf, 3, ctx.jtot, ctx.itot), dtype)],
            interpret=self.interpret,
        )(cc, *arrays)
        return out

    @staticmethod
    def _use_stream():
        # Measured SLOWER than the blocked variant at 256^3 on v5e (48.0 vs
        # 46.0 ms/step): the kernels are VPU-compute-bound, so saving HBM
        # fetches while adding ring-shift vector copies loses.  Kept as an
        # opt-in for future grids where the balance flips.
        return os.environ.get("MICROHH_STREAM", "0") == "1"

    # -- public entry points ------------------------------------------------
    def evisc(self, u, v, w, th, stratified=None):
        ctx = self.ctx
        ks, kt = ctx.ks, ctx.ktot
        if stratified is None:
            stratified = self.has_thermo
        cc = jnp.asarray(self.cc_evisc, dtype=u.dtype)
        th_in = th if th is not None else u
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype)
        if not self.tiled and self._use_stream() and not self.fold_ghosts:
            math_fn = functools.partial(_evisc_stream_math, self.smag.tPr,
                                        float(ctx.dxi), float(ctx.dyi),
                                        stratified)
            return self._stream_call(math_fn, cc, (u, v, w, th_in), 1)[0]
        if not self.tiled:
            ke = ctx.ke
            body = functools.partial(_evisc_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     stratified)
            in_specs = ([cc_spec]
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((-1, 0, 1), ks, ke, "w")
                        + self._field_specs((-1, 0, 1), ks, ke, "c"))
            return _pallas_call(
                body, grid=(kt,), in_specs=in_specs,
                out_specs=self._out_spec_full(), out_shape=shape,
                interpret=self.interpret,
            )(cc, u, u, u, v, v, v, w, w, w, th_in, th_in, th_in)

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        if (self.fold_ghosts
                and os.environ.get("MICROHH_RKRING", "1") == "1"):
            body = functools.partial(_evisc_tiled_ring_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     self.has_thermo,
                                     ks, ctx.ke, self.tj, ctx.jtot)
            TJ = self.tj
            out_spec = pl.BlockSpec((1, TJ, ctx.itot),
                                    lambda jt, k: (k, jt, 0),
                                    memory_space=pltpu.VMEM)
            return _pallas_call(
                body, grid=(ctx.jtot // self.tj, kt),
                in_specs=[cc_spec] + [any_spec] * 4,
                out_specs=out_spec, out_shape=shape,
                scratch_shapes=[
                    pltpu.VMEM((4, 4, TJ + 2 * HALO_J, ctx.itot), u.dtype),
                    pltpu.SemaphoreType.DMA((4, 4, 3))],
                interpret=self.interpret,
            )(cc, u, v, w, th_in)
        body = functools.partial(_evisc_tiled_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 self.has_thermo, self.fold_ghosts,
                                 ks, ctx.ke, self.tj, ctx.jtot)
        return _pallas_call(
            body, grid=(kt, ctx.jtot // self.tj),
            in_specs=[cc_spec] + [any_spec] * 4,
            out_specs=self._out_spec_tiled(), out_shape=shape,
            scratch_shapes=self._tiled_scratch(10, u.dtype),
            interpret=self.interpret,
        )(cc, u, v, w, th_in)

    # -- generic entry points (any thermo / any scalar list) ----------------
    def evisc_n2(self, u, v, w, n2_int):
        """Evisc with an externally-computed interior N2 field (kt, j, i)."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = jnp.asarray(self.cc_evisc, dtype=u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype)
        body = functools.partial(_evisc_n2_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi))
        n2_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = ([cc_spec]
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((0, 1), ks, ke, "w")
                    + [n2_spec])
        return _pallas_call(
            body, grid=(kt,), in_specs=in_specs,
            out_specs=self._out_spec_full(), out_shape=shape,
            interpret=self.interpret,
        )(cc, u, u, u, v, v, v, w, w, n2_int)

    def limits_pass(self, u, v, w, th):
        """Per-k plane maxima of (cfl rate, evisc) for the adaptive-dt
        limits: one HBM read of the four fields, no field-sized writes
        (see _limits_body).  The caller applies the per-k positive
        scalings (dt limits' dzi factors) and the surface-row override
        outside — max commutes with both."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = jnp.asarray(self.cc_evisc, dtype=u.dtype)
        th_in = th if th is not None else u
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        body = functools.partial(_limits_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 self.has_thermo)
        in_specs = ([cc_spec]
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((0, 1), ks, ke, "w")
                    + self._field_specs((-1, 1), ks, ke, "c"))
        out_spec = pl.BlockSpec((1, kt), lambda k: (0, 0),
                                memory_space=pltpu.SMEM)
        shape = jax.ShapeDtypeStruct((1, kt), u.dtype)
        cflk, evk = _pallas_call(
            body, grid=(kt,), in_specs=in_specs,
            out_specs=[out_spec, out_spec], out_shape=[shape, shape],
            interpret=self.interpret,
        )(cc, u, u, u, v, v, v, w, w, th_in, th_in)
        return cflk[0], evk[0]

    def _t_spec_shape(self, dtype):
        ctx = self.ctx
        ks = ctx.ks
        spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                            lambda k: (k + ks, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((ctx.kcells, ctx.jtot, ctx.itot), dtype)
        return spec, shape

    def tend_uv(self, u, v, w, evisc_full, tu, tv, cc_in=None,
                fold_add=False):
        """uv pass alone (generic mode), accumulated onto the aliased
        carried tendencies; returns FULL (kcells) arrays."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        body_uv = functools.partial(_tend_uv_body, self.smag.tPr,
                                    float(ctx.dxi), float(ctx.dyi),
                                    self.smag.visc, self._extras(),
                                    fold_add=fold_add,
                                    advec=not self.no_advec)
        specs_uv = ([cc_spec] + [t_spec] * 2
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((-1, 0, 1), ks, ke, "c")
                    + self._field_specs((0, 1), ks, ke, "w")
                    + self._field_specs((-1, 0, 1), ks, ke, "e"))
        return _pallas_call(
            body_uv, grid=(kt,), in_specs=specs_uv,
            out_specs=[t_spec] * 2, out_shape=[t_shape] * 2,
            input_output_aliases={1: 0, 2: 1},
            interpret=self.interpret,
        )(cc, tu, tv, u, u, u, v, v, v, w, w,
          evisc_full, evisc_full, evisc_full)

    def tend_w(self, u, v, w, evisc_full, tw, cc_in=None):
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        body = functools.partial(_w_body, float(ctx.dxi), float(ctx.dyi),
                                 self.smag.visc, advec=not self.no_advec)
        specs = ([cc_spec] + [t_spec]
                 + self._field_specs((-1, 0), ks, ke, "c")
                 + self._field_specs((-1, 0), ks, ke, "c")
                 + self._field_specs((-1, 0, 1), ks, ke, "w")
                 + self._field_specs((-1, 0), ks, ke, "e"))
        return _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=t_spec, out_shape=t_shape,
            input_output_aliases={1: 0},
            interpret=self.interpret,
        )(cc, tw, u, u, v, v, w, w, w, evisc_full, evisc_full)

    def tend_scalar(self, a, u, v, w, evisc_full, svisc, ta, cc_in=None,
                    fold_add=False):
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        body = functools.partial(_scalar_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 float(svisc), fold_add,
                                 advec=not self.no_advec)
        specs = ([cc_spec] + [t_spec]
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0, 1), ks, ke, "w")
                 + self._field_specs((-1, 0, 1), ks, ke, "c")
                 + self._field_specs((-1, 0, 1), ks, ke, "e"))
        return _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=t_spec, out_shape=t_shape,
            input_output_aliases={1: 0},
            interpret=self.interpret,
        )(cc, ta, u, v, w, w, a, a, a, evisc_full, evisc_full, evisc_full)

    def _rk_smem(self, cbdt, can, dtype):
        return jnp.stack([jnp.asarray(cbdt, dtype), jnp.asarray(can, dtype)])

    def tend_uv_rk(self, u, v, w, evisc_full, tu, tv, cbdt, can, carry=True,
                   cc_in=None, fold_add=False):
        """Generic-path uv pass with the RK update folded in: returns
        (us, vs[, ut, vt]).  The carried t always enters (upstream ops —
        thermo, microphysics, force — have already written into it), so
        there is no 'first' variant on the generic path."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        rk = self._rk_smem(cbdt, can, u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        nout = 4 if carry else 2
        body = functools.partial(_tend_uv_rk_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 self.smag.visc, self._extras(),
                                 carry, False, fold_add=fold_add,
                                 advec=not self.no_advec)
        specs = ([cc_spec, cc_spec] + [t_spec] * 2
                 + self._field_specs((-1, 0, 1), ks, ke, "c")
                 + self._field_specs((-1, 0, 1), ks, ke, "c")
                 + self._field_specs((0, 1), ks, ke, "w")
                 + self._field_specs((-1, 0, 1), ks, ke, "e"))
        return _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
            input_output_aliases=({2: 2, 3: 3} if carry else {}),
            interpret=self.interpret,
        )(cc, rk, tu, tv, u, u, u, v, v, v, w, w,
          evisc_full, evisc_full, evisc_full)

    def tend_w_rk(self, u, v, w, evisc_full, tw, cbdt, can, carry=True,
                  cc_in=None):
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        rk = self._rk_smem(cbdt, can, u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        nout = 2 if carry else 1
        body = functools.partial(_w_rk_body, float(ctx.dxi), float(ctx.dyi),
                                 self.smag.visc, carry,
                                 advec=not self.no_advec)
        specs = ([cc_spec, cc_spec] + [t_spec]
                 + self._field_specs((-1, 0), ks, ke, "c")
                 + self._field_specs((-1, 0), ks, ke, "c")
                 + self._field_specs((-1, 0, 1), ks, ke, "w")
                 + self._field_specs((-1, 0), ks, ke, "e"))
        return _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
            input_output_aliases=({2: 1} if carry else {}),
            interpret=self.interpret,
        )(cc, rk, tw, u, u, v, v, w, w, w, evisc_full, evisc_full)

    def tend_scalar_rk(self, a, u, v, w, evisc_full, svisc, ta, cbdt, can,
                       carry=True, cc_in=None, fold_add=False):
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        cc = cc_in if cc_in is not None else jnp.asarray(
            self.cc_tend, dtype=u.dtype)
        rk = self._rk_smem(cbdt, can, u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        nout = 2 if carry else 1
        body = functools.partial(_scalar_rk_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 float(svisc), carry, fold_add,
                                 advec=not self.no_advec)
        specs = ([cc_spec, cc_spec] + [t_spec]
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0, 1), ks, ke, "w")
                 + self._field_specs((-1, 0, 1), ks, ke, "c")
                 + self._field_specs((-1, 0, 1), ks, ke, "e"))
        return _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
            input_output_aliases=({2: 1} if carry else {}),
            interpret=self.interpret,
        )(cc, rk, ta, u, v, w, w, a, a, a,
          evisc_full, evisc_full, evisc_full)

    def tend_scalars_rk(self, names, s, u, v, w, evisc_full, sviscs, t,
                        cbdt, can, carry=True, cc_in=None, fold_add=False):
        """Merged multi-scalar RK pass (see _scalars_rk_body): returns
        ({name: a*}, {name: carry}).  cc_in: {name: (kt, N_CONST) table}
        when the column fold is on."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        S = len(names)
        base = jnp.asarray(self.cc_tend, dtype=u.dtype)
        ccs = [cc_in[n] if cc_in is not None else base for n in names]
        rk = self._rk_smem(cbdt, can, u.dtype)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec, t_shape = self._t_spec_shape(u.dtype)
        nout = 2 * S if carry else S
        body = functools.partial(_scalars_rk_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 tuple(float(v_) for v_ in sviscs),
                                 carry, fold_add, not self.no_advec)
        specs = ([cc_spec] * S + [cc_spec] + [t_spec] * S
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0,), ks, ke, "c")
                 + self._field_specs((0, 1), ks, ke, "w"))
        for _ in range(S):
            specs += self._field_specs((-1, 0, 1), ks, ke, "c")
        specs += self._field_specs((-1, 0, 1), ks, ke, "e")
        # aliases: ta_i (operand S+1+i) -> carry output S+i
        aliases = ({S + 1 + i: S + i for i in range(S)} if carry else {})
        ops_ = (ccs + [rk] + [t[n] for n in names] + [u, v, w, w])
        for n in names:
            ops_ += [s[n], s[n], s[n]]
        ops_ += [evisc_full, evisc_full, evisc_full]
        outs = _pallas_call(
            body, grid=(kt,), in_specs=specs,
            out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
            input_output_aliases=aliases,
            interpret=self.interpret,
        )(*ops_)
        s_star = {n: outs[i] for i, n in enumerate(names)}
        t_c = {n: outs[S + i] for i, n in enumerate(names)} if carry else {}
        return s_star, t_c

    def tendencies(self, u, v, w, th, evisc_full, t_in=None):
        """Tendencies.  t_in: carried-tendency dict for the aliased
        accumulate-in-kernel variant (full-plane path); when given, the
        returned arrays are FULL (kcells) accumulated tendencies.  Without
        it, interior (ktot) tendency increments are returned."""
        ctx = self.ctx
        ks, kt = ctx.ks, ctx.ktot
        svisc = self.smag.viscs.get("th", self.smag.visc) if self.has_thermo else self.smag.visc
        cc = jnp.asarray(self.cc_tend, dtype=u.dtype)
        th_in = th if th is not None else u
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype)

        if (not self.tiled and self._use_stream()
                and not self.fold_ghosts):
            # Two streaming passes (uv, wth) — a single merged pass would
            # need ~18MB of scoped VMEM at 256^2 planes (measured OOM at
            # the 16MB limit).  Folded buffer/Coriolis ride along.
            uv_fn = functools.partial(_uv_stream_math, self.smag.tPr,
                                      float(ctx.dxi), float(ctx.dyi),
                                      self.smag.visc, self._extras())
            ut, vt = self._stream_call(uv_fn, cc, (u, v, w, evisc_full), 2)
            wth_fn = functools.partial(_wth_stream_math, self.smag.tPr,
                                       float(ctx.dxi), float(ctx.dyi),
                                       self.smag.visc, svisc,
                                       self.has_thermo, self._extras())
            wt, tht = self._stream_call(wth_fn, cc,
                                        (u, v, w, th_in, evisc_full), 2)
            return ut, vt, wt, tht

        if not self.tiled and t_in is None:
            # interior-increment variant (sharded path; tests): distinct
            # zero buffers per field so the in/out aliasing stays 1:1
            # (XLA may not dedupe donated aliased operands).
            iota = jnp.arange(4, dtype=u.dtype) * 0.
            tzs = [jnp.full((ctx.kcells, ctx.jtot, ctx.itot), iota[i])
                   for i in range(4)]
            out = self.tendencies(u, v, w, th, evisc_full,
                                  t_in={"u": tzs[0], "v": tzs[1],
                                        "w": tzs[2], "th": tzs[3]})
            ke = ctx.ke
            return tuple(o[ks:ke] for o in out)

        if not self.tiled:
            # Two passes (uv, wth) — a single merged pass would need ~18MB
            # of scoped VMEM at 256^2 planes (measured OOM at the 16MB
            # limit); the split fits.  Folded buffer/Coriolis ride along,
            # and the carried tendencies are ALIASED in/out so the kernels
            # accumulate directly (no separate pad+add HBM pass; ghost
            # rows pass through untouched in the aliased buffers).
            ke = ctx.ke
            t_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                                  lambda k: (k + ks, 0, 0),
                                  memory_space=pltpu.VMEM)
            t_shape = jax.ShapeDtypeStruct((ctx.kcells, ctx.jtot, ctx.itot),
                                           u.dtype)
            body_uv = functools.partial(_tend_uv_body, self.smag.tPr,
                                        float(ctx.dxi), float(ctx.dyi),
                                        self.smag.visc, self._extras())
            specs_uv = ([cc_spec] + [t_spec] * 2
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((0, 1), ks, ke, "w")
                        + self._field_specs((-1, 0, 1), ks, ke, "e"))
            ut, vt = _pallas_call(
                body_uv, grid=(kt,), in_specs=specs_uv,
                out_specs=[t_spec] * 2, out_shape=[t_shape] * 2,
                input_output_aliases={1: 0, 2: 1},
                interpret=self.interpret,
            )(cc, t_in["u"], t_in["v"], u, u, u, v, v, v, w, w,
              evisc_full, evisc_full, evisc_full)

            body_wth = functools.partial(_tend_wth_body, self.smag.tPr,
                                         float(ctx.dxi), float(ctx.dyi),
                                         self.smag.visc, svisc,
                                         self.has_thermo, self._extras())
            specs_wth = ([cc_spec] + [t_spec] * 2
                         + self._field_specs((-1, 0), ks, ke, "c")
                         + self._field_specs((-1, 0), ks, ke, "c")
                         + self._field_specs((-1, 0, 1), ks, ke, "w")
                         + self._field_specs((-1, 0, 1), ks, ke, "c")
                         + self._field_specs((-1, 0, 1), ks, ke, "e"))
            tth_in = (t_in["th"] if self.has_thermo
                      else jnp.zeros_like(t_in["w"]))
            wt, tht = _pallas_call(
                body_wth, grid=(kt,), in_specs=specs_wth,
                out_specs=[t_spec] * 2, out_shape=[t_shape] * 2,
                input_output_aliases={1: 0, 2: 1},
                interpret=self.interpret,
            )(cc, t_in["w"], tth_in, u, u, v, v, w, w, w, th_in, th_in,
              th_in, evisc_full, evisc_full, evisc_full)
            return ut, vt, wt, tht

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        grid = (kt, ctx.jtot // self.tj)
        TJ = self.tj
        t_spec = pl.BlockSpec((1, TJ, ctx.itot),
                              lambda k, jt: (k + ks, jt, 0),
                              memory_space=pltpu.VMEM)
        t_shape = jax.ShapeDtypeStruct((ctx.kcells, ctx.jtot, ctx.itot),
                                       u.dtype)
        if t_in is None:
            # distinct zero buffers per field so the in/out aliasing stays
            # 1:1 (identical constants could be CSE'd into one buffer)
            iota = jnp.arange(4, dtype=u.dtype) * 0.
            tz = [jnp.full((ctx.kcells, ctx.jtot, ctx.itot), iota[i])
                  for i in range(4)]
            t_in = {"u": tz[0], "v": tz[1], "w": tz[2], "th": tz[3]}
            trim = True
        else:
            trim = False
        tth_in = (t_in["th"] if self.has_thermo
                  else jnp.zeros_like(t_in["w"]))
        body = functools.partial(_all_tiled_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi),
                                 self.smag.visc, svisc, self.has_thermo,
                                 self._extras(), self.fold_ghosts,
                                 ks, ctx.ke, self.tj, ctx.jtot)
        ut, vt, wt, tht = _pallas_call(
            body, grid=grid,
            in_specs=[cc_spec] + [t_spec] * 4 + [any_spec] * 5,
            out_specs=[t_spec] * 4, out_shape=[t_shape] * 4,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            scratch_shapes=self._tiled_scratch(15, u.dtype),
            interpret=self.interpret,
        )(cc, t_in["u"], t_in["v"], t_in["w"], tth_in,
          u, v, w, th_in, evisc_full)
        if trim:
            ke = ctx.ke
            return ut[ks:ke], vt[ks:ke], wt[ks:ke], tht[ks:ke]
        return ut, vt, wt, tht

    def tendencies_rk(self, u, v, w, th, evisc_full, t_in, cbdt, can,
                      carry=True, first=False, rhs_dti=None, se_row=None):
        """Tendencies with the low-storage RK update folded in: returns
        (us, vs, ws, ths, ut, vt, wt, tht, rhs) where s* = s + cbdt*t_total
        (pre-projection state) and t_out = can*t_total (scaled carry,
        aliased on t_in; None when carry=False — the last substep's
        cA_next is 0, so the dead writes are skipped).  first=True (first
        substep: cA[0] == 0, the carried t is identically zero) drops the
        t INPUTS entirely — the caller's zero buffers are never
        materialized or read, and the t outputs are fresh allocations.
        rhs_dti != None (tiled + fold_ghosts only): the Poisson rhs
        rhs_dti*div(rho s*) is emitted in the same sweep (see
        _all_tiled_rk_body); rhs is None otherwise.  Ghost planes of the
        s* outputs are NOT written (the substep refills/clamps them) —
        EXCEPT ghost plane 0, which the rhs flush step overwrites with
        dead values; w* at the top wall ke is set to zero by the
        caller."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        want_rhs = rhs_dti is not None
        if want_rhs and not (self.tiled and self.fold_ghosts):
            raise ValueError("rhs fold needs the tiled fold_ghosts variant")
        svisc = (self.smag.viscs.get("th", self.smag.visc)
                 if self.has_thermo else self.smag.visc)
        cc = jnp.asarray(self.cc_tend, dtype=u.dtype)
        rkvals = [jnp.asarray(cbdt, u.dtype), jnp.asarray(can, u.dtype)]
        if want_rhs:
            rkvals.append(jnp.asarray(rhs_dti, u.dtype))
        rk = jnp.stack(rkvals)
        th_in = th if th is not None else u
        tth_in = (None if first else
                  (t_in["th"] if self.has_thermo
                   else jnp.zeros_like(t_in["w"])))
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        rk_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        t_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                              lambda k: (k + ks, 0, 0),
                              memory_space=pltpu.VMEM)
        t_shape = jax.ShapeDtypeStruct((ctx.kcells, ctx.jtot, ctx.itot),
                                       u.dtype)
        nout = 4 if carry else 2
        nout_t = 8 if carry else 4
        nt_in = 0 if first else 2

        if not self.tiled:
            body_uv = functools.partial(_tend_uv_rk_body, self.smag.tPr,
                                        float(ctx.dxi), float(ctx.dyi),
                                        self.smag.visc, self._extras(),
                                        carry, first)
            specs_uv = ([cc_spec, rk_spec] + [t_spec] * nt_in
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((-1, 0, 1), ks, ke, "c")
                        + self._field_specs((0, 1), ks, ke, "w")
                        + self._field_specs((-1, 0, 1), ks, ke, "e"))
            t_args_uv = () if first else (t_in["u"], t_in["v"])
            out_uv = _pallas_call(
                body_uv, grid=(kt,), in_specs=specs_uv,
                out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
                input_output_aliases=({2: 2, 3: 3} if carry and not first
                                      else {}),
                interpret=self.interpret,
            )(cc, rk, *t_args_uv, u, u, u, v, v, v, w, w,
              evisc_full, evisc_full, evisc_full)

            body_wth = functools.partial(_tend_wth_rk_body, self.smag.tPr,
                                         float(ctx.dxi), float(ctx.dyi),
                                         self.smag.visc, svisc,
                                         self.has_thermo, self._extras(),
                                         carry, first)
            specs_wth = ([cc_spec, rk_spec] + [t_spec] * nt_in
                         + self._field_specs((-1, 0), ks, ke, "c")
                         + self._field_specs((-1, 0), ks, ke, "c")
                         + self._field_specs((-1, 0, 1), ks, ke, "w")
                         + self._field_specs((-1, 0, 1), ks, ke, "c")
                         + self._field_specs((-1, 0, 1), ks, ke, "e"))
            t_args_wth = () if first else (t_in["w"], tth_in)
            out_wth = _pallas_call(
                body_wth, grid=(kt,), in_specs=specs_wth,
                out_specs=[t_spec] * nout, out_shape=[t_shape] * nout,
                input_output_aliases=({2: 2, 3: 3} if carry and not first
                                      else {}),
                interpret=self.interpret,
            )(cc, rk, *t_args_wth, u, u, v, v, w, w, w, th_in, th_in,
              th_in, evisc_full, evisc_full, evisc_full)
            us, vs = out_uv[0], out_uv[1]
            ws, ths = out_wth[0], out_wth[1]
            if carry:
                return (us, vs, ws, ths,
                        out_uv[2], out_uv[3], out_wth[2], out_wth[3], None)
            return us, vs, ws, ths, None, None, None, None, None

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        TJ = self.tj
        # k-ring variant (fold_ghosts only): grid (jt, k) with k fastest,
        # one plane fetch per field per step instead of three
        use_ring = (self.fold_ghosts
                    and os.environ.get("MICROHH_RKRING", "1") == "1")
        if use_ring:
            grid = (ctx.jtot // self.tj, kt + (1 if want_rhs else 0))
        else:
            grid = (kt + (1 if want_rhs else 0), ctx.jtot // self.tj)
        if want_rhs:
            # flush step k == kt: blocked t inputs clamp to the last
            # interior plane; all dead outputs land in ghost plane 0
            if use_ring:
                t_spec_t = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda jt, k: (jnp.minimum(k, kt - 1) + ks, jt, 0),
                    memory_space=pltpu.VMEM)
                out_spec_t = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda jt, k: (jnp.where(k == kt, 0, k + ks), jt, 0),
                    memory_space=pltpu.VMEM)
                rhs_spec = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda jt, k: (jnp.maximum(k - 1, 0), jt, 0),
                    memory_space=pltpu.VMEM)
            else:
                t_spec_t = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda k, jt: (jnp.minimum(k, kt - 1) + ks, jt, 0),
                    memory_space=pltpu.VMEM)
                out_spec_t = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda k, jt: (jnp.where(k == kt, 0, k + ks), jt, 0),
                    memory_space=pltpu.VMEM)
                rhs_spec = pl.BlockSpec(
                    (1, TJ, ctx.itot),
                    lambda k, jt: (jnp.maximum(k - 1, 0), jt, 0),
                    memory_space=pltpu.VMEM)
            rhs_shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot),
                                             u.dtype)
        else:
            if use_ring:
                t_spec_t = pl.BlockSpec((1, TJ, ctx.itot),
                                        lambda jt, k: (k + ks, jt, 0),
                                        memory_space=pltpu.VMEM)
            else:
                t_spec_t = pl.BlockSpec((1, TJ, ctx.itot),
                                        lambda k, jt: (k + ks, jt, 0),
                                        memory_space=pltpu.VMEM)
            out_spec_t = t_spec_t
        if use_ring:
            body = functools.partial(_all_tiled_rk_ring_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     self.smag.visc, svisc, self.has_thermo,
                                     self._extras(),
                                     ks, ke, self.tj, ctx.jtot, carry, first,
                                     want_rhs)
        else:
            body = functools.partial(_all_tiled_rk_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     self.smag.visc, svisc, self.has_thermo,
                                     self._extras(), self.fold_ghosts,
                                     ks, ke, self.tj, ctx.jtot, carry, first,
                                     want_rhs)
        if first:
            t_args, nt_blocked, any_extra = (), 0, ()
        elif want_rhs:
            # tv rides a DMA window (see the body note); NOT aliased —
            # the wrap tile's halo fetch would race tile 0's out write
            t_args = (t_in["u"], t_in["w"], tth_in)
            nt_blocked, any_extra = 3, (t_in["v"],)
        else:
            t_args = (t_in["u"], t_in["v"], t_in["w"], tth_in)
            nt_blocked, any_extra = 4, ()
        fold_ev = (use_ring and evisc_full is None
                   and getattr(self, "fold_evisc", False))
        if fold_ev:
            # evisc folded into the sweep (see _all_tiled_rk_ev_body)
            cce = jnp.asarray(self.cc_evisc, dtype=u.dtype)
            surface = bool(self.smag.surface) and se_row is not None
            body = functools.partial(_all_tiled_rk_ev_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     self.smag.visc, svisc, self.has_thermo,
                                     self._extras(), ks, ke, self.tj,
                                     ctx.jtot, carry, first, want_rhs,
                                     surface)
            nf_ring = 5 if (want_rhs and not first) else 4
            scratch = [pltpu.VMEM((5, nf_ring, TJ + 2 * HALO_J, ctx.itot),
                                  u.dtype),
                       pltpu.SemaphoreType.DMA((5, nf_ring, 3)),
                       pltpu.VMEM((4, TJ + 2 * HALO_J, ctx.itot), u.dtype),
                       pltpu.SemaphoreType.DMA((3,))]
            if want_rhs:
                scratch.append(pltpu.VMEM((ctx.jtot, ctx.itot), u.dtype))
            e_spec = pl.BlockSpec(
                (1, TJ, ctx.itot),
                lambda jt, k: (jnp.minimum(k, kt - 1), jt, 0),
                memory_space=pltpu.VMEM)
            e_shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype)
            if carry and not first:
                aliases = ({3: 4, 4: 6, 5: 7} if want_rhs
                           else {3: 4, 4: 5, 5: 6, 6: 7})
            else:
                aliases = {}
            se_args = (se_row,) if surface else ()
            n_any = 4 + len(any_extra) + len(se_args)
            out = _pallas_call(
                body, grid=grid,
                in_specs=([cc_spec, cc_spec, rk_spec]
                          + [t_spec_t] * nt_blocked + [any_spec] * n_any),
                out_specs=([out_spec_t] * nout_t
                           + ([rhs_spec] if want_rhs else []) + [e_spec]),
                out_shape=([t_shape] * nout_t
                           + ([rhs_shape] if want_rhs else []) + [e_shape]),
                input_output_aliases=aliases,
                scratch_shapes=scratch,
                interpret=self.interpret,
            )(cc, cce, rk, *t_args, u, v, w, th_in, *any_extra, *se_args)
            e_int = out[-1]
            rhs = out[-2] if want_rhs else None
            out = out[:-2] if want_rhs else out[:-1]
            if carry:
                return tuple(out) + (rhs, e_int)
            return tuple(out) + (None, None, None, None, rhs, e_int)
        if carry and not first:
            if want_rhs:
                aliases = {2: 4, 3: 6, 4: 7}
            else:
                aliases = {2: 4, 3: 5, 4: 6, 5: 7}
        else:
            aliases = {}
        if use_ring:
            nf_ring = 6 if (want_rhs and not first) else 5
            scratch = [pltpu.VMEM((4, nf_ring, TJ + 2 * HALO_J, ctx.itot),
                                  u.dtype),
                       pltpu.SemaphoreType.DMA((4, nf_ring, 3))]
        else:
            nwin = 16 if (want_rhs and not first) else 15
            scratch = self._tiled_scratch(nwin, u.dtype)
        if want_rhs:
            scratch = scratch + [pltpu.VMEM((ctx.jtot, ctx.itot), u.dtype)]
        out = _pallas_call(
            body, grid=grid,
            in_specs=([cc_spec, rk_spec] + [t_spec_t] * nt_blocked
                      + [any_spec] * (5 + len(any_extra))),
            out_specs=([out_spec_t] * nout_t
                       + ([rhs_spec] if want_rhs else [])),
            out_shape=([t_shape] * nout_t
                       + ([rhs_shape] if want_rhs else [])),
            input_output_aliases=aliases,
            scratch_shapes=scratch,
            interpret=self.interpret,
        )(cc, rk, *t_args, u, v, w, th_in, evisc_full, *any_extra)
        rhs = out[-1] if want_rhs else None
        if want_rhs:
            out = out[:-1]
        if carry:
            return tuple(out) + (rhs,)
        return tuple(out) + (None, None, None, None, rhs)


# ==========================================================================
#  integration with the model step (XLA wall-row patches)
# ==========================================================================

def _pad_k(ctx, interior):
    """(ktot, j, i) interior -> (kcells, j, i) with zero ghosts."""
    return jnp.pad(interior, ((ctx.ks, ctx.kcells - ctx.ke), (0, 0), (0, 0)))


def _surface_evisc_row(smag, ctx, s, sfc, stratified):
    """MO surface-layer evisc bottom row (diff_smag2.cxx calc_strain2
    surface rows + calc_evisc bottom): 2-D work in XLA, replacing the
    kernel's interior-formula row 0."""
    from .stencil import im, ip, jm, jp
    u, v, w = s["u"], s["v"], s["w"]
    ks = ctx.ks
    dxi, dyi = ctx.dxi, ctx.dyi
    u0, v0 = u[ks], v[ks]
    dudx = (ip(u0) - u0) * dxi
    dvdy = (jp(v0) - v0) * dyi
    dwdz = (w[ks + 1] - w[ks]) * ctx.dzi[ks]
    c = (u0 - jm(u0)) * dyi + (v0 - im(v0)) * dxi
    horiz = 0.125 * (c ** 2 + ip(c) ** 2 + jp(c) ** 2 + ip(jp(c)) ** 2)
    wsl = w[ks:ks + 2]
    dwdx = (wsl - im(wsl)) * dxi
    dwdy = (wsl - jm(wsl)) * dyi
    s2b = 2. * (dudx ** 2 + dvdy ** 2 + dwdz ** 2 + horiz
                + 0.5 * sfc["dudz_mo"] ** 2
                + 0.125 * (dwdx[0] ** 2 + ip(dwdx)[0] ** 2 + dwdx[1] ** 2 + ip(dwdx)[1] ** 2)
                + 0.5 * sfc["dvdz_mo"] ** 2
                + 0.125 * (dwdy[0] ** 2 + jp(dwdy)[0] ** 2 + dwdy[1] ** 2 + jp(dwdy)[1] ** 2)
                ) + cst.dsmall
    if stratified:
        rit = jnp.minimum(sfc["dbdz_mo"] / s2b / smag.tPr, 1. - cst.dsmall)
        return smag.mlen2[0] * jnp.sqrt(s2b) * jnp.sqrt(1. - rit)
    return smag.mlen2[0] * jnp.sqrt(s2b)


def fused_exec_viscosity(fused, ctx, s, sfc, aux):
    """evisc via the Pallas kernel + surface bottom-row patch
    (diff_smag2.cxx calc_strain2 surface rows + calc_evisc bottom)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    th = s.get("th")
    ks = ctx.ks
    if fused.sharded_mesh is not None:
        from ..parallel.halo import sharded_planes_call
        th_in = th if th is not None else u
        ev = sharded_planes_call(
            fused.sharded_mesh,
            lambda uu, vv, ww, tt: fused.evisc(uu, vv, ww, tt),
            1, u, v, w, th_in)[0]
    else:
        ev = fused.evisc(u, v, w, th)

    if smag.surface:
        ev = ev.at[0].set(_surface_evisc_row(smag, ctx, s, sfc,
                                             fused.has_thermo))

    aux = dict(aux)
    if fused.fold_ghosts:
        # Kernels index the interior array with clamped maps (ghost ==
        # edge copy for evisc), so no padded copy is materialized.
        aux["evisc_int"] = ev
    else:
        evisc = jnp.zeros_like(u)
        evisc = evisc.at[ctx.ks:ctx.ke].set(ev)
        evisc = evisc.at[ctx.ks - 1].set(ev[0])
        evisc = evisc.at[ctx.ke].set(ev[-1])
        aux["evisc"] = evisc
    return aux


def fused_tendencies(fused, ctx, s, t, aux, sfc):
    """advec_2 + diff_smag2 + buoyancy in one Pallas pass, then patch the
    surface-model wall rows of the DIFFUSION part in XLA (the advection and
    buoyancy rows need no special casing)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    th = s.get("th")
    fold = fused.fold_ghosts
    evisc = aux["evisc_int"] if fold else aux["evisc"]
    ks, ke = ctx.ks, ctx.ke
    dxi, dyi = ctx.dxi, ctx.dyi
    visc = smag.visc

    accumulated = False
    if fused.sharded_mesh is not None:
        from ..parallel.halo import sharded_planes_call
        th_in = th if th is not None else u
        ut, vt, wt, tht = sharded_planes_call(
            fused.sharded_mesh,
            lambda uu, vv, ww, tt, ee: fused.tendencies(uu, vv, ww, tt, ee),
            4, u, v, w, th_in, evisc)
        wt = wt.at[0].set(0.)  # half level ks is the wall
    else:
        # aliased accumulate-in-kernel: full (kcells) carried tendencies
        ut, vt, wt, tht = fused.tendencies(u, v, w, th, evisc, t_in=t)
        accumulated = True

    if smag.surface:
        from .stencil import im, ip, jm, jp
        rho = ctx.rhoref
        rhoh = ctx.rhorefh
        dzi = ctx.dzi
        dzhi = ctx.dzhi

        # Index helpers mirroring the kernel's reads: under fold_ghosts the
        # kernels CLAMP the k index, so old_vert must be recomputed with the
        # same clamped neighbor, not the true ghost value.
        def F(arr, kabs):
            if fold:
                kabs = min(max(kabs, ks), ke - 1)
            return arr[kabs]

        def E(kabs):
            if fold:
                return evisc[min(max(kabs - ks, 0), ctx.ktot - 1)]
            return evisc[kabs]

        # ---- u bottom/top diffusion row patches (diff_smag2.cxx diff_u) ----
        for row, ka in (("bot", ks), ("top", ke - 1)):
            ev_t = 0.25 * (im(E(ka)) + E(ka) + im(E(ka + 1)) + E(ka + 1)) + visc
            ev_b = 0.25 * (im(E(ka - 1)) + E(ka - 1) + im(E(ka)) + E(ka)) + visc
            if row == "bot":
                fz_top = ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["u_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi)
                corr = (-rhoh[ka + 1] * 0. - rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
            # replace ONLY the vertical diffusion term: recompute the rest
            # of the row identically to the kernel and substitute.
            old_vert = ((rhoh[ka + 1] * ev_t * ((F(u, ka + 1) - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                         - rhoh[ka] * ev_b * ((u[ka] - F(u, ka - 1)) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi))
                        / rho[ka] * dzi[ka])
            idx = ka if accumulated else (0 if row == "bot" else ctx.ktot - 1)
            ut = ut.at[idx].add(corr - old_vert)

        # ---- v rows ----
        for row, ka in (("bot", ks), ("top", ke - 1)):
            ev_t = 0.25 * (jm(E(ka)) + E(ka) + jm(E(ka + 1)) + E(ka + 1)) + visc
            ev_b = 0.25 * (jm(E(ka - 1)) + E(ka - 1) + jm(E(ka)) + E(ka)) + visc
            if row == "bot":
                fz_top = ev_t * ((v[ka + 1] - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["v_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = ev_b * ((v[ka] - v[ka - 1]) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi)
                corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
            old_vert = ((rhoh[ka + 1] * ev_t * ((F(v, ka + 1) - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
                         - rhoh[ka] * ev_b * ((v[ka] - F(v, ka - 1)) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi))
                        / rho[ka] * dzi[ka])
            idx = ka if accumulated else (0 if row == "bot" else ctx.ktot - 1)
            vt = vt.at[idx].add(corr - old_vert)

        # ---- th rows ----
        if fused.has_thermo:
            svisc = smag.viscs.get("th", visc)
            a = th
            for row, ka in (("bot", ks), ("top", ke - 1)):
                st_ = 0.5 * (E(ka) + E(ka + 1)) / smag.tPr + svisc
                sb = 0.5 * (E(ka - 1) + E(ka)) / smag.tPr + svisc
                if row == "bot":
                    fz_top = st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                    corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["th_fluxbot"]) / rho[ka] * dzi[ka]
                else:
                    fz_bot = sb * (a[ka] - a[ka - 1]) * dzhi[ka]
                    fz_top = -smag._fluxtop("th", ctx)
                    corr = ((rhoh[ka + 1] * fz_top - rhoh[ka] * fz_bot)
                            / rho[ka] * dzi[ka])
                old_vert = ((rhoh[ka + 1] * st_ * (F(a, ka + 1) - a[ka]) * dzhi[ka + 1]
                             - rhoh[ka] * sb * (a[ka] - F(a, ka - 1)) * dzhi[ka])
                            / rho[ka] * dzi[ka])
                idx = ka if accumulated else (0 if row == "bot" else ctx.ktot - 1)
                tht = tht.at[idx].add(corr - old_vert)

    t = dict(t)
    if accumulated:
        t["u"], t["v"], t["w"] = ut, vt, wt
        if fused.has_thermo:
            t["th"] = tht
        return t
    t["u"] = t["u"] + _pad_k(ctx, ut)
    t["v"] = t["v"] + _pad_k(ctx, vt)
    t["w"] = t["w"] + _pad_k(ctx, wt)
    if fused.has_thermo:
        t["th"] = t["th"] + _pad_k(ctx, tht)
    return t


def fused_tendencies_rk(fused, ctx, s, t, aux, sfc, cbdt, can, first=False,
                        rhs_dti=None):
    """fused_tendencies with the RK update folded into the kernels:
    returns (s_star, t_scaled, rhs) dicts.  The surface-model wall-row
    patches are applied to BOTH outputs (the kernel computed them with the
    clamped/periodic vertical term, exactly like the non-RK path).
    first=True: the carried t is identically zero (first substep) and is
    neither materialized nor read.  rhs_dti != None (tiled fold_ghosts
    variant): the Poisson rhs is emitted by the same kernel sweep and the
    u*/v* wall-row patches propagate into its wall rows (their horizontal
    divergence changes; the cbdt factor cancels against rhs_dti = 1/cbdt);
    rhs is None otherwise."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    th = s.get("th")
    fold = fused.fold_ghosts
    ks, ke = ctx.ks, ctx.ke
    dxi, dyi = ctx.dxi, ctx.dyi
    visc = smag.visc

    carry = not (isinstance(can, float) and can == 0.)
    fold_ev = (getattr(fused, "fold_evisc", False)
               and fused.sharded_mesh is None)
    if fold_ev:
        # evisc computed inside the sweep; the MOST surface row is a
        # cheap 2-D XLA computation fed in as the e-ring's plane 0.  It
        # must see the PREVIOUS substep's MO gradients (the substep
        # stashes it in aux before boundary.exec); fall back to computing
        # it here for direct callers (tests).
        if smag.surface:
            se_row = aux.get("se_row")
            if se_row is None:
                se_row = _surface_evisc_row(smag, ctx, s, sfc,
                                            fused.has_thermo)
        else:
            se_row = None
        (us, vs, ws, ths, ut, vt, wt, tht, rhs, evisc) = fused.tendencies_rk(
            u, v, w, th, None, t, cbdt, can, carry=carry, first=first,
            rhs_dti=rhs_dti, se_row=se_row)
    else:
        evisc = aux["evisc_int"] if fold else aux["evisc"]
    if fold_ev:
        pass  # kernel already ran above
    elif fused.sharded_mesh is not None:
        # Per-shard kernels on halo-padded planes; the wall-row patches
        # below run on the trimmed GLOBAL outputs (their rolls lower to
        # GSPMD collectives).  The in-kernel rhs fold needs the tiled
        # variant, which has no per-shard form — rhs stays a separate
        # (sharded) PresGlue pass.
        from ..parallel.halo import sharded_planes_call
        assert rhs_dti is None
        th_in = th if th is not None else u
        n_out = 8 if carry else 4
        args = [u, v, w, th_in, evisc]
        if not first:
            tth = t["th"] if fused.has_thermo else t["w"]
            args += [t["u"], t["v"], t["w"], tth]

        def call(uu, vv, ww, tt, ee, *rest):
            ts, cbdt_l = rest[:-1], rest[-1]
            t_l = None
            if ts:
                t_l = {"u": ts[0], "v": ts[1], "w": ts[2], "th": ts[3]}
            outs = fused.tendencies_rk(uu, vv, ww, tt, ee, t_l, cbdt_l, can,
                                       carry=carry, first=first)
            return outs[:n_out]

        outs = sharded_planes_call(fused.sharded_mesh, call, n_out, *args,
                                   scalars=(jnp.asarray(cbdt, u.dtype),))
        us, vs, ws, ths = outs[:4]
        if carry:
            ut, vt, wt, tht = outs[4:]
        else:
            ut = vt = wt = tht = None
        rhs = None
    else:
        us, vs, ws, ths, ut, vt, wt, tht, rhs = fused.tendencies_rk(
            u, v, w, th, evisc, t, cbdt, can, carry=carry, first=first,
            rhs_dti=rhs_dti)
    # w* top wall: the kernel grid never writes plane ke (w tendency is
    # zero there); the buffer is fresh, so pin the wall value explicitly.
    ws = ws.at[ke].set(0.)
    if not carry:
        ut = vt = wt = tht = None

    if smag.surface:
        from .stencil import im, ip, jm, jp
        rho = ctx.rhoref
        rhoh = ctx.rhorefh
        dzi = ctx.dzi
        dzhi = ctx.dzhi

        def F(arr, kabs):
            if fold:
                kabs = min(max(kabs, ks), ke - 1)
            return arr[kabs]

        def E(kabs):
            if fold:
                return evisc[min(max(kabs - ks, 0), ctx.ktot - 1)]
            return evisc[kabs]

        def patch(s_arr, t_arr, ka, delta):
            s_arr = s_arr.at[ka].add(cbdt * delta)
            if t_arr is not None:
                t_arr = t_arr.at[ka].add(can * delta)
            return s_arr, t_arr

        uv_deltas = {}

        # ---- u rows (diff_smag2.cxx diff_u wall forms) ----
        for row, ka in (("bot", ks), ("top", ke - 1)):
            ev_t = 0.25 * (im(E(ka)) + E(ka) + im(E(ka + 1)) + E(ka + 1)) + visc
            ev_b = 0.25 * (im(E(ka - 1)) + E(ka - 1) + im(E(ka)) + E(ka)) + visc
            if row == "bot":
                fz_top = ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["u_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi)
                corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
            old_vert = ((rhoh[ka + 1] * ev_t * ((F(u, ka + 1) - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                         - rhoh[ka] * ev_b * ((u[ka] - F(u, ka - 1)) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi))
                        / rho[ka] * dzi[ka])
            uv_deltas[("u", row)] = corr - old_vert
            us, ut = patch(us, ut, ka, corr - old_vert)

        # ---- v rows ----
        for row, ka in (("bot", ks), ("top", ke - 1)):
            ev_t = 0.25 * (jm(E(ka)) + E(ka) + jm(E(ka + 1)) + E(ka + 1)) + visc
            ev_b = 0.25 * (jm(E(ka - 1)) + E(ka - 1) + jm(E(ka)) + E(ka)) + visc
            if row == "bot":
                fz_top = ev_t * ((v[ka + 1] - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["v_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = ev_b * ((v[ka] - v[ka - 1]) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi)
                corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
            old_vert = ((rhoh[ka + 1] * ev_t * ((F(v, ka + 1) - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
                         - rhoh[ka] * ev_b * ((v[ka] - F(v, ka - 1)) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi))
                        / rho[ka] * dzi[ka])
            uv_deltas[("v", row)] = corr - old_vert
            vs, vt = patch(vs, vt, ka, corr - old_vert)

        # ---- th rows ----
        if fused.has_thermo:
            svisc = smag.viscs.get("th", visc)
            a = th
            for row, ka in (("bot", ks), ("top", ke - 1)):
                st_ = 0.5 * (E(ka) + E(ka + 1)) / smag.tPr + svisc
                sb = 0.5 * (E(ka - 1) + E(ka)) / smag.tPr + svisc
                if row == "bot":
                    fz_top = st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                    corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["th_fluxbot"]) / rho[ka] * dzi[ka]
                else:
                    fz_bot = sb * (a[ka] - a[ka - 1]) * dzhi[ka]
                    fz_top = -smag._fluxtop("th", ctx)
                    corr = ((rhoh[ka + 1] * fz_top - rhoh[ka] * fz_bot)
                            / rho[ka] * dzi[ka])
                old_vert = ((rhoh[ka + 1] * st_ * (F(a, ka + 1) - a[ka]) * dzhi[ka + 1]
                             - rhoh[ka] * sb * (a[ka] - F(a, ka - 1)) * dzhi[ka])
                            / rho[ka] * dzi[ka])
                ths, tht = patch(ths, tht, ka, corr - old_vert)

        if rhs is not None:
            # the u*/v* wall patches change the horizontal divergence of
            # the in-kernel rhs at its wall rows by
            # rhs_dti * rho * div_h(cbdt * delta)  (== rho * div_h(delta)
            # in the model, where rhs_dti = 1/cbdt)
            fac = rhs_dti * cbdt
            for row, ka, kr in (("bot", ks, 0), ("top", ke - 1, ctx.ktot - 1)):
                du = uv_deltas[("u", row)]
                dv = uv_deltas[("v", row)]
                dd = rho[ka] * ((ip(du) - du) * dxi + (jp(dv) - dv) * dyi)
                rhs = rhs.at[kr].add(fac * dd)

    s_star = dict(s)
    s_star["u"], s_star["v"], s_star["w"] = us, vs, ws
    if fused.has_thermo:
        s_star["th"] = ths
    if not carry:
        return s_star, None, rhs
    t_out = dict(t)
    t_out["u"], t_out["v"], t_out["w"] = ut, vt, wt
    if fused.has_thermo:
        t_out["th"] = tht
    return s_star, t_out, rhs


# ==========================================================================
#  pressure-glue kernels (rkfold path)
#
#  The projection step around the spectral solve is pure elementwise/local
#  work that XLA otherwise runs as SIX+ full-array passes (uu/vv/ww dti
#  scaling, the rhs fusion, the p_full scatter, gx/gy/gz materialization,
#  and the s*/carry subtract pairs — measured 86 ms/step at 512^3).  Two
#  single-pass kernel families replace them: the divergence rhs straight
#  from s* (pres_2.cxx:156-196 with the 1/dt folded in), and the gradient
#  application to BOTH the state and the carried tendency per component
#  (pres_2.cxx:364-387), reading the interior p directly so no ghost-padded
#  pressure array is ever built.
# ==========================================================================

def _pres_rhs_body(dxi, dyi, pc_ref, rk_ref, uc, vc, wc, wp, out):
    k = pl.program_id(0)
    dti = rk_ref[0]
    rho, rhoh, rhoh1, dzi = (pc_ref[k, 0], pc_ref[k, 1], pc_ref[k, 2],
                             pc_ref[k, 3])
    u, v, w, w1 = uc[0], vc[0], wc[0], wp[0]
    out[0] = dti * (rho * ((_ip(u) - u) * dxi + (_jp(v) - v) * dyi)
                    + (rhoh1 * w1 - rhoh * w) * dzi)


def _pres_apply_uvw_body(dxi, dyi, carry, pc_ref, rk_ref, p, *rest):
    """Gradient of p applied to all three components in ONE pass: the p
    plane is read once instead of four times (u, v, and twice for w), and
    the k-1 plane that the w gradient needs is carried in VMEM scratch
    across grid steps (TPU grids run sequentially; same shift-register
    pattern as the j-tiled kernels above).  The i-/j- backward differences
    are periodic within the plane, so rolls suffice."""
    k = pl.program_id(0)
    pk = p[0]
    gu = (pk - _im(pk)) * dxi
    gv = (pk - _jm(pk)) * dyi
    # k == 0 is the bottom interior w level, held at the impermeable-wall
    # value — the select discards the uninitialized-scratch branch there.
    pprev = rest[-1]
    gw = jnp.where(k == 0, 0., (pk - pprev[...]) * pc_ref[k, 4])
    dtv = rk_ref[0]
    if carry:
        su, sv, sw, tu, tv, tw, suo, svo, swo, tuo, tvo, two = rest[:-1]
        cv = rk_ref[1]
        tuo[0] = tu[0] - cv * gu
        tvo[0] = tv[0] - cv * gv
        two[0] = tw[0] - cv * gw
    else:
        su, sv, sw, suo, svo, swo = rest[:-1]
    suo[0] = su[0] - dtv * gu
    svo[0] = sv[0] - dtv * gv
    swo[0] = sw[0] - dtv * gw
    pprev[...] = pk


class PresGlue:
    """The two kernel families around the spectral pressure solve.

    ``sharded_mesh`` (set by Model together with the fused kernels') makes
    ``fused_pressure_rk`` run both kernels per shard on halo-padded planes;
    ``ctx`` then carries the LOCAL padded (jtot, itot)."""

    sharded_mesh = None

    def __init__(self, ctx, interpret):
        self.ctx = ctx
        self.interpret = interpret
        ks, kt = ctx.ks, ctx.ktot
        pc = np.zeros((kt, 5), dtype=np.float64)
        for k in range(kt):
            ka = ks + k
            pc[k, 0] = np.asarray(ctx.rhoref)[ka]
            pc[k, 1] = np.asarray(ctx.rhorefh)[ka]
            pc[k, 2] = np.asarray(ctx.rhorefh)[ka + 1]
            pc[k, 3] = np.asarray(ctx.dzi)[ka]
            pc[k, 4] = np.asarray(ctx.dzhi)[ka]
        self.pc = pc

    def _specs(self):
        ctx = self.ctx
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        p_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot), lambda k: (k, 0, 0),
                              memory_space=pltpu.VMEM)
        f_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                              lambda k: (k + ctx.ks, 0, 0),
                              memory_space=pltpu.VMEM)
        return sm, p_spec, f_spec

    def rhs(self, su, sv, sw, dti):
        """dti * div(rho s*) on the interior — ONE pass over s*."""
        ctx = self.ctx
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot
        pc = jnp.asarray(self.pc, dtype=su.dtype)
        rk = jnp.reshape(jnp.asarray(dti, su.dtype), (1,))
        sm, _, f_spec = self._specs()
        w1_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot),
                               lambda k: (k + ks + 1, 0, 0),
                               memory_space=pltpu.VMEM)
        body = functools.partial(_pres_rhs_body, float(ctx.dxi),
                                 float(ctx.dyi))
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), su.dtype)
        return _pallas_call(
            body, grid=(kt,), in_specs=[sm, sm, f_spec, f_spec, f_spec,
                                        w1_spec],
            out_specs=pl.BlockSpec((1, ctx.jtot, ctx.itot),
                                   lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=shape, interpret=self.interpret,
        )(pc, rk, su, sv, sw, sw)

    def apply(self, p_int, s_star, t_s, subdt, can, carry):
        """s_new = s* - subdt*grad p, t_new = t - cA_next*grad p for u, v,
        and w in a single pass (one p-plane read serves all three gradient
        components); ghost planes ride through the aliasing untouched."""
        ctx = self.ctx
        sm, p_spec, f_spec = self._specs()
        dt0 = s_star["u"].dtype
        pc = jnp.asarray(self.pc, dtype=dt0)
        rk = jnp.stack([jnp.asarray(subdt, dt0), jnp.asarray(can, dt0)])
        shape = jax.ShapeDtypeStruct((ctx.kcells, ctx.jtot, ctx.itot), dt0)
        body = functools.partial(_pres_apply_uvw_body, float(ctx.dxi),
                                 float(ctx.dyi), carry)
        nout = 6 if carry else 3
        args = [s_star["u"], s_star["v"], s_star["w"]]
        if carry:
            args += [t_s["u"], t_s["v"], t_s["w"]]
        # 13 plane blocks + double buffering exceeds the 16 MB default
        # scoped-vmem limit at 512^2 planes; v5e has 128 MB VMEM, so lift
        # the per-kernel cap instead of splitting the pass.
        cparams = (None if self.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
        outs = _pallas_call(
            body, grid=(ctx.ktot,),
            in_specs=[sm, sm, p_spec] + [f_spec] * nout,
            out_specs=[f_spec] * nout, out_shape=[shape] * nout,
            input_output_aliases={3 + i: i for i in range(nout)},
            scratch_shapes=[pltpu.VMEM((ctx.jtot, ctx.itot), dt0)],
            interpret=self.interpret, compiler_params=cparams,
        )(pc, rk, p_int, *args)
        s_new = dict(s_star)
        s_new["u"], s_new["v"], s_new["w"] = outs[:3]
        if not carry:
            return s_new, None
        t_new = dict(t_s)
        t_new["u"], t_new["v"], t_new["w"] = outs[3:]
        return s_new, t_new


def fused_pressure_rk(glue, ctx, pres, s_star, t_s, aux, subdt, can, pp,
                      carry, rhs=None):
    """The full projection for the rkfold path: Pallas rhs -> spectral
    solve -> Pallas gradient application.  aux['p'] is still produced (for
    cross/dump/budget consumers) but from the interior solve directly; in
    the hot loop nothing reads it and XLA dead-code-eliminates the pad.
    rhs: a divergence rhs already emitted by the tendency kernel sweep
    (fused_tendencies_rk with rhs_dti) — skips the separate rhs pass."""
    ks, ke = ctx.ks, ctx.ke
    mesh = glue.sharded_mesh
    dt0 = s_star["u"].dtype
    if rhs is None:
        if mesh is not None:
            from ..parallel.halo import sharded_planes_call
            rhs = sharded_planes_call(
                mesh, lambda su, sv, sw, dti: glue.rhs(su, sv, sw, dti),
                1, s_star["u"], s_star["v"], s_star["w"],
                scalars=(jnp.asarray(1. / subdt, dt0),))[0]
        else:
            rhs = glue.rhs(s_star["u"], s_star["v"], s_star["w"], 1. / subdt)
    p_int = pres.solve(ctx, rhs, pp)
    aux = dict(aux)
    p_full = jnp.pad(p_int, ((ks, ctx.kcells - ke), (0, 0), (0, 0)),
                     mode="edge")
    aux["p"] = p_full
    if mesh is not None:
        from ..parallel.halo import sharded_planes_call
        comps = ("u", "v", "w")
        args = [p_int] + [s_star[n] for n in comps]
        if carry:
            args += [t_s[n] for n in comps]
        n_out = 6 if carry else 3

        def call(p_l, *rest):
            fields, subdt_l = rest[:-1], rest[-1]
            s_l = {n: fields[i] for i, n in enumerate(comps)}
            t_l = ({n: fields[3 + i] for i, n in enumerate(comps)}
                   if carry else None)
            sn, tn = glue.apply(p_l, s_l, t_l, subdt_l, can, carry)
            outs = [sn[n] for n in comps]
            if carry:
                outs += [tn[n] for n in comps]
            return tuple(outs)

        outs = sharded_planes_call(mesh, call, n_out, *args,
                                   scalars=(jnp.asarray(subdt, dt0),))
        s_new = dict(s_star)
        s_new["u"], s_new["v"], s_new["w"] = outs[:3]
        t_new = None
        if carry:
            t_new = dict(t_s)
            t_new["u"], t_new["v"], t_new["w"] = outs[3:]
    else:
        s_new, t_new = glue.apply(p_int, s_star, t_s, subdt, can, carry)
    return s_new, t_new, aux


# ==========================================================================
#  generic fused mode: any thermo (N2 from XLA) + any scalar list
# ==========================================================================

def fused_generic_viscosity(fused, ctx, s, sfc, aux, thermo):
    """Eddy viscosity for the generic mode: the thermo computes N2 in XLA
    (sat_adjust for moist, background-N2 for buoy, ...) and the kernel does
    the strain + stability math; the MO surface row is patched like the dry
    path.  Mirrors DiffSmag2.exec_viscosity exactly."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    ks, ke = ctx.ks, ctx.ke
    stratified = thermo is not None and getattr(thermo, "scalars", ())
    n2s = fused.n2_scalar
    if fused.sharded_mesh is not None:
        from ..parallel.halo import sharded_planes_call
        if n2s is not None:
            # in-kernel N2 from the scalar's vertical gradient (vertical
            # is shard-local; C_THREFH holds thvref)
            ev = sharded_planes_call(
                fused.sharded_mesh,
                lambda uu, vv, ww, aa: fused.evisc(uu, vv, ww, aa,
                                                   stratified=True),
                1, u, v, w, s[n2s])[0]
        elif stratified:
            n2 = thermo.get_n2(ctx, s)  # global XLA (rolls -> collectives)
            ev = sharded_planes_call(
                fused.sharded_mesh,
                lambda uu, vv, ww, nn: fused.evisc_n2(uu, vv, ww, nn),
                1, u, v, w, n2)[0]
        else:
            ev = sharded_planes_call(
                fused.sharded_mesh,
                lambda uu, vv, ww: fused.evisc(uu, vv, ww, None),
                1, u, v, w)[0]
    elif n2s is not None:
        ev = fused.evisc(u, v, w, s[n2s], stratified=True)
    elif stratified:
        n2 = thermo.get_n2(ctx, s)
        ev = fused.evisc_n2(u, v, w, n2)
    else:
        ev = fused.evisc(u, v, w, None)
    if smag.surface:
        ev = ev.at[0].set(_surface_evisc_row(smag, ctx, s, sfc,
                                             bool(stratified)))
    evisc = jnp.zeros_like(u)
    evisc = evisc.at[ks:ke].set(ev)
    evisc = evisc.at[ks - 1].set(ev[0])
    evisc = evisc.at[ke].set(ev[-1])
    aux = dict(aux)
    aux["evisc"] = evisc
    return aux


def _generic_wall_deltas(fused, ctx, s, aux, sfc):
    """Per-field wall-row TENDENCY corrections for the generic kernels
    (surface-model flux replacement, diff_smag2.cxx diff_u/diff_c):
    returns {field: [(k_row, delta_plane), ...]}.  Shared by the plain
    path (adds deltas to t) and the rkfold path (adds cbdt*delta to s*
    and can*delta to the carry)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    e = aux["evisc"]
    ks, ke = ctx.ks, ctx.ke
    dxi, dyi = ctx.dxi, ctx.dyi
    visc = smag.visc
    from .stencil import im, jm
    rho = ctx.rhoref
    rhoh = ctx.rhorefh
    dzi = ctx.dzi
    dzhi = ctx.dzhi
    out = {}

    du = []
    for row, ka in (("bot", ks), ("top", ke - 1)):
        ev_t = 0.25 * (im(e)[ka] + e[ka] + im(e)[ka + 1] + e[ka + 1]) + visc
        ev_b = 0.25 * (im(e)[ka - 1] + e[ka - 1] + im(e)[ka] + e[ka]) + visc
        if row == "bot":
            fz_top = ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
            corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["u_fluxbot"]) / rho[ka] * dzi[ka]
        else:
            fz_bot = ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi)
            corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
        old_vert = ((rhoh[ka + 1] * ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                     - rhoh[ka] * ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi))
                    / rho[ka] * dzi[ka])
        du.append((ka, corr - old_vert))
    out["u"] = du

    dv = []
    for row, ka in (("bot", ks), ("top", ke - 1)):
        ev_t = 0.25 * (jm(e)[ka] + e[ka] + jm(e)[ka + 1] + e[ka + 1]) + visc
        ev_b = 0.25 * (jm(e)[ka - 1] + e[ka - 1] + jm(e)[ka] + e[ka]) + visc
        if row == "bot":
            fz_top = ev_t * ((v[ka + 1] - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
            corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["v_fluxbot"]) / rho[ka] * dzi[ka]
        else:
            fz_bot = ev_b * ((v[ka] - v[ka - 1]) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi)
            corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
        old_vert = ((rhoh[ka + 1] * ev_t * ((v[ka + 1] - v[ka]) * dzhi[ka + 1] + (w[ka + 1] - jm(w[ka + 1])) * dyi)
                     - rhoh[ka] * ev_b * ((v[ka] - v[ka - 1]) * dzhi[ka] + (w[ka] - jm(w[ka])) * dyi))
                    / rho[ka] * dzi[ka])
        dv.append((ka, corr - old_vert))
    out["v"] = dv

    for name in ctx.scalar_names:
        a = s[name]
        svisc = smag.viscs.get(name, visc)
        da = []
        for row, ka in (("bot", ks), ("top", ke - 1)):
            st_ = 0.5 * (e[ka] + e[ka + 1]) / smag.tPr + svisc
            sb = 0.5 * (e[ka - 1] + e[ka]) / smag.tPr + svisc
            if row == "bot":
                fz_top = st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc[name + "_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = sb * (a[ka] - a[ka - 1]) * dzhi[ka]
                fz_top = -smag._fluxtop(name, ctx)
                corr = ((rhoh[ka + 1] * fz_top - rhoh[ka] * fz_bot)
                        / rho[ka] * dzi[ka])
            old_vert = ((rhoh[ka + 1] * st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                         - rhoh[ka] * sb * (a[ka] - a[ka - 1]) * dzhi[ka])
                        / rho[ka] * dzi[ka])
            da.append((ka, corr - old_vert))
        out[name] = da
    return out


def generic_col_tables(fused, ctx, s, sfc, aux, force, buffer, decay):
    """Per-substep column tables for the GENERIC fold: every per-level
    tendency producer — Rayleigh buffer (buffer.cxx), exponential decay
    (decay.cxx), dpdx/geostrophic pressure forcing, large-scale sources,
    mean/local subsidence and nudging (force.cxx) — collapses to
    per-level coefficients the tendency kernels apply as extra FMAs on
    planes they already hold:

        t_a += C_ADDS - C_FACZ * a + C_WLSDN * (a - a_dn) + C_WLSUP * (a_up - a)

    (C_ADDS absorbs ls profiles, facz*ref pulls, mean-subsidence and
    nudge terms; C_FACZ absorbs buffer facz + decay rates; the WLS pair
    is the local-subsidence upwind stencil.)  Geostrophic Coriolis keeps
    its plane math (fold_coriolis) with ug/vg riding the traced table, so
    time-dependent profiles need no recompiles.  Returns
    (cc_uvw, {scalar: cc_s}) — (ktot, N_CONST) arrays based on the static
    table.  Caller gates on force/buffer/decay being representable
    (model._col_fold)."""
    ks, ke = ctx.ks, ctx.ke
    dty = ctx.dtype
    base = jnp.asarray(fused.cc_tend, dtype=dty)
    names = list(ctx.scalar_names)
    kt = ke - ks
    z = jnp.zeros((kt,), dty)
    facz, faczh, add_u, add_v = z, z, z, z
    faczs = {n: z for n in names}
    adds = {n: z for n in names}
    wls_dn = wls_up = None
    wls_mom = False
    ug = vg = None

    means = {}

    def mean_prof(n):
        # full-kcells plane means (the jnp force/buffer paths read the
        # ghost rows of the mean, which are filled at this point)
        if n not in means:
            means[n] = jnp.mean(s[n], axis=(1, 2))
        return means[n]

    from .buffer import Buffer
    if isinstance(buffer, Buffer):
        fz = jnp.asarray(buffer.fac_z[:, 0, 0], dty)
        facz = facz + fz
        faczh = faczh + jnp.asarray(buffer.fac_zh[:, 0, 0], dty)

        def bref(n):
            if buffer.swupdate:
                return mean_prof(n)[ks:ke].astype(dty)
            return jnp.asarray(buffer.profs[n][:, 0, 0], dty)

        add_u = add_u + fz * bref("u")
        add_v = add_v + fz * bref("v")
        for n in names:
            faczs[n] = faczs[n] + fz
            adds[n] = adds[n] + fz * bref(n)

    if getattr(decay, "dmap", None):
        for n, tau in decay.dmap.items():
            faczs[n] = faczs[n] + dty(1. / tau)

    from .force import Force
    if isinstance(force, Force):
        if force.swlspres == "geo":
            if sfc is not None and "__geo_u" in sfc:
                ug = sfc["__geo_u"].astype(dty)
                vg = sfc["__geo_v"].astype(dty)
            else:
                ug = jnp.asarray(force.ug, dty).reshape(-1)[:kt]
                vg = jnp.asarray(force.vg, dty).reshape(-1)[:kt]
        elif force.swlspres == "dpdx":
            add_u = add_u - dty(force.dpdx)
        if force.swls == "1":
            for n in force.lslist:
                if sfc is not None and ("__ls_" + n) in sfc:
                    prof = sfc["__ls_" + n].astype(dty)
                else:
                    prof = jnp.asarray(force.ls_profs[n], dty).reshape(-1)[:kt]
                if n == "u":
                    add_u = add_u + prof
                elif n == "v":
                    add_v = add_v + prof
                else:
                    adds[n] = adds[n] + prof
        if force.swwls in ("mean", "local"):
            if sfc is not None and "__wls" in sfc:
                wls = sfc["__wls"].astype(dty)
            else:
                wls = jnp.asarray(force.wls, dty).reshape(-1)[:kt]
            wls_mom = bool(getattr(force, "swwls_mom", False))
            sub_names = names + (["u", "v"] if wls_mom else [])
            dzhi = ctx.dzhi
            if force.swwls == "mean":
                for n in sub_names:
                    am = mean_prof(n)
                    ddn = (am[ks:ke] - am[ks - 1:ke - 1]) * dzhi[ks:ke]
                    dup = (am[ks + 1:ke + 1] - am[ks:ke]) * dzhi[ks + 1:ke + 1]
                    tp = jnp.where(wls > 0., -wls * ddn, -wls * dup).astype(dty)
                    if n == "u":
                        add_u = add_u + tp
                    elif n == "v":
                        add_v = add_v + tp
                    else:
                        adds[n] = adds[n] + tp
            else:
                wls_dn = jnp.where(wls > 0., -wls * dzhi[ks:ke], 0.).astype(dty)
                wls_up = jnp.where(wls > 0., 0.,
                                   -wls * dzhi[ks + 1:ke + 1]).astype(dty)
        if force.swnudge == "1":
            fac = jnp.asarray(force.nudge_fac, dty).reshape(-1)[:kt]
            for n in force.nudgelist:
                if sfc is not None and ("__nudge_" + n) in sfc:
                    prof = sfc["__nudge_" + n].astype(dty)
                else:
                    prof = jnp.asarray(force.nudge_profs[n], dty).reshape(-1)[:kt]
                tp = -fac * (mean_prof(n)[ks:ke].astype(dty) - prof)
                if n == "u":
                    add_u = add_u + tp
                elif n == "v":
                    add_v = add_v + tp
                elif n in adds:
                    adds[n] = adds[n] + tp

    cc_uvw = (base.at[:, C_FACZ].set(facz).at[:, C_FACZH].set(faczh)
              .at[:, C_ADDU].set(add_u).at[:, C_ADDV].set(add_v))
    if ug is not None:
        cc_uvw = cc_uvw.at[:, C_UG].set(ug).at[:, C_VG].set(vg)
    if wls_dn is not None and wls_mom:
        cc_uvw = cc_uvw.at[:, C_WLSDN].set(wls_dn).at[:, C_WLSUP].set(wls_up)
    cc_s = {}
    for n in names:
        tab = base.at[:, C_FACZ].set(faczs[n]).at[:, C_ADDS].set(adds[n])
        if wls_dn is not None:
            tab = tab.at[:, C_WLSDN].set(wls_dn).at[:, C_WLSUP].set(wls_up)
        cc_s[n] = tab
    return cc_uvw, cc_s


def fused_generic_tendencies_rk(fused, ctx, s, t, aux, sfc, cbdt, can,
                                carry=True, cols=None):
    """Generic (any-thermo / any-scalar) tendency kernels with the
    low-storage RK update folded in: returns (s_star, t_carry) where
    s* = s + cB*dt*t_total and t_carry = cA_next*t_total.  All upstream
    tendency producers (thermo buoyancy, microphysics, radiation, buffer,
    decay, source, force) must have written into t BEFORE this call —
    they are additive, so running them before advec+diff is equivalent to
    the reference order as long as none of them READS t (model.py gates
    the uflux pressure forcing out for that reason).  Wall rows get the
    surface-model flux replacement applied to both outputs."""
    u, v, w = s["u"], s["v"], s["w"]
    evisc = aux["evisc"]
    ks, ke = ctx.ks, ctx.ke
    smag = fused.smag

    cc_uvw, cc_s = cols if cols is not None else (None, {})
    fold_add = cols is not None
    if fused.sharded_mesh is not None:
        # Per-shard RK-folded kernels on halo-padded planes (the round-4
        # mesh gate at model.py use_rkfold_generic is gone): ONE shard_map
        # region runs uv + w + the merged scalar pass, so the shared
        # (u, v, w, evisc) shards are halo-exchanged once.  The traced
        # column tables ride through as replicated scalars.
        from ..parallel.halo import sharded_planes_call
        names = list(ctx.scalar_names)
        S = len(names)
        sviscs = [smag.viscs.get(n, smag.visc) for n in names]
        arrays = [u, v, w, evisc, t["u"], t["v"], t["w"]]
        for n in names:
            arrays += [s[n], t[n]]
        scal = [jnp.asarray(cbdt, u.dtype)]
        if fold_add:
            scal += [cc_uvw] + [cc_s[n] for n in names]
        n_out = (6 + 2 * S) if carry else (3 + S)

        def call(uu, vv, ww, ee, tu, tv, tw, *rest):
            sa = {n: rest[2 * i] for i, n in enumerate(names)}
            ta = {n: rest[2 * i + 1] for i, n in enumerate(names)}
            rest = rest[2 * S:]
            cbdt_l = rest[0]
            cuv = rest[1] if fold_add else None
            csl = ({n: rest[2 + i] for i, n in enumerate(names)}
                   if fold_add else None)
            o_uv = fused.tend_uv_rk(uu, vv, ww, ee, tu, tv, cbdt_l, can,
                                    carry=carry, cc_in=cuv,
                                    fold_add=fold_add)
            o_w = fused.tend_w_rk(uu, vv, ww, ee, tw, cbdt_l, can,
                                  carry=carry, cc_in=cuv)
            if S > 1:
                ss_l, tc_l = fused.tend_scalars_rk(
                    names, sa, uu, vv, ww, ee, sviscs, ta, cbdt_l, can,
                    carry=carry, cc_in=csl, fold_add=fold_add)
            else:
                ss_l, tc_l = {}, {}
                for i, n in enumerate(names):
                    o = fused.tend_scalar_rk(
                        sa[n], uu, vv, ww, ee, sviscs[i], ta[n], cbdt_l,
                        can, carry=carry,
                        cc_in=(csl[n] if fold_add else None),
                        fold_add=fold_add)
                    ss_l[n] = o[0]
                    if carry:
                        tc_l[n] = o[1]
            outs = [o_uv[0], o_uv[1], o_w[0]] + [ss_l[n] for n in names]
            if carry:
                outs += [o_uv[2], o_uv[3], o_w[1]] + [tc_l[n] for n in names]
            return tuple(outs)

        outs = sharded_planes_call(fused.sharded_mesh, call, n_out,
                                   *arrays, scalars=tuple(scal))
        s_star = {"u": outs[0], "v": outs[1], "w": outs[2]}
        s_star.update({n: outs[3 + i] for i, n in enumerate(names)})
        t_c = {}
        if carry:
            off = 3 + S
            t_c = {"u": outs[off], "v": outs[off + 1], "w": outs[off + 2]}
            t_c.update({n: outs[off + 3 + i] for i, n in enumerate(names)})
        s_star["w"] = s_star["w"].at[ke].set(0.)
        if smag.surface:
            cb = jnp.asarray(cbdt, dtype=u.dtype)
            cv = jnp.asarray(can, dtype=u.dtype)
            for name, rows in _generic_wall_deltas(fused, ctx, s, aux,
                                                   sfc).items():
                for ka, delta in rows:
                    s_star[name] = s_star[name].at[ka].add(cb * delta)
                    if carry:
                        t_c[name] = t_c[name].at[ka].add(cv * delta)
        if not carry:
            t_c = {n: jnp.zeros_like(v_) for n, v_ in s_star.items()}
        return s_star, t_c

    outs_uv = fused.tend_uv_rk(u, v, w, evisc, t["u"], t["v"], cbdt, can,
                               carry=carry, cc_in=cc_uvw, fold_add=fold_add)
    outs_w = fused.tend_w_rk(u, v, w, evisc, t["w"], cbdt, can, carry=carry,
                             cc_in=cc_uvw)
    s_star = {"u": outs_uv[0], "v": outs_uv[1], "w": outs_w[0]}
    t_c = {}
    if carry:
        t_c = {"u": outs_uv[2], "v": outs_uv[3], "w": outs_w[1]}
    names = list(ctx.scalar_names)
    if len(names) > 1 and os.environ.get("MICROHH_SCMERGE", "1") == "1":
        # merged multi-scalar pass: u/v/w/evisc read once for all scalars
        sviscs = [smag.viscs.get(n, smag.visc) for n in names]
        ss, tc = fused.tend_scalars_rk(
            names, s, u, v, w, evisc, sviscs, t, cbdt, can, carry=carry,
            cc_in=(cc_s if fold_add else None), fold_add=fold_add)
        s_star.update(ss)
        t_c.update(tc)
    else:
        for name in names:
            outs = fused.tend_scalar_rk(s[name], u, v, w, evisc,
                                        smag.viscs.get(name, smag.visc),
                                        t[name], cbdt, can, carry=carry,
                                        cc_in=cc_s.get(name),
                                        fold_add=fold_add)
            s_star[name] = outs[0]
            if carry:
                t_c[name] = outs[1]

    # w* top wall: the kernel grid never writes plane ke
    s_star["w"] = s_star["w"].at[ke].set(0.)

    if smag.surface:
        # cbdt is usually a traced scalar (dt is a jit argument) — keep it
        # symbolic; jnp broadcasting handles the scale-in.
        cb = jnp.asarray(cbdt, dtype=u.dtype)
        cv = jnp.asarray(can, dtype=u.dtype)
        for name, rows in _generic_wall_deltas(fused, ctx, s, aux, sfc).items():
            for ka, delta in rows:
                s_star[name] = s_star[name].at[ka].add(cb * delta)
                if carry:
                    t_c[name] = t_c[name].at[ka].add(cv * delta)
    if not carry:
        t_c = {n: jnp.zeros_like(v_) for n, v_ in s_star.items()}
    return s_star, t_c


def fused_generic_tendencies(fused, ctx, s, t, aux, sfc):
    """advec_2 + diff_smag2 tendencies for u, v, w and EVERY scalar via the
    per-field kernels, with the surface-model wall rows patched in XLA
    (flux replacement, diff_smag2.cxx diff_u/diff_c).  Buoyancy is NOT
    included (the thermo op adds it, as in the jnp pipeline)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    evisc = aux["evisc"]
    ks, ke = ctx.ks, ctx.ke
    dxi, dyi = ctx.dxi, ctx.dyi
    visc = smag.visc

    t = dict(t)
    if fused.sharded_mesh is not None:
        from ..parallel.halo import sharded_planes_call
        mesh = fused.sharded_mesh
        ut, vt = sharded_planes_call(
            mesh,
            lambda uu, vv, ww, ee, tu, tv: fused.tend_uv(uu, vv, ww, ee,
                                                         tu, tv),
            2, u, v, w, evisc, t["u"], t["v"])
        wt = sharded_planes_call(
            mesh,
            lambda uu, vv, ww, ee, tw: fused.tend_w(uu, vv, ww, ee, tw),
            1, u, v, w, evisc, t["w"])[0]
        scalar_t = {}
        for name in ctx.scalar_names:
            sv = smag.viscs.get(name, visc)
            scalar_t[name] = sharded_planes_call(
                mesh,
                lambda aa, uu, vv, ww, ee, ta, sv=sv:
                    fused.tend_scalar(aa, uu, vv, ww, ee, sv, ta),
                1, s[name], u, v, w, evisc, t[name])[0]
    else:
        ut, vt = fused.tend_uv(u, v, w, evisc, t["u"], t["v"])
        wt = fused.tend_w(u, v, w, evisc, t["w"])
        scalar_t = {name: fused.tend_scalar(s[name], u, v, w, evisc,
                                            smag.viscs.get(name, visc),
                                            t[name])
                    for name in ctx.scalar_names}

    if smag.surface:
        deltas = _generic_wall_deltas(fused, ctx, s, aux, sfc)
        for ka, d in deltas["u"]:
            ut = ut.at[ka].add(d)
        for ka, d in deltas["v"]:
            vt = vt.at[ka].add(d)
        for name in ctx.scalar_names:
            at = scalar_t[name]
            for ka, d in deltas[name]:
                at = at.at[ka].add(d)
            scalar_t[name] = at

    t["u"], t["v"], t["w"] = ut, vt, wt
    for name in ctx.scalar_names:
        t[name] = scalar_t[name]
    return t
