"""Pallas-fused stencil kernels for the 2nd-order LES hot path.

The jnp op pipeline (advec_2 + diff_smag2 + buoyancy, each with its own
``.at[].add``) costs hundreds of HBM passes per substep; these kernels fuse
everything that reads the same 3x3x3 neighborhoods into ONE pass over the
fields per RK substep:

* ``evisc_kernel``     — strain^2 + stability-corrected Smagorinsky eddy
                         viscosity (diff_smag2.cxx calc_strain2 + calc_evisc).
* ``tendency_kernel``  — advec_2 (advec_2.cxx) + diff_smag2 flux divergence
                         (diff_smag2.cxx diff_u/v/w/c) + dry buoyancy
                         (thermo_dry.cxx calc_buoyancy_tend_2nd) for u,v,w,th.

Layout: (k, j, i) with i on the 128 lanes.  The grid is over k; each program
reads (1, jtot, itot) planes at k-1/k/k+1 (the same HBM array is passed once
per vertical offset — overlapping windows via three index maps).  Horizontal
periodicity is jnp.roll on the in-VMEM plane.  Wall rows (the MO surface
layer, k = ks and ke-1 flux replacements) are patched afterwards in XLA as
cheap 2-D fixups; the kernels compute the pure interior formula everywhere.

Per-level column constants (dzi, dzhi, rho ratios, thref...) ride along as
an (ktot, NCONST) SMEM block.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as cst

# column-constant slots
(C_DZI, C_DZHI, C_DZHI1, C_RHO, C_RHOH, C_RHOH1, C_MLEN2, C_Z,
 C_THREFH, C_DZI_M1, N_CONST) = range(11)


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


# ==========================================================================
#  eddy viscosity kernel
# ==========================================================================

def _evisc_body(tPr, dxi, dyi, has_thermo,
                cc_ref, um, uc, up, vm, vc, vp, wm, wc, wp, thm, thc, thp,
                out_ref):
    u = uc[0]
    v = vc[0]
    w = wc[0]
    w1 = wp[0]
    u_dn = um[0]
    u_up = up[0]
    v_dn = vm[0]
    v_up = vp[0]

    dzi = cc_ref[pl.program_id(0), C_DZI]
    dzhi = cc_ref[pl.program_id(0), C_DZHI]
    dzhi1 = cc_ref[pl.program_id(0), C_DZHI1]
    dzi_m1 = cc_ref[pl.program_id(0), C_DZI_M1]
    mlen2 = cc_ref[pl.program_id(0), C_MLEN2]

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

    if has_thermo:
        th_dn = thm[0]
        th_up = thp[0]
        thref = cc_ref[pl.program_id(0), C_THREFH]  # thref at full level stored here for evisc
        n2 = cst.grav / thref * 0.5 * (th_up - th_dn) * dzi  # NOTE dzi(c) slot
        # the reference uses dzi[k]; C_DZI is exactly that
        rit = n2 / strain2 / tPr
        rit = jnp.minimum(rit, 1. - cst.dsmall)
        out_ref[0] = mlen2 * jnp.sqrt(strain2) * jnp.sqrt(1. - rit)
    else:
        out_ref[0] = mlen2 * jnp.sqrt(strain2)


# ==========================================================================
#  fused advec_2 + diff_smag2 + buoyancy tendency kernel
# ==========================================================================

def _tend_uv_body(tPr, dxi, dyi, visc, has_thermo,
                  cc_ref,
                  um, uc, up, vm, vc, vp, wc, wp,
                  em, ec, ep,
                  ut_ref, vt_ref):
    u_dn, u, u_up = um[0], uc[0], up[0]
    v_dn, v, v_up = vm[0], vc[0], vp[0]
    w, w_up = wc[0], wp[0]
    e_dn, e, e_up = em[0], ec[0], ep[0]

    dzi = cc_ref[pl.program_id(0), C_DZI]
    dzhi = cc_ref[pl.program_id(0), C_DZHI]     # at half level k
    dzhi1 = cc_ref[pl.program_id(0), C_DZHI1]   # at half level k+1
    dzi_m1 = cc_ref[pl.program_id(0), C_DZI_M1]
    rho = cc_ref[pl.program_id(0), C_RHO]
    rhoh = cc_ref[pl.program_id(0), C_RHOH]
    rhoh1 = cc_ref[pl.program_id(0), C_RHOH1]
    threfh = cc_ref[pl.program_id(0), C_THREFH]

    # ---------------- u tendency ----------------
    # advection (advec_2.cxx:80-109)
    adv_u = -((_i2(u, _ip(u)) ** 2 - _i2(_im(u), u) ** 2) * dxi
              + (_i2(_im(_jp(v)), _jp(v)) * _i2(u, _jp(u))
                 - _i2(_im(v), v) * _i2(_jm(u), u)) * dyi
              + (rhoh1 * _i2(_im(w_up), w_up) * _i2(u, u_up)
                 - rhoh * _i2(_im(w), w) * _i2(u_dn, u)) / rho * dzi)

    # diffusion (diff_smag2.cxx diff_u)
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
                - rhoh * ev_b * ((u - u_dn) * dzhi + (w - _im(w)) * dxi)) / rho * dzi)
    ut_ref[0] = adv_u + dif_u

    # ---------------- v tendency ----------------
    adv_v = -((_i2(_jm(_ip(u)), _ip(u)) * _i2(v, _ip(v))
               - _i2(_jm(u), u) * _i2(_im(v), v)) * dxi
              + (_i2(v, _jp(v)) ** 2 - _i2(_jm(v), v) ** 2) * dyi
              + (rhoh1 * _i2(_jm(w_up), w_up) * _i2(v, v_up)
                 - rhoh * _i2(_jm(w), w) * _i2(v_dn, v)) / rho * dzi)

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
                - rhoh * ev_b2 * ((v - v_dn) * dzhi + (w - _jm(w)) * dyi)) / rho * dzi)
    vt_ref[0] = adv_v + dif_v


def _tend_wth_body(tPr, dxi, dyi, visc, svisc, has_thermo,
                   cc_ref,
                   um, uc, vm, vc, wm, wc, wp, thm, thc, thp,
                   em, ec, ep,
                   wt_ref, tht_ref):
    u_dn, u = um[0], uc[0]
    v_dn, v = vm[0], vc[0]
    w_dn, w, w_up = wm[0], wc[0], wp[0]
    e_dn, e, e_up = em[0], ec[0], ep[0]

    dzi = cc_ref[pl.program_id(0), C_DZI]
    dzhi = cc_ref[pl.program_id(0), C_DZHI]
    dzhi1 = cc_ref[pl.program_id(0), C_DZHI1]
    dzi_m1 = cc_ref[pl.program_id(0), C_DZI_M1]
    rho = cc_ref[pl.program_id(0), C_RHO]
    rhoh = cc_ref[pl.program_id(0), C_RHOH]
    rhoh1 = cc_ref[pl.program_id(0), C_RHOH1]
    threfh = cc_ref[pl.program_id(0), C_THREFH]

    # ---------------- w tendency (half level k) ----------------
    adv_w = -((_i2(_ip(u_dn), _ip(u)) * _i2(w, _ip(w))
               - _i2(u_dn, u) * _i2(_im(w), w)) * dxi
              + (_i2(_jp(v_dn), _jp(v)) * _i2(w, _jp(w))
                 - _i2(v_dn, v) * _i2(_jm(w), w)) * dyi
              + (rho * _i2(w, w_up) ** 2
                 - cc_ref[pl.program_id(0), C_Z] * _i2(w_dn, w) ** 2) / rhoh * dzhi)
    # C_Z slot reused for rho[k-1] in the tendency kernel.

    ev_xw = 0.25 * (_im(e_dn) + _im(e) + e_dn + e) + visc
    ev_yw = 0.25 * (_jm(e_dn) + _jm(e) + e_dn + e) + visc
    ev_tw = e + visc
    ev_bw = e_dn + visc
    dif_w = ((_ip(ev_xw) * ((_ip(w) - w) * dxi + (_ip(u) - _ip(u_dn)) * dzhi)
              - ev_xw * ((w - _im(w)) * dxi + (u - u_dn) * dzhi)) * dxi
             + (_jp(ev_yw) * ((_jp(w) - w) * dyi + (_jp(v) - _jp(v_dn)) * dzhi)
                - ev_yw * ((w - _jm(w)) * dyi + (v - v_dn) * dzhi)) * dyi
             + (rho * ev_tw * (w_up - w) * dzi
                - cc_ref[pl.program_id(0), C_Z] * ev_bw * (w - w_dn) * dzi_m1) / rhoh * 2. * dzhi)
    wt = adv_w + dif_w
    if has_thermo:
        th_dn, th = thm[0], thc[0]
        wt = wt + cst.grav / threfh * (_i2(th_dn, th) - threfh)
    wt_ref[0] = wt

    # ---------------- scalar (th) tendency ----------------
    if has_thermo:
        a = thc[0]
        a_dn, a_up = thm[0], thp[0]
        adv_s = -((_ip(u) * _i2(a, _ip(a)) - u * _i2(_im(a), a)) * dxi
                  + (_jp(v) * _i2(a, _jp(a)) - v * _i2(_jm(a), a)) * dyi
                  + (rhoh1 * w_up * _i2(a, a_up) - rhoh * w * _i2(a_dn, a)) / rho * dzi)
        se = 0.5 * (e + _ip(e)) / tPr + svisc
        sw_ = 0.5 * (_im(e) + e) / tPr + svisc
        sn = 0.5 * (e + _jp(e)) / tPr + svisc
        ss = 0.5 * (_jm(e) + e) / tPr + svisc
        st_ = 0.5 * (e + e_up) / tPr + svisc
        sb = 0.5 * (e_dn + e) / tPr + svisc
        dif_s = ((se * (_ip(a) - a) - sw_ * (a - _im(a))) * dxi * dxi
                 + (sn * (_jp(a) - a) - ss * (a - _jm(a))) * dyi * dyi
                 + (rhoh1 * st_ * (a_up - a) * dzhi1
                    - rhoh * sb * (a - a_dn) * dzhi) / rho * dzi)
        tht_ref[0] = adv_s + dif_s
    else:
        tht_ref[0] = jnp.zeros_like(u)


class FusedLES2:
    """Builder for the fused 2nd-order LES kernels on ghost-padded fields."""

    def __init__(self, ctx, smag, thermo, has_thermo, interpret=False):
        self.ctx = ctx
        self.interpret = interpret
        self.smag = smag
        self.thermo = thermo
        self.has_thermo = has_thermo
        ks, ke, kt = ctx.ks, ctx.ke, ctx.ktot

        # column constants, float32 arrays (ktot, N_CONST)
        cc_e = np.zeros((kt, N_CONST), dtype=np.float64)
        cc_t = np.zeros((kt, N_CONST), dtype=np.float64)
        g_dzi = np.asarray(ctx.dzi)
        g_dzhi = np.asarray(ctx.dzhi)
        rho = np.asarray(ctx.rhoref)
        rhoh = np.asarray(ctx.rhorefh)
        z = np.asarray(ctx.z)
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
            if has_thermo:
                thref = np.asarray(thermo.thref) if hasattr(thermo, "thref") else None
                threfh = np.asarray(thermo.threfh) if hasattr(thermo, "threfh") else None
                if thref is not None:
                    cc_e[k, C_THREFH] = thref[ka]   # evisc N2 uses full-level thref
                    cc_t[k, C_THREFH] = threfh[ka]  # buoyancy uses half-level
        self.cc_evisc = cc_e
        self.cc_tend = cc_t

    def _specs(self, n_fields, ks):
        """3 vertically-shifted (1, jtot, itot) views per field."""
        specs = []
        for _ in range(n_fields):
            for off in (-1, 0, 1):
                specs.append(pl.BlockSpec(
                    (1, self.ctx.jtot, self.ctx.itot),
                    functools.partial(lambda k, o: (k + ks + o, 0, 0), o=off),
                    memory_space=pltpu.VMEM))
        return specs

    def evisc(self, u, v, w, th):
        ctx = self.ctx
        ks, kt = ctx.ks, ctx.ktot
        body = functools.partial(_evisc_body, self.smag.tPr,
                                 float(ctx.dxi), float(ctx.dyi), self.has_thermo)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = [cc_spec] + self._specs(4, ks)
        th_in = th if th is not None else u
        out = pl.pallas_call(
            body,
            grid=(kt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, ctx.jtot, ctx.itot), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype),
            interpret=self.interpret,
        )(jnp.asarray(self.cc_evisc, dtype=u.dtype),
          u, u, u, v, v, v, w, w, w, th_in, th_in, th_in)
        return out  # interior levels only (ktot, jtot, itot)

    def _spec_at(self, off, ks):
        return pl.BlockSpec((1, self.ctx.jtot, self.ctx.itot),
                            functools.partial(lambda k, o: (k + ks + o, 0, 0), o=off),
                            memory_space=pltpu.VMEM)

    def tendencies(self, u, v, w, th, evisc_full):
        """Two passes (u,v) and (w,th) to stay inside the VMEM budget."""
        ctx = self.ctx
        ks, kt = ctx.ks, ctx.ktot
        svisc = self.smag.viscs.get("th", self.smag.visc) if self.has_thermo else self.smag.visc
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        th_in = th if th is not None else u
        shape = jax.ShapeDtypeStruct((kt, ctx.jtot, ctx.itot), u.dtype)
        out_spec = pl.BlockSpec((1, ctx.jtot, ctx.itot), lambda k: (k, 0, 0),
                                memory_space=pltpu.VMEM)
        cc = jnp.asarray(self.cc_tend, dtype=u.dtype)

        body_uv = functools.partial(_tend_uv_body, self.smag.tPr,
                                    float(ctx.dxi), float(ctx.dyi),
                                    self.smag.visc, self.has_thermo)
        specs_uv = [cc_spec] + [self._spec_at(o, ks) for o in
                                (-1, 0, 1, -1, 0, 1, 0, 1, -1, 0, 1)]
        ut, vt = pl.pallas_call(
            body_uv, grid=(kt,), in_specs=specs_uv,
            out_specs=[out_spec] * 2, out_shape=[shape] * 2,
            interpret=self.interpret,
        )(cc, u, u, u, v, v, v, w, w, evisc_full, evisc_full, evisc_full)

        body_wth = functools.partial(_tend_wth_body, self.smag.tPr,
                                     float(ctx.dxi), float(ctx.dyi),
                                     self.smag.visc, svisc, self.has_thermo)
        specs_wth = [cc_spec] + [self._spec_at(o, ks) for o in
                                 (-1, 0, -1, 0, -1, 0, 1, -1, 0, 1, -1, 0, 1)]
        wt, tht = pl.pallas_call(
            body_wth, grid=(kt,), in_specs=specs_wth,
            out_specs=[out_spec] * 2, out_shape=[shape] * 2,
            interpret=self.interpret,
        )(cc, u, u, v, v, w, w, w, th_in, th_in, th_in,
          evisc_full, evisc_full, evisc_full)
        return ut, vt, wt, tht


# ==========================================================================
#  Integration: fused substep tendencies with XLA row patches
# ==========================================================================

def _pad_k(ctx, interior):
    """(ktot, j, i) interior -> (kcells, j, i) with zero ghosts."""
    return jnp.pad(interior, ((ctx.ks, ctx.kcells - ctx.ke), (0, 0), (0, 0)))


def fused_exec_viscosity(fused, ctx, s, sfc, aux):
    """evisc via the Pallas kernel + surface bottom-row patch
    (diff_smag2.cxx calc_strain2 surface rows + calc_evisc bottom)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    th = s.get("th")
    ks = ctx.ks
    ev = fused.evisc(u, v, w, th)

    if smag.surface:
        dxi, dyi = ctx.dxi, ctx.dyi
        from .stencil import im, ip, jm, jp
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
        if fused.has_thermo:
            rit = jnp.minimum(sfc["dbdz_mo"] / s2b / smag.tPr, 1. - cst.dsmall)
            ev0 = smag.mlen2[0] * jnp.sqrt(s2b) * jnp.sqrt(1. - rit)
        else:
            ev0 = smag.mlen2[0] * jnp.sqrt(s2b)
        ev = ev.at[0].set(ev0)

    evisc = jnp.zeros_like(u)
    evisc = evisc.at[ctx.ks:ctx.ke].set(ev)
    evisc = evisc.at[ctx.ks - 1].set(ev[0])
    evisc = evisc.at[ctx.ke].set(ev[-1])
    aux = dict(aux)
    aux["evisc"] = evisc
    return aux


def fused_tendencies(fused, ctx, s, t, aux, sfc):
    """advec_2 + diff_smag2 + buoyancy in one Pallas pass, then patch the
    surface-model wall rows of the DIFFUSION part in XLA (the advection and
    buoyancy rows need no special casing)."""
    smag = fused.smag
    u, v, w = s["u"], s["v"], s["w"]
    th = s.get("th")
    evisc = aux["evisc"]
    ks, ke = ctx.ks, ctx.ke
    dxi, dyi = ctx.dxi, ctx.dyi
    visc = smag.visc

    ut, vt, wt, tht = fused.tendencies(u, v, w, th, evisc)
    wt = wt.at[0].set(0.)  # half level ks is the wall

    if smag.surface:
        from .stencil import im, ip, jm, jp
        e = evisc
        rho = ctx.rhoref
        rhoh = ctx.rhorefh
        dzi = ctx.dzi
        dzhi = ctx.dzhi

        def vert_patch_u(row, flux_sign_bot, name, e_corner):
            pass

        # ---- u bottom/top diffusion row patches (diff_smag2.cxx diff_u) ----
        for row, ka in (("bot", ks), ("top", ke - 1)):
            ev_t = 0.25 * (im(e)[ka] + e[ka] + im(e)[ka + 1] + e[ka + 1]) + visc
            ev_b = 0.25 * (im(e)[ka - 1] + e[ka - 1] + im(e)[ka] + e[ka]) + visc
            if row == "bot":
                fz_top = ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["u_fluxbot"]) / rho[ka] * dzi[ka]
            else:
                fz_bot = ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi)
                corr = (-rhoh[ka + 1] * 0. - rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
            # replace ONLY the vertical diffusion term: recompute the rest
            # of the row identically to the kernel and substitute.
            old_vert = ((rhoh[ka + 1] * ev_t * ((u[ka + 1] - u[ka]) * dzhi[ka + 1] + (w[ka + 1] - im(w[ka + 1])) * dxi)
                         - rhoh[ka] * ev_b * ((u[ka] - u[ka - 1]) * dzhi[ka] + (w[ka] - im(w[ka])) * dxi))
                        / rho[ka] * dzi[ka])
            idx = 0 if row == "bot" else ctx.ktot - 1
            ut = ut.at[idx].add(corr - old_vert)

        # ---- v rows ----
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
            idx = 0 if row == "bot" else ctx.ktot - 1
            vt = vt.at[idx].add(corr - old_vert)

        # ---- th rows ----
        if fused.has_thermo:
            svisc = smag.viscs.get("th", visc)
            a = th
            for row, ka in (("bot", ks), ("top", ke - 1)):
                st_ = 0.5 * (e[ka] + e[ka + 1]) / smag.tPr + svisc
                sb = 0.5 * (e[ka - 1] + e[ka]) / smag.tPr + svisc
                if row == "bot":
                    fz_top = st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                    corr = (rhoh[ka + 1] * fz_top + rhoh[ka] * sfc["th_fluxbot"]) / rho[ka] * dzi[ka]
                else:
                    fz_bot = sb * (a[ka] - a[ka - 1]) * dzhi[ka]
                    corr = (-rhoh[ka] * fz_bot) / rho[ka] * dzi[ka]
                old_vert = ((rhoh[ka + 1] * st_ * (a[ka + 1] - a[ka]) * dzhi[ka + 1]
                             - rhoh[ka] * sb * (a[ka] - a[ka - 1]) * dzhi[ka])
                            / rho[ka] * dzi[ka])
                idx = 0 if row == "bot" else ctx.ktot - 1
                tht = tht.at[idx].add(corr - old_vert)

    t = dict(t)
    t["u"] = t["u"] + _pad_k(ctx, ut)
    t["v"] = t["v"] + _pad_k(ctx, vt)
    t["w"] = t["w"] + _pad_k(ctx, wt)
    if fused.has_thermo:
        t["th"] = t["th"] + _pad_k(ctx, tht)
    return t
