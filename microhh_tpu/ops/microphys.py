"""Seifert-Beheng two-moment warm-rain microphysics
(reference ``src/microphys_2mom_warm.cxx``; SB06 = Seifert & Beheng 2006,
SS08 = Stevens & Seifert 2008).

Prognostic rain mass qr and number nr.  TPU re-design notes:

* every conversion kernel is branch-free ``jnp.where`` masking over whole
  fields instead of per-point ``if (ql > ql_min)``;
* the SS08 sedimentation's data-dependent while-loop (flux accumulated over
  the cells a drop crosses in one dt) becomes a FIXED unrolled sweep of
  ``NSED`` shifted passes (the sedimentation CFL is capped at
  ``[micro] cflmax`` (default 2) by its dt limit, so 4 cells suffice),
  followed by a downward ``lax.scan`` applying the positivity flux limiter
  (which couples levels sequentially).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as cst
from .thermo_moist import esat_liq, qsat_liq

# SB06 constants (reference include/microphys_2mom_warm.h:55-70)
RHO_0 = 1.225
QL_MIN = 1.e-6
QR_MIN = 1.e-15
X_STAR = 2.6e-10
PIRHOW = np.pi * cst.rho_w / 6.
MR_MIN = 2.6e-10  # mr_min = mc_max (microphys_2mom_warm.h:62-63)
MR_MAX = 3e-6
D_V = 3.e-5       # diffusivity of water vapor [m2 s-1] (constants.h D_v)
K_T = 2.5e-2      # thermal conductivity of air  (constants.h K_t)

NSED = 4          # unrolled sedimentation sweep depth (cflmax<=2 -> 3 safe)

# SS08 rain fall-speed constants (microphys_2mom_warm.cxx:441-447)
W_MAX, A_R, C_R = 9.65, 9.65, 600.
B_R = A_R * np.exp(C_R * 25.0e-6)


def _sedi_pow_pair(mur, lamr):
    """The qr/nr fall speeds share the pow base (1 + c_R/lamr); their
    exponents differ by exactly 3, so one log + one exp + an integer cube
    replaces two full variable-exponent pows (the pow pair was the largest
    single item in the measured 2mom transcendental budget,
    ARCHITECTURE.md moist table)."""
    b = 1. + C_R / lamr
    p4 = jnp.exp(-(mur + 4.) * jnp.log(b))
    return p4, p4 * (b * b * b)


# ==========================================================================
#  Stevens & Seifert (2008) slope-limited sedimentation, shared by the
#  2-moment warm scheme and the NSW6 ice scheme (microphys_nsw6.cxx:687-825).
# ==========================================================================

def ss08_cfl(ctx, w_qc, dt):
    """Half-weights-interpolated sedimentation CFL per cell from the
    cell-center fall velocity w_qc (ktot, j, i)."""
    ks, ke = ctx.ks, ctx.ke
    dzi = ctx.dzi[ks:ke][:, None, None]
    wp = jnp.concatenate([w_qc[:1], w_qc, jnp.zeros_like(w_qc[:1])], axis=0)
    return 0.25 * (wp[:-2] + 2. * wp[1:-1] + wp[2:]) * dzi * dt


def ss08_flux_tendency(ctx, a, c, rho, dt, dzi_at_out=False, nsed=NSED):
    """Limited SS08 flux divergence: returns (tendency, surface_flux>0).

    The reference's data-dependent while loop over the cells a particle
    crosses in one dt (microphys_nsw6.cxx:786-797) is a fixed NSED-deep
    unrolled sweep of shifted adds; the downward positivity limiter (which
    couples levels sequentially) is a lax.scan.

    The cc carried to the next cell is ``min(1, c[cell m] - dzz*dzi[cell
    m+1])`` — the reference reads c at the cell it just LEFT (ikk/ijkc are
    computed before the kk increment, microphys_2mom_warm.cxx:480-487,
    microphys_nsw6.cxx:789-796).  ``dzi_at_out`` mirrors the 2mom nr loop's
    quirk of using dzi at the fixed output row instead
    (microphys_2mom_warm.cxx:508, ``dzz*dzi[k]``)."""
    ks, ke = ctx.ks, ctx.ke
    dzi = ctx.dzi[ks:ke][:, None, None]
    dz = ctx.dz[ks:ke][:, None, None]

    def minmod(x, y):
        return jnp.sign(x) * jnp.maximum(0., jnp.minimum(jnp.abs(x), jnp.sign(x) * y))

    a_dn = jnp.concatenate([a[:1], a[:-1]], axis=0)
    a_up = jnp.concatenate([a[1:], a[-1:]], axis=0)
    sl = minmod(a - a_dn, a_up - a)

    def shift_up(x, m):
        if m == 0:
            return x
        return jnp.concatenate([x[m:], jnp.zeros((m,) + x.shape[1:], x.dtype)],
                               axis=0)

    rho_b = jnp.broadcast_to(rho, a.shape)
    dz_b = jnp.broadcast_to(dz, a.shape)
    dzi_b = jnp.broadcast_to(dzi, a.shape)
    c_b = jnp.broadcast_to(c, a.shape)
    ftot = jnp.zeros_like(a)
    dzz = jnp.zeros_like(a)
    cc = jnp.minimum(1., c)
    for m in range(nsed):
        active = cc > 0.
        ftot = ftot + jnp.where(
            active,
            shift_up(rho_b, m) * (shift_up(a, m) + 0.5 * shift_up(sl, m) * (1. - cc))
            * cc * shift_up(dz_b, m), 0.)
        dzz = dzz + jnp.where(active, shift_up(dz_b, m), 0.)
        dzi_next = dzi_b if dzi_at_out else shift_up(dzi_b, m + 1)
        cc = jnp.where(active,
                       jnp.minimum(1., shift_up(c_b, m) - dzz * dzi_next), 0.)

    mass = rho_b * dz_b * a

    # Downward positivity limiter.  The reference couples levels
    # sequentially: ft_k = min(fr_k, ms_k + ft_above) marching down from
    # the top (ft_above = 0 there).  Unrolling the recurrence gives the
    # exact closed form ft = S + min(0, cummin(fr - S)) with S the
    # running (top-down) cumsum of ms — log-depth prefix ops instead of a
    # ktot-iteration lax.scan of per-plane kernels (which dominated the
    # moist step cost on TPU).
    fr = ftot[::-1]
    S = jnp.cumsum(mass[::-1], axis=0)
    ft = S + jnp.minimum(0., jax.lax.cummin(fr - S, axis=0))
    flux = (-ft / dt)[::-1]
    flux_top = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
    tend = -(flux_top - flux) / rho_b * dzi
    return tend, -flux[0]


def _tanh2(x):
    """Rational tanh approximation (microphys_2mom_warm.h:74-78) — NOT a
    true tanh: it diverges like x/9 for large |x|, and the reference's
    mu_r inherits that tail, so we must use the same form."""
    return x * (27. + x * x) / (27. + 9. * x * x)


def calc_rain_props(qr, nr, rho):
    """mean mass, diameter, shape mu_r, slope lambda_r."""
    mr = rho * qr / jnp.maximum(nr, 1.)
    mr = jnp.clip(mr, MR_MIN, MR_MAX)
    dr = (mr / PIRHOW) ** (1. / 3.)
    mur = 10. * (1. + _tanh2(1200. * (dr - 0.0015)))
    lamr = ((mur + 3.) * (mur + 2.) * (mur + 1.)) ** (1. / 3.) / dr
    return mr, dr, mur, lamr


class Microphys2momWarm:
    sw = "2mom_warm"

    def __init__(self, ini, grid, fields):
        self.grid = grid
        self.fields = fields
        self.cflmax = ini.get_float("micro", "cflmax", default=2.)
        self.Nc0 = ini.get_float("micro", "Nc0")
        self.swmicrobudget = ini.get_bool("micro", "swmicrobudget", default=False)
        fields.init_prognostic_field("qr", "Rain water mixing ratio", "kg kg-1", "micro")
        fields.init_prognostic_field("nr", "Number density rain", "m-3", "micro")
        fields.sp["qr"].visc = ini.get_float("fields", "svisc", subitem="qr")
        fields.sp["nr"].visc = ini.get_float("fields", "svisc", subitem="nr")
        self.thermo = None  # wired by Model
        self._fused = None
        self.force_fused = None  # tests: True forces the Pallas kernel
        self.mesh = None    # set by Model.set_mesh (shard_map wrap)

    def _maybe_fused(self, ctx):
        """Fused Pallas kernel (one HBM pass for the whole scheme) on TPU
        f32; the jnp pipeline stays for CPU/f64 and oversized planes."""
        import os
        if os.environ.get("MICROHH_MICRO_FUSED", "1") != "1":
            return None
        # getattr: oracle tests build bare instances via __new__
        force = getattr(self, "force_fused", None)
        if force is False:
            return None
        if getattr(self, "_fused", None) is not None:
            return self._fused
        import jax as _jax
        interpret = _jax.default_backend() != "tpu"
        if interpret and not force:
            return None
        if np.dtype(ctx.dtype) == np.float64 and not interpret:
            return None  # Mosaic f64 (see model._maybe_build_fused)
        from .microphys_pallas import Micro2Fused
        fused = Micro2Fused(self, ctx, interpret=interpret)
        if not fused.vmem_ok():
            return None
        self._fused = fused
        return fused

    def exec(self, ctx, s, t, aux, dt):
        fused = self._maybe_fused(ctx)
        if fused is not None:
            return fused.exec(ctx, s, t, aux, dt)
        ks, ke = ctx.ks, ctx.ke
        thermo = self.thermo
        ql = thermo.get_ql(ctx, s, aux)                # (ktot,...)
        qr = s["qr"][ks:ke]
        nr = s["nr"][ks:ke]
        qt = s["qt"][ks:ke]
        thl = s["thl"][ks:ke]
        rho = ctx.rhoref[ks:ke][:, None, None]
        pref_a, exnref_a, _, _ = thermo._p_profiles(ctx, aux)
        exner = exnref_a[ks:ke][:, None, None]
        p = pref_a[ks:ke][:, None, None]

        qrt = jnp.zeros_like(qr)
        nrt = jnp.zeros_like(qr)
        qtt = jnp.zeros_like(qr)
        thlt = jnp.zeros_like(qr)

        lv_cpe = cst.Lv / (cst.cp * exner)

        # ---- autoconversion (SB06 eq 4; microphys_2mom_warm.cxx:93-128) ----
        nu_c, k_cc = 1., 9.44e9
        kccxs = k_cc / (20. * X_STAR) * (nu_c + 2.) * (nu_c + 4.) / (nu_c + 1.) ** 2
        has_ql = ql > QL_MIN
        xc = rho * ql / self.Nc0
        tau = 1. - ql / (ql + qr + cst.dsmall)
        phi_au = 600. * tau ** 0.68 * (1. - tau ** 0.68) ** 3
        au = RHO_0 * kccxs * ql ** 2 * xc ** 2 * (1. + phi_au / (1. - tau) ** 2)
        au = jnp.where(has_ql, au, 0.)
        qrt += au
        nrt += au * rho / X_STAR
        qtt -= au
        thlt += lv_cpe * au

        # ---- accretion (SB06 eq 7) ----
        # the reference recomputes tau here WITHOUT dsmall (:149); the
        # ql/qr > 0 mask keeps the quotient well-defined
        has_both = has_ql & (qr > QR_MIN)
        tau_ac = 1. - ql / jnp.maximum(ql + qr, cst.dsmall)
        phi_ac = (tau_ac / (tau_ac + 5e-5)) ** 4
        ac = 5.25 * ql * qr * phi_ac * jnp.sqrt(RHO_0 / rho)
        ac = jnp.where(has_both, ac, 0.)
        qrt += ac
        qtt -= ac
        thlt += lv_cpe * ac

        # ---- rain properties ----
        mr, dr, mur, lamr = calc_rain_props(qr, nr, rho)
        has_qr = qr > QR_MIN

        # ---- evaporation ----
        T = thl * exner + cst.Lv * ql / (cst.cp * exner)
        Glv = 1. / (cst.Rv * T / (esat_liq(T) * D_V)
                    + (cst.Lv / (K_T * T)) * (cst.Lv / (cst.Rv * T) - 1.))
        S = (qt - ql) / qsat_liq(p, T) - 1.
        ev = 2. * np.pi * dr * Glv * S * nr / rho
        ev = jnp.where(has_qr, ev, 0.)
        qrt += ev
        nrt += 1.0 * ev * rho / mr
        qtt -= ev
        thlt += lv_cpe * ev

        # ---- selfcollection & breakup (SB06 p49-50) ----
        k_rr, kappa_rr, D_eq = 7.12, 60.7, 0.9e-3
        sc = (-k_rr * nr * qr * rho
              / (1. + kappa_rr / lamr * PIRHOW ** (1. / 3.)) ** 9
              * jnp.sqrt(RHO_0 / rho))
        sc = jnp.where(has_qr, sc, 0.)
        dDr = dr - D_eq
        phi_br = jnp.where(dr <= D_eq, 1.0e3 * dDr, 2. * jnp.exp(2.3e3 * dDr) - 1.)
        br = jnp.where(has_qr & (dr > 0.35e-3), -(phi_br + 1.) * sc, 0.)
        nrt += sc + br

        # ---- sedimentation (SS08) ----
        qrt_s, nrt_s, rr_bot = self._sedimentation(ctx, qr, nr, mur, lamr, rho, dt)
        qrt += qrt_s
        nrt += nrt_s

        t = dict(t)
        t["qr"] = t["qr"].at[ks:ke].add(qrt)
        t["nr"] = t["nr"].at[ks:ke].add(nrt)
        t["qt"] = t["qt"].at[ks:ke].add(qtt)
        t["thl"] = t["thl"].at[ks:ke].add(thlt)
        aux = dict(aux)
        aux["rr_bot"] = rr_bot
        return t, aux

    def _sedimentation(self, ctx, qr, nr, mur, lamr, rho, dt):
        ks, ke = ctx.ks, ctx.ke
        kt = ke - ks
        rho_n = jnp.sqrt(1.2 / rho)
        has_qr = qr > QR_MIN
        p4, p1 = _sedi_pow_pair(mur, lamr)
        w_qr = jnp.where(has_qr, jnp.clip(rho_n * A_R - B_R * p4, 0.1, W_MAX), 0.)
        w_nr = jnp.where(has_qr, jnp.clip(rho_n * A_R - B_R * p1, 0.1, W_MAX), 0.)

        c_qr = ss08_cfl(ctx, w_qr, dt)
        c_nr = ss08_cfl(ctx, w_nr, dt)
        # the dt limit keeps the sedimentation CFL <= cflmax, so a drop
        # crosses at most ceil(cflmax)+1 cells per step
        nsed = int(np.ceil(self.cflmax)) + 2
        qrt_s, rr_bot = ss08_flux_tendency(ctx, qr, c_qr, rho, dt, nsed=nsed)
        # quirk: the reference nr loop advances cc with dzi at the output
        # row (microphys_2mom_warm.cxx:508), unlike the qr loop.
        nrt_s, _ = ss08_flux_tendency(ctx, nr, c_nr, rho, dt,
                                      dzi_at_out=True, nsed=nsed)
        return qrt_s, nrt_s, rr_bot

    def get_time_limit_rate(self, ctx, s):
        """Max sedimentation velocity * dzi; host multiplies by dt and
        compares against cflmax (calc_max_sedimentation_cfl)."""
        ks, ke = ctx.ks, ctx.ke
        qr = s["qr"][ks:ke]
        nr = s["nr"][ks:ke]
        rho = ctx.rhoref[ks:ke][:, None, None]
        mr, dr, mur, lamr = calc_rain_props(qr, nr, rho)
        p4, _ = _sedi_pow_pair(mur, lamr)
        w_qr = jnp.where(qr > QR_MIN,
                         jnp.clip(A_R - B_R * p4, 0.1, W_MAX), 0.)
        rate = jnp.max(w_qr * ctx.dzi[ks:ke][:, None, None])
        return jnp.maximum(rate, 1e-5)


class MicrophysDisabled:
    sw = "0"

    def __init__(self, *a, **k):
        self.thermo = None

    def exec(self, ctx, s, t, aux, dt):
        return t, aux

    def get_time_limit_rate(self, ctx, s):
        return None


def make_microphys(ini, grid, fields):
    sw = ini.get_str("micro", "swmicro", default="0")
    if sw in ("0", "false"):
        return MicrophysDisabled()
    if sw == "2mom_warm":
        return Microphys2momWarm(ini, grid, fields)
    if sw == "nsw6":
        from .microphys_nsw6 import MicrophysNsw6
        return MicrophysNsw6(ini, grid, fields)
    raise ValueError("%s is an illegal value for swmicro" % sw)
