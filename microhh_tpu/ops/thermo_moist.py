"""Moist thermodynamics: thl + qt with saturation adjustment.

Reference: ``src/thermo_moist.cxx`` + ``include/thermo_moist_functions.h``.

TPU re-design of the Newton saturation adjustment: the reference's
tolerance-terminated per-point loop (thermo_moist_functions.h:191-290)
becomes a fixed-count (10, the reference's nitermax) vectorized Newton over
whole fields, using the unified warm/cold formulation — the Tomita (2008)
water fraction alpha reduces exactly to the warm-only equations when
T >= T0, so a single branch-free update covers both regimes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as cst
from .stencil import i2

NITER_SAT_ADJUST = 10

# Taylor-expansion coefficients of the Arden Buck (1981) esat_liq
# (reference include/constants.h:73-83).
_ESAT_C = (6.1121000000E+02, 4.4393067270E+01, 1.4279398448E+00,
           2.6415206946E-02, 3.0291749160E-04, 2.1159987257E-06,
           7.5015702516E-09, -1.5604873363E-12, -9.9726710231E-14,
           -4.8165754883E-17, 1.3839187032E-18)


def _np_mod(x):
    return np if isinstance(x, (float, np.ndarray, np.floating)) else jnp


def esat_liq(T):
    m = _np_mod(T)
    x = m.maximum(-75., T - cst.T0)
    acc = _ESAT_C[-1]
    for c in _ESAT_C[-2::-1]:
        acc = c + x * acc
    return acc


def qsat_liq(p, T):
    es = esat_liq(T)
    return cst.ep * es / (p - (1. - cst.ep) * es)


def esat_ice(T):
    m = _np_mod(T)
    x = m.maximum(-100., T - cst.T0)
    return 611.15 * m.exp(22.452 * x / (272.55 + x))


def qsat_ice(p, T):
    es = esat_ice(T)
    return cst.ep * es / (p - (1. - cst.ep) * es)


def water_fraction(T):
    m = _np_mod(T)
    return m.clip((T - 233.15) / (cst.T0 - 233.15), 0., 1.)


def qsat(p, T):
    a = water_fraction(T)
    return a * qsat_liq(p, T) + (1. - a) * qsat_ice(p, T)


def dqsatdT_liq(p, T):
    es = esat_liq(T)
    den = p - es * (1. - cst.ep)
    return ((cst.ep / den - (1. + cst.ep) * cst.ep * es / den ** 2)
            * cst.Lv * es / (cst.Rv * T ** 2))


def dqsatdT_ice(p, T):
    es = esat_ice(T)
    den = p - es * (1. - cst.ep)
    return ((cst.ep / den + (1. - cst.ep) * cst.ep * es / den ** 2)
            * cst.Ls * es / (cst.Rv * T ** 2))


def dqsatdT(p, T):
    """Mixed-phase dqsat/dT (thermo_moist_functions.h:165-169)."""
    a = water_fraction(T)
    return a * dqsatdT_liq(p, T) + (1. - a) * dqsatdT_ice(p, T)


def exner(p):
    return (p / cst.p0) ** (cst.Rd / cst.cp)


def virtual_temperature(exn, thl, qt, ql, qi):
    th = thl + cst.Lv * ql / (cst.cp * exn) + cst.Ls * qi / (cst.cp * exn)
    return th * (1. - (1. - cst.Rv / cst.Rd) * qt - cst.Rv / cst.Rd * (ql + qi))


def virtual_temperature_no_ql(thl, qt):
    return thl * (1. - (1. - cst.Rv / cst.Rd) * qt)


def buoyancy(exn, thl, qt, ql, qi, thvref):
    return cst.grav * (virtual_temperature(exn, thl, qt, ql, qi) - thvref) / thvref


def buoyancy_no_ql(thl, qt, thvref):
    return cst.grav * (virtual_temperature_no_ql(thl, qt) - thvref) / thvref


def buoyancy_flux_no_ql(thl, thlflux, qt, qtflux, thvref):
    return cst.grav / thvref * (thlflux * (1. - (1. - cst.Rv / cst.Rd) * qt)
                                - (1. - cst.Rv / cst.Rd) * thl * qtflux)


def sat_adjust(thl, qt, p, exn, niter=NITER_SAT_ADJUST):
    """Vectorized saturation adjustment; returns (ql, qi, T, qs).

    Newton with the unified alpha-weighted formulation and the reference's
    stopping rule (|dT|/T <= 1e-5, at most ``niter`` rounds,
    thermo_moist_functions.h:191-220) applied as a masked MAX over the
    saturated points — a cloud-free field costs zero Newton rounds, a
    typical cloudy LES field 3-5 instead of the fixed ``niter`` (measured
    ~45 ms per call at 384^3 f32 under the fixed count; the transcendental
    chain per round is the whole cost).  The unsaturated mask
    short-circuits to (0, 0, tl, qsat_liq(tl)) exactly like the early
    return in the reference.
    """
    m = _np_mod(thl)
    tl = thl * exn
    qs0 = qsat_liq(p, tl)
    unsat = (qt - qs0) <= 0.

    def newton_step(t):
        a_w = water_fraction(t)
        a_i = 1. - a_w
        dalphadT = m.where((a_w > 0.) & (a_w < 1.), 0.025, 0.)
        qs_t = qsat(p, t)
        dqw = dqsatdT_liq(p, t)
        dqi = dqsatdT_ice(p, t)
        f = (t - tl - a_w * cst.Lv / cst.cp * qt - a_i * cst.Ls / cst.cp * qt
             + a_w * cst.Lv / cst.cp * qs_t + a_i * cst.Ls / cst.cp * qs_t)
        fp = (1.
              - dalphadT * cst.Lv / cst.cp * qt + dalphadT * cst.Ls / cst.cp * qt
              + dalphadT * cst.Lv / cst.cp * qs_t - dalphadT * cst.Ls / cst.cp * qs_t
              + a_w * cst.Lv / cst.cp * dqw + a_i * cst.Ls / cst.cp * dqi)
        return t - f / fp

    if m is np:
        t, t_old, it = tl, None, 0
        while it < niter and (t_old is None or float(
                np.max(np.where(unsat, 0., np.abs(t - t_old)
                                / np.maximum(np.abs(t_old), 1e-30)))) > 1e-5):
            t_old, t, it = t, newton_step(t), it + 1
    else:
        import jax

        def cond(carry):
            t, t_old, it = carry
            res = m.where(unsat, 0., m.abs(t - t_old)
                          / m.maximum(m.abs(t_old), 1e-30))
            return (m.max(res) > 1e-5) & (it < niter)

        def body(carry):
            t, _, it = carry
            return newton_step(t), t, it + 1

        t, _, _ = jax.lax.while_loop(
            cond, body, (tl, m.full_like(tl, 1e9), 0))

    a_w = water_fraction(t)
    qs_t = qsat(p, t)
    ql_qi = m.maximum(0., qt - qs_t)
    ql = m.where(unsat, 0., a_w * ql_qi)
    qi = m.where(unsat, 0., (1. - a_w) * ql_qi)
    T = m.where(unsat, tl, t)
    qs_out = m.where(unsat, qs0, qs_t)
    return ql, qi, T, qs_out


class ThermoMoist:
    def __init__(self, ini, grid, fields):
        self.grid = grid
        self.fields = fields
        fields.init_prognostic_field("thl", "Liquid water potential temperature", "K", "thermo")
        fields.init_prognostic_field("qt", "Total water mixing ratio", "kg kg-1", "thermo")
        fields.sp["thl"].visc = ini.get_float("fields", "svisc", subitem="thl")
        fields.sp["qt"].visc = ini.get_float("fields", "svisc", subitem="qt")

        sw = ini.get_str("thermo", "swbasestate", default="")
        if sw not in ("boussinesq", "anelastic"):
            raise ValueError('Invalid option for "swbasestate"')
        self.swbasestate = sw
        self.pbot = ini.get_float("thermo", "pbot")
        # reference default: hydrostatic pressure/exner follow the evolving
        # mean state every substep (thermo_moist.cxx:1279-1290).  The
        # density and thv references stay at their create() values (the
        # anelastic constraint; "pass dummy as thvref" comment upstream).
        self.swupdatebasestate = ini.get_bool("thermo", "swupdatebasestate",
                                              default=True)
        # time-dependent surface pressure (thermo_moist.cxx:1041,1407-1410):
        # p_sbot over time_surface, interpolated host-side each iteration
        # and consumed by the traced base-state update via the carried
        # surface state.
        self.swtimedep_pbot = ini.get_bool("thermo", "swtimedep_pbot",
                                           default=False)
        self.tdep_pbot = None
        # thvref0 is consumed only under boussinesq (thermo_moist.cxx:1232),
        # but the shipped anelastic cases (bomex/rcemip) carry it in the ini;
        # accept-and-ignore keeps the unused-option report clean.
        if sw == "boussinesq":
            self.thvref0 = ini.get_float("thermo", "thvref0")
        else:
            ini.get_float("thermo", "thvref0", default=0.)
        if grid.spatial_order == 4 and sw == "anelastic":
            raise ValueError("Anelastic mode is not supported for swspatialorder=4")

    @property
    def scalars(self):
        return ("thl", "qt")

    def update_timedep(self, sfc, itime):
        """Interpolate p_sbot at the current integer time into the carried
        surface state (thermo update_time_dependent)."""
        if self.tdep_pbot is None:
            return sfc
        sfc = dict(sfc)
        sfc["__pbot"] = jnp.asarray(float(self.tdep_pbot.interpolate(itime)))
        return sfc

    def _make_tdep_pbot(self, input_nc):
        if self.swtimedep_pbot:
            from ..timedep import Timedep
            self.tdep_pbot = Timedep(input_nc, "p_sbot", "time_surface")

    def create_basestate(self, input_nc):
        """Moist hydrostatic base state (thermo_moist_functions.h:293-350)."""
        self._make_tdep_pbot(input_nc)
        g = self.grid
        kc, ks, ke = g.kcells, g.kstart, g.kend
        thvref = np.zeros(kc)
        thvrefh = np.zeros(kc)
        pref = np.zeros(kc)
        prefh = np.zeros(kc)

        if self.swbasestate == "boussinesq":
            thvref[:] = self.thvref0
            thvrefh[:] = self.thvref0
            # hydrostatic pressure with constant thvref
            prefh[ks] = self.pbot
            pref[ks] = self.pbot * np.exp(-cst.grav * g.z[ks] / (cst.Rd * thvrefh[ks] * exner(prefh[ks])))
            for k in range(ks + 1, ke + 1):
                prefh[k] = prefh[k - 1] * np.exp(-cst.grav * g.dz[k - 1] / (cst.Rd * thvref[k - 1] * exner(pref[k - 1])))
                pref[k] = pref[k - 1] * np.exp(-cst.grav * g.dzh[k] / (cst.Rd * thvrefh[k] * exner(prefh[k])))
            pref[ks - 1] = 2. * prefh[ks] - pref[ks]
        else:
            init = input_nc.groups["init"]
            thl = np.zeros(kc)
            qt = np.zeros(kc)
            thl[ks:ke] = np.asarray(init.variables["thl"][:g.ktot], dtype=np.float64)
            qt[ks:ke] = np.asarray(init.variables["qt"][:g.ktot], dtype=np.float64)
            thl[ks - 1] = thl[ks]
            qt[ks - 1] = qt[ks]

            rho = np.ones(kc)
            rhoh = np.ones(kc)
            thlsurf = 0.5 * (thl[ks - 1] + thl[ks])
            qtsurf = 0.5 * (qt[ks - 1] + qt[ks])
            prefh[ks] = self.pbot
            exh = exner(prefh[ks])
            ql, qi, _, _ = sat_adjust(np.float64(thlsurf), np.float64(qtsurf),
                                      np.float64(self.pbot), np.float64(exh))
            thvrefh[ks] = virtual_temperature(exh, thlsurf, qtsurf, ql, qi)
            rhoh[ks] = self.pbot / (cst.Rd * exh * thvrefh[ks])
            pref[ks] = prefh[ks] * np.exp(-cst.grav * g.z[ks] / (cst.Rd * exh * thvrefh[ks]))
            for k in range(ks + 1, ke + 1):
                ex = exner(pref[k - 1])
                ql, qi, _, _ = sat_adjust(thl[k - 1], qt[k - 1], pref[k - 1], ex)
                thvref[k - 1] = virtual_temperature(ex, thl[k - 1], qt[k - 1], ql, qi)
                rho[k - 1] = pref[k - 1] / (cst.Rd * ex * thvref[k - 1])
                prefh[k] = prefh[k - 1] * np.exp(-cst.grav * g.dz[k - 1] / (cst.Rd * ex * thvref[k - 1]))
                exh = exner(prefh[k])
                thli = 0.5 * (thl[k - 1] + thl[k]) if k < ke else thl[k - 1]
                qti = 0.5 * (qt[k - 1] + qt[k]) if k < ke else qt[k - 1]
                ql, qi, _, _ = sat_adjust(thli, qti, prefh[k], exh)
                thvrefh[k] = virtual_temperature(exh, thli, qti, ql, qi)
                rhoh[k] = prefh[k] / (cst.Rd * exh * thvrefh[k])
                pref[k] = pref[k - 1] * np.exp(-cst.grav * g.dzh[k] / (cst.Rd * exh * thvrefh[k]))
            pref[ks - 1] = 2. * prefh[ks] - pref[ks]
            self.fields.rhoref = rho
            self.fields.rhorefh = rhoh

        self.thvref = thvref
        self.thvrefh = thvrefh
        self.pref = pref
        self.prefh = prefh
        self.exnref = exner(np.where(pref > 0., pref, cst.p0))
        self.exnrefh = exner(np.where(prefh > 0., prefh, cst.p0))

    def save_basestate(self, iotime, path="."):
        g = self.grid
        with open("%s/thermo_basestate.%07d" % (path, iotime), "wb") as f:
            for arr in (self.thvref, self.thvrefh, self.pref, self.prefh):
                arr[g.kstart:g.kend].tofile(f)

    # ------------------------------------------------------------------
    def update_basestate(self, ctx, s, aux, sfc=None):
        """Traced hydrostatic base-state update from the horizontal-mean
        thl/qt (thermo_moist_functions.h calc_base_state, sequential
        recurrence as a lax.scan).  Updated pref/prefh/exner profiles ride
        in aux for this substep's moist ops."""
        if not self.swupdatebasestate:
            return aux
        ks, ke = ctx.ks, ctx.ke
        thlm = jnp.mean(s["thl"], axis=(1, 2))
        qtm = jnp.mean(s["qt"], axis=(1, 2))
        dt_ = ctx.dtype
        if sfc is not None and "__pbot" in sfc:
            pbot = sfc["__pbot"].astype(dt_)
        else:
            pbot = dt_(self.pbot)

        # thermo_vapor's basestate is identical except condensate-free
        # (calc_base_state_no_ql, thermo_vapor.cxx:539) — ThermoVapor sets
        # _basestate_no_ql.
        if getattr(self, "_basestate_no_ql", False):
            def _thv(th, qt, p, ex):
                return virtual_temperature_no_ql(th, qt)
        else:
            def _thv(th, qt, p, ex):
                ql_, qi_, _, _ = sat_adjust(th, qt, p, ex)
                return virtual_temperature(ex, th, qt, ql_, qi_)

        thlsurf = 0.5 * (thlm[ks - 1] + thlm[ks])
        qtsurf = 0.5 * (qtm[ks - 1] + qtm[ks])
        exh_s = exner(pbot)
        thvh_s = _thv(thlsurf, qtsurf, pbot, exh_s)
        pref_ks = pbot * jnp.exp(-cst.grav * ctx.z[ks] / (cst.Rd * exh_s * thvh_s))

        thl_i = 0.5 * (thlm[ks:ke] + thlm[ks + 1:ke + 1])
        qt_i = 0.5 * (qtm[ks:ke] + qtm[ks + 1:ke + 1])

        def step(carry, xs):
            p_km1, ph_km1 = carry
            thl_km1, qt_km1, thli, qti, dz_km1, dzh_k = xs
            ex = exner(p_km1)
            thv = _thv(thl_km1, qt_km1, p_km1, ex)
            ph_k = ph_km1 * jnp.exp(-cst.grav * dz_km1 / (cst.Rd * ex * thv))
            exh_k = exner(ph_k)
            thvh = _thv(thli, qti, ph_k, exh_k)
            p_k = p_km1 * jnp.exp(-cst.grav * dzh_k / (cst.Rd * exh_k * thvh))
            return (p_k, ph_k), (p_k, ph_k)

        xs = (thlm[ks:ke], qtm[ks:ke], thl_i, qt_i,
              ctx.dz[ks:ke], ctx.dzh[ks + 1:ke + 1])
        _, (pref_seq, prefh_seq) = jax.lax.scan(step, (pref_ks, pbot), xs)

        pref = jnp.asarray(self.pref, dtype=dt_)
        prefh = jnp.asarray(self.prefh, dtype=dt_)
        pref = pref.at[ks].set(pref_ks).at[ks + 1:ke + 1].set(pref_seq)
        prefh = prefh.at[ks].set(pbot).at[ks + 1:ke + 1].set(prefh_seq)
        pref = pref.at[ks - 1].set(2. * prefh[ks] - pref[ks])
        aux["pref"] = pref
        aux["prefh"] = prefh
        aux["exnref"] = exner(pref)
        aux["exnrefh"] = exner(prefh)
        return aux

    def _p_profiles(self, ctx, aux):
        """(pref, exnref, prefh, exnrefh) — updated profiles from aux when
        swupdatebasestate is active, else the static create() base state."""
        if aux is not None and "pref" in aux:
            return aux["pref"], aux["exnref"], aux["prefh"], aux["exnrefh"]
        return (jnp.asarray(self.pref, dtype=ctx.dtype),
                jnp.asarray(self.exnref, dtype=ctx.dtype),
                jnp.asarray(self.prefh, dtype=ctx.dtype),
                jnp.asarray(self.exnrefh, dtype=ctx.dtype))

    def exec(self, ctx, s, t, aux):
        """wt += moist buoyancy with sat adjust at half levels
        (thermo_moist.cxx:78-120)."""
        ks, ke = ctx.ks, ctx.ke
        thl, qt = s["thl"], s["qt"]
        thlh = i2(thl[ks:ke - 1], thl[ks + 1:ke])
        qth = i2(qt[ks:ke - 1], qt[ks + 1:ke])
        _, _, prefh_a, exnrefh_a = self._p_profiles(ctx, aux)
        ph = prefh_a[ks + 1:ke][:, None, None]
        exnh = exnrefh_a[ks + 1:ke][:, None, None]
        thvrefh = jnp.asarray(self.thvrefh, dtype=ctx.dtype)[ks + 1:ke][:, None, None]
        ql, qi, _, _ = sat_adjust(thlh, qth, ph, exnh)
        t = dict(t)
        t["w"] = t["w"].at[ks + 1:ke].add(buoyancy(exnh, thlh, qth, ql, qi, thvrefh))
        return t

    def get_buoyancy(self, ctx, s):
        """Full-level buoyancy with condensation (calc_buoyancy)."""
        ks, ke = ctx.ks, ctx.ke
        thl, qt = s["thl"], s["qt"]
        p = jnp.asarray(self.pref, dtype=ctx.dtype)[:, None, None]
        exn = jnp.asarray(self.exnref, dtype=ctx.dtype)[:, None, None]
        thvref = jnp.asarray(self.thvref, dtype=ctx.dtype)[:, None, None]
        ql, qi, _, _ = sat_adjust(thl[ks:ke], qt[ks:ke], p[ks:ke], exn[ks:ke])
        b = jnp.zeros_like(thl)
        b = b.at[ks:ke].set(buoyancy(exn[ks:ke], thl[ks:ke], qt[ks:ke], ql, qi, thvref[ks:ke]))
        return b

    def get_ql(self, ctx, s, aux=None):
        ks, ke = ctx.ks, ctx.ke
        pref_a, exnref_a, _, _ = self._p_profiles(ctx, aux)
        p = pref_a[ks:ke][:, None, None]
        exn = exnref_a[ks:ke][:, None, None]
        ql, qi, _, _ = sat_adjust(s["thl"][ks:ke], s["qt"][ks:ke], p, exn)
        return ql

    def get_ql_qi(self, ctx, s, aux=None):
        """(ql, qi) interior fields (thermo_moist.cxx get_thermo_field
        "ql"/"qi" dispatch)."""
        ks, ke = ctx.ks, ctx.ke
        pref_a, exnref_a, _, _ = self._p_profiles(ctx, aux)
        p = pref_a[ks:ke][:, None, None]
        exn = exnref_a[ks:ke][:, None, None]
        ql, qi, _, _ = sat_adjust(s["thl"][ks:ke], s["qt"][ks:ke], p, exn)
        return ql, qi

    def get_n2(self, ctx, s):
        """N2 from thl like the reference calc_N2 (thermo_moist.cxx:460-478)."""
        ks, ke = ctx.ks, ctx.ke
        thl = s["thl"]
        thvref = jnp.asarray(self.thvref, dtype=ctx.dtype)[ks:ke][:, None, None]
        return (cst.grav / thvref * 0.5 * (thl[ks + 1:ke + 1] - thl[ks - 1:ke - 1])
                * ctx.dzi[ks:ke][:, None, None])

    def get_buoyancy_fluxbot(self, ctx, s, sfc):
        ks = ctx.ks
        return buoyancy_flux_no_ql(s["thl"][ks], sfc["thl_fluxbot"],
                                   s["qt"][ks], sfc["qt_fluxbot"],
                                   self.thvrefh[ks])

    def get_buoyancy_surf(self, ctx, s, sfc):
        ks = ctx.ks
        b = buoyancy_no_ql(s["thl"][ks], s["qt"][ks], self.thvref[ks])
        bbot = buoyancy_no_ql(sfc["thl_bot"], sfc["qt_bot"], self.thvrefh[ks])
        return b, bbot

    def get_db_ref(self):
        ks = self.grid.kstart
        return cst.grav / self.thvref[ks] * (self.thvref[ks] - self.thvrefh[ks])

    def get_time_limit_rate(self, ctx, s):
        return None
