"""Tomita (2008) NSW6 single-moment 6-class ice microphysics.

Reference: ``src/microphys_nsw6.cxx`` (conversion terms :125-650, SS08
sedimentation :687-825, dt limit :1063-1130).  Prognostic rain qr, snow qs
and graupel qg on top of the moist thermo's (thl, qt); cloud water/ice come
diagnostically from the saturation adjustment.

TPU re-design: the per-point kernel with early ``continue`` and scalar
branches becomes one branch-free vectorized pass — presence masks are
``jnp.where`` factors, the two-sided availability limiter is a pair of
elementwise clamp/scale passes, and all Γ-function factors are Python-time
constants.  Sedimentation reuses the shared SS08 machinery in microphys.py
(fixed unrolled sweep + downward ``lax.scan`` positivity limiter).
"""

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from .thermo_moist import esat_liq, esat_ice, qsat_liq, qsat_ice
from .microphys import ss08_cfl, ss08_flux_tendency

# thresholds (microphys_nsw6.cxx:45-52)
QV_MIN = 1.e-7
QL_MIN = 1.e-7
QI_MIN = 1.e-7
QR_MIN = 1.e-12
QS_MIN = 1.e-12
QG_MIN = 1.e-12
Q_TINY = 1.e-15

# particle properties (Tomita 2008 Table 1; microphys_nsw6.cxx:57-115)
RHO_W, RHO_S, RHO_G = 1.e3, 1.e2, 4.e2
N_0R, N_0S, N_0G = 8.e6, 3.e6, 4.e6
A_R, A_S, A_G = math.pi * RHO_W / 6., math.pi * RHO_S / 6., math.pi * RHO_G / 6.
B_R = B_S = B_G = 3.
C_R, C_S, C_G = 130., 4.84, 82.5
D_R, D_S, D_G = 0.5, 0.25, 0.5
C_I, C_L = 2006., 4218.
F_1R, F_1S, F_1G = 0.78, 0.65, 0.78
F_2R, F_2S, F_2G = 0.27, 0.39, 0.27
E_RI, E_RW, E_SW, E_GW, E_GI, E_SR, E_GR = 1., 1., 1., 1., 0.1, 1., 0.1
K_A = 2.43e-2
K_D = 2.26e-5
M_I = 4.19e-13
BETA_SAUT, BETA_GAUT = 6.e-3, 0.e-3
GAMMA_SACR, GAMMA_SAUT, GAMMA_GACS, GAMMA_GAUT = 25.e-3, 60.e-3, 90.e-3, 90.e-3
NU_AIR = 1.5e-5

_G = math.gamma


def _lambda(a_c, n_0c, b_c, rho, qc):
    """Marshall-Palmer slope, Tomita Eq. 27."""
    return (a_c * n_0c * _G(b_c + 1.) / (rho * (qc + Q_TINY))) ** (1. / (b_c + 1.))


def _v_term(c_c, b_c, d_c, rho0_rho_sqrt, lam, mask):
    """Mass-weighted fall speed, Tomita Eq. 28."""
    return jnp.where(mask,
                     c_c * rho0_rho_sqrt * _G(b_c + d_c + 1.) / _G(b_c + 1.)
                     * lam ** (-d_c), 0.)


def _vent_sum(f1, f2, c_c, d_c, rho0_rho_sqrt, lam):
    """Ventilation bracket common to evaporation/deposition/melting."""
    return (f1 * _G(2.) / lam ** 2
            + f2 * jnp.sqrt(c_c * rho0_rho_sqrt / NU_AIR)
            * _G(0.5 * (5. + d_c)) / lam ** (0.5 * (5. + d_c)))


class MicrophysNsw6:
    sw = "nsw6"

    def __init__(self, ini, grid, fields):
        self.grid = grid
        self.fields = fields
        self.cflmax = ini.get_float("micro", "cflmax", default=1.2)
        self.Nc0 = ini.get_float("micro", "Nc0")
        for name, ln in (("qr", "Rain water specific humidity"),
                         ("qs", "Snow specific humidity"),
                         ("qg", "Graupel specific humidity")):
            fields.init_prognostic_field(name, ln, "kg kg-1", "thermo")
            fields.sp[name].visc = ini.get_float("fields", "svisc", subitem=name)
        self.thermo = None  # wired by Model

    # -- conversion terms ---------------------------------------------------
    def _conversion(self, ctx, s, dt, aux=None):
        ks, ke = ctx.ks, ctx.ke
        thermo = self.thermo
        ql, qi = thermo.get_ql_qi(ctx, s, aux)
        qr, qs_, qg = s["qr"][ks:ke], s["qs"][ks:ke], s["qg"][ks:ke]
        qt, thl = s["qt"][ks:ke], s["thl"][ks:ke]
        rho = ctx.rhoref[ks:ke][:, None, None]
        pref_a, exnref_a, _, _ = thermo._p_profiles(ctx, aux)
        exn = exnref_a[ks:ke][:, None, None]
        p = pref_a[ks:ke][:, None, None]
        rr = jnp.sqrt(ctx.rhoref[ks] / rho)  # sqrt(rho0/rho), column

        Nc0 = self.Nc0
        # Tomita Eq. 51 (Nc0 converted from SI m-3 to cm-3).
        D_d = 0.146 - 5.964e-2 * math.log((Nc0 * 1.e-6) / 2.e3)

        T = exn * thl + cst.Lv / cst.cp * ql + cst.Ls / cst.cp * qi
        qv = qt - ql - qi
        T_pos = (T >= cst.T0).astype(T.dtype)
        T_neg = 1. - T_pos

        has_vap = qv > QV_MIN
        has_liq = ql > QL_MIN
        has_ice = qi > QI_MIN
        has_rain = qr > QR_MIN
        has_snow = qs_ > QS_MIN
        has_grau = qg > QG_MIN

        lam_r = _lambda(A_R, N_0R, B_R, rho, qr)
        lam_s = _lambda(A_S, N_0S, B_S, rho, qs_)
        lam_g = _lambda(A_G, N_0G, B_G, rho, qg)

        V_Tr = _v_term(C_R, B_R, D_R, rr, lam_r, has_rain)
        V_Ts = _v_term(C_S, B_S, D_S, rr, lam_s, has_snow)
        V_Tg = _v_term(C_G, B_G, D_G, rr, lam_g, has_grau)

        def w(mask, x):
            return jnp.where(mask, x, 0.)

        # ACCRETION (Tomita Eq. 29-38)
        fac_iacr = (math.pi ** 2 * E_RI * N_0R * C_R * RHO_W * _G(6. + D_R)
                    / (24. * M_I)) * rr
        fac_raci = (math.pi * E_RI * N_0R * C_R * _G(3. + D_R) / 4.) * rr
        fac_racw = (math.pi * E_RW * N_0R * C_R * _G(3. + D_R) / 4.) * rr
        fac_sacw = (math.pi * E_SW * N_0S * C_S * _G(3. + D_S) / 4.) * rr
        fac_saci = (math.pi * N_0S * C_S * _G(3. + D_S) / 4.) * rr
        fac_gacw = (math.pi * E_GW * N_0G * C_G * _G(3. + D_G) / 4.) * rr
        fac_gaci = (math.pi * E_GI * N_0G * C_G * _G(3. + D_G) / 4.) * rr

        P_iacr = w(has_rain & has_ice, fac_iacr / lam_r ** (6. + D_R) * qi)
        delta_1 = (qr >= 1.e-4).astype(T.dtype)        # Eq. 30
        P_iacr_s = (1. - delta_1) * P_iacr
        P_iacr_g = delta_1 * P_iacr
        P_raci = w(has_rain & has_ice, fac_raci / lam_r ** (3. + D_R) * qi)
        P_raci_s = (1. - delta_1) * P_raci
        P_raci_g = delta_1 * P_raci
        P_racw = w(has_liq & has_rain, fac_racw / lam_r ** (3. + D_R) * ql)
        P_sacw = w(has_liq & has_snow, fac_sacw / lam_s ** (3. + D_S) * ql)
        E_si = jnp.exp(GAMMA_SACR * (T - cst.T0))      # Eq. 39
        P_saci = w(has_snow & has_ice, fac_saci * E_si / lam_s ** (3. + D_S) * qi)
        P_gacw = w(has_grau & has_liq, fac_gacw / lam_g ** (3. + D_G) * ql)
        P_gaci = w(has_grau & has_ice, fac_gaci / lam_g ** (3. + D_G) * qi)

        # falling-hydrometeor collection (Tomita Eq. 41-49)
        delta_2 = 1. - ((qr >= 1.e-4) | (qs_ >= 1.e-4)).astype(T.dtype)

        def coll(a_x, n_0x, n_0y, b_x, lam_x, lam_y, dV, E_xy):
            return (math.pi * a_x * dV * E_xy * n_0x * n_0y / (4. * rho)
                    * (_G(b_x + 3.) * _G(1.) / (lam_x ** (b_x + 3.) * lam_y)
                       + 2. * _G(b_x + 2.) * _G(2.) / (lam_x ** (b_x + 2.) * lam_y ** 2)
                       + _G(b_x + 1.) * _G(3.) / (lam_x ** (b_x + 1.) * lam_y ** 3)))

        P_racs = w(has_rain & has_snow,
                   (1. - delta_2) * coll(A_S, N_0S, N_0R, B_S, lam_s, lam_r,
                                         jnp.abs(V_Tr - V_Ts), E_SR))
        P_sacr = w(has_snow & has_rain,
                   coll(A_R, N_0R, N_0S, B_R, lam_r, lam_s,
                        jnp.abs(V_Ts - V_Tr), E_SR))
        P_sacr_g = (1. - delta_2) * P_sacr
        P_sacr_s = delta_2 * P_sacr
        E_gs = jnp.minimum(1., jnp.exp(GAMMA_GACS * (T - cst.T0)))
        P_gacr = w(has_grau & has_rain,
                   coll(A_R, N_0R, N_0G, B_R, lam_r, lam_g,
                        jnp.abs(V_Tg - V_Tr), E_GR))
        P_gacs = w(has_grau & has_snow,
                   coll(A_S, N_0S, N_0G, B_S, lam_s, lam_g,
                        jnp.abs(V_Tg - V_Ts), 1.) * E_gs)

        # AUTOCONVERSION (Tomita Eq. 50-54)
        q_scrt = 6.e-4
        beta_1 = jnp.minimum(BETA_SAUT, BETA_SAUT * jnp.exp(GAMMA_SAUT * (T - cst.T0)))
        beta_2 = jnp.minimum(BETA_GAUT, BETA_GAUT * jnp.exp(GAMMA_GAUT * (T - cst.T0)))
        # no epsilon in the inner denominator (microphys_nsw6.cxx:333): at
        # ql==0 the expression is 0/inf == 0 and the mask discards it anyway
        P_raut = w(has_liq,
                   16.7 / rho * (rho * ql) ** 2
                   / (5. + 3.66e-2 * 1.e-6 * Nc0 / (D_d * rho * ql)))
        P_saut = w(has_ice, jnp.maximum(beta_1 * qi, 0.))
        P_gaut = w(has_snow, jnp.maximum(beta_2 * (qs_ - q_scrt), 0.))

        # PHASE CHANGES (Tomita Eq. 57-70)
        G_w = 1. / (cst.Lv / (K_A * T) * (cst.Lv / (cst.Rv * T) - 1.)
                    + cst.Rv * T / (K_D * esat_liq(T)))
        G_i = 1. / (cst.Ls / (K_A * T) * (cst.Ls / (cst.Rv * T) - 1.)
                    + cst.Rv * T / (K_D * esat_ice(T)))
        S_w = qv / qsat_liq(p, T)
        S_i = qv / qsat_ice(p, T)
        delta_3 = (S_i <= 1.).astype(T.dtype)          # Eq. 63

        P_revp = w(has_rain,
                   -2. * math.pi * N_0R * (jnp.minimum(S_w, 1.) - 1.) * G_w / rho
                   * _vent_sum(F_1R, F_2R, C_R, D_R, rr, lam_r))
        P_sdep_ssub = (2. * math.pi * N_0S * (S_i - 1.) * G_i / rho
                       * _vent_sum(F_1S, F_2S, C_S, D_S, rr, lam_s))
        P_gdep_gsub = (2. * math.pi * N_0G * (S_i - 1.) * G_i / rho
                       * _vent_sum(F_1G, F_2G, C_G, D_G, rr, lam_g))
        P_sdep = w(has_vap, (1. - delta_3) * P_sdep_ssub)
        P_gdep = w(has_vap, (1. - delta_3) * P_gdep_gsub)
        # Eq. 65, sign swapped so sublimation is positive (reference comment).
        P_ssub = w(has_snow, -delta_3 * P_sdep_ssub)
        P_gsub = w(has_grau, -delta_3 * P_gdep_gsub)

        # melting / freezing (Tomita Eq. 67-70)
        P_smlt = w(has_snow,
                   2. * math.pi * K_A * (T - cst.T0) * N_0S / (rho * cst.Lf)
                   * _vent_sum(F_1S, F_2S, C_S, D_S, rr, lam_s)
                   + C_L * (T - cst.T0) / cst.Lf * (P_sacw + P_sacr))
        P_gmlt = w(has_grau,
                   2. * math.pi * K_A * (T - cst.T0) * N_0G / (rho * cst.Lf)
                   * _vent_sum(F_1G, F_2G, C_G, D_G, rr, lam_g)
                   + C_L * (T - cst.T0) / cst.Lf * (P_gacw + P_gacr))
        A_PRIME, B_PRIME = 0.66, 100.
        P_gfrz = w(has_rain,
                   20. * math.pi ** 2 * B_PRIME * N_0R * RHO_W / rho
                   * (jnp.exp(A_PRIME * (cst.T0 - T)) - 1.) / lam_r ** 7)

        # source-availability clamps (microphys_nsw6.cxx:436-487)
        dqv_max, dqi_max, dql_max = qv / dt, qi / dt, ql / dt
        dqr_max, dqs_max, dqg_max = qr / dt, qs_ / dt, qg / dt

        def lim(tend, tmax):
            return jnp.clip(tend, 0., tmax)

        P_iacr_s = lim(P_iacr_s, dqr_max)
        P_iacr_g = lim(P_iacr_g, dqr_max)
        P_raci_s = lim(P_raci_s, dqi_max)
        P_raci_g = lim(P_raci_g, dqi_max)
        P_racw = lim(P_racw, dql_max)
        P_sacw = lim(P_sacw, dql_max)
        P_saci = lim(P_saci, dqi_max)
        P_gacw = lim(P_gacw, dql_max)
        P_gaci = lim(P_gaci, dqi_max)
        P_racs = lim(P_racs, dqs_max)
        P_sacr_s = lim(P_sacr_s, dqr_max)
        P_sacr_g = lim(P_sacr_g, dqr_max)
        P_gacr = lim(P_gacr, dqr_max)
        P_gacs = lim(P_gacs, dqs_max)
        P_raut = lim(P_raut, dql_max)
        P_saut = lim(P_saut, dqi_max)
        P_gaut = lim(P_gaut, dqs_max)
        P_revp = lim(P_revp, dqr_max)
        P_sdep = lim(P_sdep, dqv_max)
        P_ssub = lim(P_ssub, dqs_max)
        P_gdep = lim(P_gdep, dqv_max)
        P_gsub = lim(P_gsub, dqg_max)
        P_smlt = lim(P_smlt, dqs_max)
        P_gmlt = lim(P_gmlt, dqg_max)
        P_gfrz = lim(P_gfrz, dqr_max)

        # species transfer matrix (microphys_nsw6.cxx:515-536)
        vapor_to_snow = P_sdep
        vapor_to_graupel = P_gdep
        cloud_to_rain = P_racw + P_sacw * T_pos + P_raut
        cloud_to_graupel = P_gacw
        cloud_to_snow = P_sacw * T_neg
        rain_to_vapor = P_revp
        rain_to_graupel = P_gacr + P_iacr_g + P_sacr_g * T_neg + P_gfrz * T_neg
        rain_to_snow = P_sacr_s * T_neg + P_iacr_s
        ice_to_snow = P_raci_s + P_saci + P_saut
        ice_to_graupel = P_raci_g + P_gaci
        snow_to_graupel = P_gacs + P_racs + P_gaut
        snow_to_rain = P_smlt
        snow_to_vapor = P_ssub
        graupel_to_rain = P_gmlt * T_pos
        graupel_to_vapor = P_gsub

        # total-sink availability factors (microphys_nsw6.cxx:560-596)
        dqv_dt = -vapor_to_snow - vapor_to_graupel
        dql_dt = -cloud_to_rain - cloud_to_graupel - cloud_to_snow
        dqi_dt = -ice_to_snow - ice_to_graupel
        dqr_dt = (cloud_to_rain + snow_to_rain + graupel_to_rain
                  - rain_to_vapor - rain_to_graupel - rain_to_snow)
        dqs_dt = (cloud_to_snow + ice_to_snow + vapor_to_snow
                  - snow_to_graupel - snow_to_vapor - snow_to_rain)
        dqg_dt = (cloud_to_graupel + rain_to_graupel + ice_to_graupel
                  + vapor_to_graupel + snow_to_graupel
                  - graupel_to_rain - graupel_to_vapor)

        def fac(tend, tmax):
            return jnp.where(tend < 0., jnp.minimum(-tmax / tend, 1.), 1.)

        f_v = fac(dqv_dt, dqv_max)
        f_l = fac(dql_dt, dql_max)
        f_i = fac(dqi_dt, dqi_max)
        f_r = fac(dqr_dt, dqr_max)
        f_s = fac(dqs_dt, dqs_max)
        f_g = fac(dqg_dt, dqg_max)

        vapor_to_snow = vapor_to_snow * f_v * f_s
        vapor_to_graupel = vapor_to_graupel * f_v * f_g
        cloud_to_rain = cloud_to_rain * f_l * f_r
        cloud_to_graupel = cloud_to_graupel * f_l * f_g
        cloud_to_snow = cloud_to_snow * f_l * f_s
        rain_to_vapor = rain_to_vapor * f_r * f_v
        rain_to_graupel = rain_to_graupel * f_r * f_g
        rain_to_snow = rain_to_snow * f_r * f_s
        ice_to_snow = ice_to_snow * f_i * f_s
        ice_to_graupel = ice_to_graupel * f_i * f_g
        snow_to_graupel = snow_to_graupel * f_s * f_g
        snow_to_vapor = snow_to_vapor * f_s * f_v
        snow_to_rain = snow_to_rain * f_s * f_r
        graupel_to_rain = graupel_to_rain * f_g * f_r
        graupel_to_vapor = graupel_to_vapor * f_g * f_v

        lv_e = cst.Lv / (cst.cp * exn)
        ls_e = cst.Ls / (cst.cp * exn)
        lf_e = cst.Lf / (cst.cp * exn)

        # NOTE: vapor_to_snow / vapor_to_graupel (P_sdep/P_gdep) enter the
        # availability factors above but are NOT applied below — matching the
        # reference, whose final tendency block (microphys_nsw6.cxx:595-650)
        # never adds them.
        qtt = (-cloud_to_rain - cloud_to_graupel - cloud_to_snow
               + rain_to_vapor - ice_to_snow - ice_to_graupel
               + snow_to_vapor + graupel_to_vapor)
        qrt = (cloud_to_rain - rain_to_vapor - rain_to_graupel - rain_to_snow
               + snow_to_rain + graupel_to_rain)
        qst = (cloud_to_snow + rain_to_snow + ice_to_snow - snow_to_graupel
               - snow_to_vapor - snow_to_rain)
        qgt = (cloud_to_graupel + rain_to_graupel + ice_to_graupel
               + snow_to_graupel - graupel_to_rain - graupel_to_vapor)
        thlt = (lv_e * cloud_to_rain
                + ls_e * (cloud_to_graupel + cloud_to_snow
                          + ice_to_snow + ice_to_graupel
                          - snow_to_vapor - graupel_to_vapor)
                + lf_e * (rain_to_graupel + rain_to_snow
                          - snow_to_rain - graupel_to_rain)
                - lv_e * rain_to_vapor)
        return qtt, thlt, qrt, qst, qgt

    # -- sedimentation ------------------------------------------------------
    def _fall_speed(self, ctx, qc, props):
        a_c, b_c, c_c, d_c, n_0c, qc_min = props
        ks, ke = ctx.ks, ctx.ke
        rho = ctx.rhoref[ks:ke][:, None, None]
        rr = jnp.sqrt(ctx.rhoref[ks] / rho)
        lam = (a_c * n_0c * _G(b_c + 1.) / (rho * jnp.maximum(qc, Q_TINY))) \
            ** (1. / (b_c + 1.))
        v = c_c * rr * _G(b_c + d_c + 1.) / _G(b_c + 1.) * lam ** (-d_c)
        return jnp.where(qc > qc_min, jnp.clip(v, 0.1, 10.), 0.)

    _PROPS = {
        "qr": (A_R, B_R, C_R, D_R, N_0R, QR_MIN),
        "qs": (A_S, B_S, C_S, D_S, N_0S, QS_MIN),
        "qg": (A_G, B_G, C_G, D_G, N_0G, QG_MIN),
    }

    def exec(self, ctx, s, t, aux, dt):
        ks, ke = ctx.ks, ctx.ke
        qtt, thlt, qrt, qst, qgt = self._conversion(ctx, s, dt, aux)

        rho = ctx.rhoref[ks:ke][:, None, None]
        sed = {}
        rates = {}
        for name, tend in (("qr", qrt), ("qs", qst), ("qg", qgt)):
            qc = s[name][ks:ke]
            w_qc = self._fall_speed(ctx, qc, self._PROPS[name])
            c_qc = ss08_cfl(ctx, w_qc, dt)
            st, bot = ss08_flux_tendency(ctx, qc, c_qc, rho, dt)
            sed[name] = tend + st
            rates["r" + name[1] + "_bot"] = bot

        t = dict(t)
        t["qt"] = t["qt"].at[ks:ke].add(qtt)
        t["thl"] = t["thl"].at[ks:ke].add(thlt)
        for name in ("qr", "qs", "qg"):
            t[name] = t[name].at[ks:ke].add(sed[name])
        aux = dict(aux)
        aux.update(rates)          # rr_bot / rs_bot / rg_bot [kg m-2 s-1]
        return t, aux

    def get_time_limit_rate(self, ctx, s):
        """Max sedimentation velocity * dzi over rain/snow/graupel; the host
        multiplies by dt and compares to cflmax (microphys_nsw6.cxx:1063+)."""
        ks, ke = ctx.ks, ctx.ke
        dzi = ctx.dzi[ks:ke][:, None, None]
        rate = 1e-5
        for name in ("qr", "qs", "qg"):
            w_qc = self._fall_speed(ctx, s[name][ks:ke], self._PROPS[name])
            rate = jnp.maximum(rate, jnp.max(w_qc * dzi))
        return rate
