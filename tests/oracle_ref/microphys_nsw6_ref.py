"""Oracle transliteration of the NSW6 conversion kernel.

Mirrors /root/reference/src/microphys_nsw6.cxx:125-650 (`conversion`) —
Tomita (2008) accretion, autoconversion, phase changes, melting/freezing,
the two-stage availability limiter and the species-transfer bookkeeping —
as a scalar per-cell Python function.  Constants from :45-114.
"""

import math

import numpy as np

from .thermo_moist_ref import esat_liq, esat_ice, qsat_liq, qsat_ice, \
    LV, LF, LS, CP, RV, T0

qv_min, ql_min, qi_min = 1.e-7, 1.e-7, 1.e-7
qr_min, qs_min, qg_min = 1.e-12, 1.e-12, 1.e-12
q_tiny = 1.e-15

pi = math.pi
pi_2 = math.pi ** 2
rho_w, rho_s, rho_g = 1.e3, 1.e2, 4.e2
N_0r, N_0s, N_0g = 8.e6, 3.e6, 4.e6
a_r, a_s, a_g = pi * rho_w / 6., pi * rho_s / 6., pi * rho_g / 6.
b_r = b_s = b_g = 3.
c_r, c_s, c_g = 130., 4.84, 82.5
d_r, d_s, d_g = 0.5, 0.25, 0.5
C_i, C_l = 2006., 4218.
f_1r, f_1s, f_1g = 0.78, 0.65, 0.78
f_2r, f_2s, f_2g = 0.27, 0.39, 0.27
E_ri = E_rw = E_sw = E_gw = 1.
E_gi = 0.1
E_sr = 1.
E_gr = 0.1
K_a, K_d = 2.43e-2, 2.26e-5
M_i = 4.19e-13
beta_saut, beta_gaut = 6.e-3, 0.e-3
gamma_sacr, gamma_saut, gamma_gacs, gamma_gaut = 25.e-3, 60.e-3, 90.e-3, 90.e-3
nu = 1.5e-5

tg = math.gamma


def conversion_cell(qr, qs, qg, qt, thl, ql, qi, rho, rho0, exner, p,
                    Nc0, dt):
    """One cell; returns (qrt, qst, qgt, qtt, thlt) increments."""
    D_d = 0.146 - 5.964e-2 * math.log((Nc0 * 1.e-6) / 2.e3)
    rho0_rho_sqrt = math.sqrt(rho0 / rho)

    fac_iacr = pi_2 * E_ri * N_0r * c_r * rho_w * tg(6. + d_r) / (24. * M_i) * rho0_rho_sqrt
    fac_raci = pi * E_ri * N_0r * c_r * tg(3. + d_r) / 4. * rho0_rho_sqrt
    fac_racw = pi * E_rw * N_0r * c_r * tg(3. + d_r) / 4. * rho0_rho_sqrt
    fac_sacw = pi * E_sw * N_0s * c_s * tg(3. + d_s) / 4. * rho0_rho_sqrt
    fac_saci = pi * N_0s * c_s * tg(3. + d_s) / 4. * rho0_rho_sqrt
    fac_gacw = pi * E_gw * N_0g * c_g * tg(3. + d_g) / 4. * rho0_rho_sqrt
    fac_gaci = pi * E_gi * N_0g * c_g * tg(3. + d_g) / 4. * rho0_rho_sqrt

    T = exner * thl + LV / CP * ql + LS / CP * qi
    qv = qt - ql - qi
    T_pos = 1. if T >= T0 else 0.
    T_neg = 1. - T_pos

    has_vapor = qv > qv_min
    has_liq = ql > ql_min
    has_ice = qi > qi_min
    has_rain = qr > qr_min
    has_snow = qs > qs_min
    has_graupel = qg > qg_min

    if not (has_liq or has_ice or has_rain or has_snow or has_graupel):
        return 0., 0., 0., 0., 0.

    lambda_r = (a_r * N_0r * tg(b_r + 1.) / (rho * (qr + q_tiny))) ** (1. / (b_r + 1.))
    lambda_s = (a_s * N_0s * tg(b_s + 1.) / (rho * (qs + q_tiny))) ** (1. / (b_s + 1.))
    lambda_g = (a_g * N_0g * tg(b_g + 1.) / (rho * (qg + q_tiny))) ** (1. / (b_g + 1.))

    V_Tr = 0. if not has_rain else \
        c_r * rho0_rho_sqrt * tg(b_r + d_r + 1.) / tg(b_r + 1.) * lambda_r ** -d_r
    V_Ts = 0. if not has_snow else \
        c_s * rho0_rho_sqrt * tg(b_s + d_s + 1.) / tg(b_s + 1.) * lambda_s ** -d_s
    V_Tg = 0. if not has_graupel else \
        c_g * rho0_rho_sqrt * tg(b_g + d_g + 1.) / tg(b_g + 1.) * lambda_g ** -d_g

    # accretion
    P_iacr = 0. if not (has_rain and has_ice) else \
        fac_iacr / lambda_r ** (6. + d_r) * qi
    delta_1 = 1. if qr >= 1.e-4 else 0.
    P_iacr_s = (1. - delta_1) * P_iacr
    P_iacr_g = delta_1 * P_iacr
    P_raci = 0. if not (has_rain and has_ice) else \
        fac_raci / lambda_r ** (3. + d_r) * qi
    P_raci_s = (1. - delta_1) * P_raci
    P_raci_g = delta_1 * P_raci
    P_racw = 0. if not (has_liq and has_rain) else \
        fac_racw / lambda_r ** (3. + d_r) * ql
    P_sacw = 0. if not (has_liq and has_snow) else \
        fac_sacw / lambda_s ** (3. + d_s) * ql
    E_si = math.exp(gamma_sacr * (T - T0))
    P_saci = 0. if not (has_snow and has_ice) else \
        fac_saci * E_si / lambda_s ** (3. + d_s) * qi
    P_gacw = 0. if not (has_graupel and has_liq) else \
        fac_gacw / lambda_g ** (3. + d_g) * ql
    P_gaci = 0. if not (has_graupel and has_ice) else \
        fac_gaci / lambda_g ** (3. + d_g) * qi

    delta_2 = 1. - (1. if (qr >= 1.e-4 or qs >= 1.e-4) else 0.)

    P_racs = 0. if not (has_rain and has_snow) else \
        (1. - delta_2) * pi * a_s * abs(V_Tr - V_Ts) * E_sr * N_0s * N_0r / (4. * rho) \
        * (tg(b_s + 3.) * tg(1.) / (lambda_s ** (b_s + 3.) * lambda_r)
           + 2. * tg(b_s + 2.) * tg(2.) / (lambda_s ** (b_s + 2.) * lambda_r ** 2)
           + tg(b_s + 1.) * tg(3.) / (lambda_s ** (b_s + 1.) * lambda_r ** 3))
    P_sacr = 0. if not (has_snow and has_rain) else \
        pi * a_r * abs(V_Ts - V_Tr) * E_sr * N_0r * N_0s / (4. * rho) \
        * (tg(b_r + 1.) * tg(3.) / (lambda_r ** (b_r + 1.) * lambda_s ** 3)
           + 2. * tg(b_r + 2.) * tg(2.) / (lambda_r ** (b_r + 2.) * lambda_s ** 2)
           + tg(b_r + 3.) * tg(1.) / (lambda_r ** (b_r + 3.) * lambda_s))
    P_sacr_g = (1. - delta_2) * P_sacr
    P_sacr_s = delta_2 * P_sacr
    E_gs = min(1., math.exp(gamma_gacs * (T - T0)))
    P_gacr = 0. if not (has_graupel and has_rain) else \
        pi * a_r * abs(V_Tg - V_Tr) * E_gr * N_0g * N_0r / (4. * rho) \
        * (tg(b_r + 1.) * tg(3.) / (lambda_r ** (b_r + 1.) * lambda_g ** 3)
           + 2. * tg(b_r + 2.) * tg(2.) / (lambda_r ** (b_r + 2.) * lambda_g ** 2)
           + tg(b_r + 3.) * tg(1.) / (lambda_r ** (b_r + 3.) * lambda_g))
    P_gacs = 0. if not (has_graupel and has_snow) else \
        pi * a_s * abs(V_Tg - V_Ts) * E_gs * N_0g * N_0s / (4. * rho) \
        * (tg(b_s + 1.) * tg(3.) / (lambda_s ** (b_s + 1.) * lambda_g ** 3)
           + 2. * tg(b_s + 2.) * tg(2.) / (lambda_s ** (b_s + 2.) * lambda_g ** 2)
           + tg(b_s + 3.) * tg(1.) / (lambda_s ** (b_s + 3.) * lambda_g))

    # autoconversion
    q_icrt, q_scrt = 0., 6.e-4
    beta_1 = min(beta_saut, beta_saut * math.exp(gamma_saut * (T - T0)))
    beta_2 = min(beta_gaut, beta_gaut * math.exp(gamma_gaut * (T - T0)))
    P_raut = 0. if not has_liq else \
        16.7 / rho * (rho * ql) ** 2 / (5. + 3.66e-2 * 1.e-6 * Nc0 / (D_d * rho * ql))
    P_saut = 0. if not has_ice else max(beta_1 * (qi - q_icrt), 0.)
    P_gaut = 0. if not has_snow else max(beta_2 * (qs - q_scrt), 0.)

    # phase changes
    G_w = 1. / (LV / (K_a * T) * (LV / (RV * T) - 1.) + RV * T / (K_d * esat_liq(T)))
    G_i = 1. / (LS / (K_a * T) * (LS / (RV * T) - 1.) + RV * T / (K_d * esat_ice(T)))
    S_w = (qt - ql - qi) / qsat_liq(p, T)
    S_i = (qt - ql - qi) / qsat_ice(p, T)
    delta_3 = 1. if S_i <= 1. else 0.

    P_revp = 0. if not has_rain else \
        -2. * pi * N_0r * (min(S_w, 1.) - 1.) * G_w / rho \
        * (f_1r * tg(2.) / lambda_r ** 2
           + f_2r * math.sqrt(c_r * rho0_rho_sqrt / nu)
           * tg(0.5 * (5. + d_r)) / lambda_r ** (0.5 * (5. + d_r)))
    P_sdep_ssub = 2. * pi * N_0s * (S_i - 1.) * G_i / rho \
        * (f_1s * tg(2.) / lambda_s ** 2
           + f_2s * math.sqrt(c_s * rho0_rho_sqrt / nu)
           * tg(0.5 * (5. + d_s)) / lambda_s ** (0.5 * (5. + d_s)))
    P_gdep_gsub = 2. * pi * N_0g * (S_i - 1.) * G_i / rho \
        * (f_1g * tg(2.) / lambda_g ** 2
           + f_2g * math.sqrt(c_g * rho0_rho_sqrt / nu)
           * tg(0.5 * (5. + d_g)) / lambda_g ** (0.5 * (5. + d_g)))
    P_sdep = 0. if not has_vapor else (1. - delta_3) * P_sdep_ssub
    P_gdep = 0. if not has_vapor else (1. - delta_3) * P_gdep_gsub
    P_ssub = 0. if not has_snow else -delta_3 * P_sdep_ssub
    P_gsub = 0. if not has_graupel else -delta_3 * P_gdep_gsub

    # melting / freezing
    P_smlt = 0. if not has_snow else \
        2. * pi * K_a * (T - T0) * N_0s / (rho * LF) \
        * (f_1s * tg(2.) / lambda_s ** 2
           + f_2s * math.sqrt(c_s * rho0_rho_sqrt / nu)
           * tg(0.5 * (5. + d_s)) / lambda_s ** (0.5 * (5. + d_s))) \
        + C_l * (T - T0) / LF * (P_sacw + P_sacr)
    P_gmlt = 0. if not has_graupel else \
        2. * pi * K_a * (T - T0) * N_0g / (rho * LF) \
        * (f_1g * tg(2.) / lambda_g ** 2
           + f_2g * math.sqrt(c_g * rho0_rho_sqrt / nu)
           * tg(0.5 * (5. + d_g)) / lambda_g ** (0.5 * (5. + d_g))) \
        + C_l * (T - T0) / LF * (P_gacw + P_gacr)
    A_prime, B_prime = 0.66, 100.
    P_gfrz = 0. if not has_rain else \
        20. * pi_2 * B_prime * N_0r * rho_w / rho \
        * (math.exp(A_prime * (T0 - T)) - 1.) / lambda_r ** 7

    # availability limiting, stage 1
    def limit(tend, tend_limit):
        return max(0., min(tend, tend_limit))

    dqv_dt_max = qv / dt
    dqi_dt_max = qi / dt
    dql_dt_max = ql / dt
    dqr_dt_max = qr / dt
    dqs_dt_max = qs / dt
    dqg_dt_max = qg / dt

    P_iacr_s = limit(P_iacr_s, dqr_dt_max)
    P_iacr_g = limit(P_iacr_g, dqr_dt_max)
    P_raci_s = limit(P_raci_s, dqi_dt_max)
    P_raci_g = limit(P_raci_g, dqi_dt_max)
    P_racw = limit(P_racw, dql_dt_max)
    P_sacw = limit(P_sacw, dql_dt_max)
    P_saci = limit(P_saci, dqi_dt_max)
    P_gacw = limit(P_gacw, dql_dt_max)
    P_gaci = limit(P_gaci, dqi_dt_max)
    P_racs = limit(P_racs, dqs_dt_max)
    P_sacr_s = limit(P_sacr_s, dqr_dt_max)
    P_sacr_g = limit(P_sacr_g, dqr_dt_max)
    P_gacr = limit(P_gacr, dqr_dt_max)
    P_gacs = limit(P_gacs, dqs_dt_max)
    P_raut = limit(P_raut, dql_dt_max)
    P_saut = limit(P_saut, dqi_dt_max)
    P_gaut = limit(P_gaut, dqs_dt_max)
    P_revp = limit(P_revp, dqr_dt_max)
    P_sdep = limit(P_sdep, dqv_dt_max)
    P_ssub = limit(P_ssub, dqs_dt_max)
    P_gdep = limit(P_gdep, dqv_dt_max)
    P_gsub = limit(P_gsub, dqg_dt_max)
    P_smlt = limit(P_smlt, dqs_dt_max)
    P_gmlt = limit(P_gmlt, dqg_dt_max)
    P_gfrz = limit(P_gfrz, dqr_dt_max)

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

    def limit_factor(tend, tend_limit):
        return min(-tend_limit / tend, 1.) if tend < 0. else 1.

    dqv_dt_fac = limit_factor(dqv_dt, dqv_dt_max)
    dql_dt_fac = limit_factor(dql_dt, dql_dt_max)
    dqi_dt_fac = limit_factor(dqi_dt, dqi_dt_max)
    dqr_dt_fac = limit_factor(dqr_dt, dqr_dt_max)
    dqs_dt_fac = limit_factor(dqs_dt, dqs_dt_max)
    dqg_dt_fac = limit_factor(dqg_dt, dqg_dt_max)

    vapor_to_snow *= dqv_dt_fac * dqs_dt_fac
    vapor_to_graupel *= dqv_dt_fac * dqg_dt_fac
    cloud_to_rain *= dql_dt_fac * dqr_dt_fac
    cloud_to_graupel *= dql_dt_fac * dqg_dt_fac
    cloud_to_snow *= dql_dt_fac * dqs_dt_fac
    rain_to_vapor *= dqr_dt_fac * dqv_dt_fac
    rain_to_graupel *= dqr_dt_fac * dqg_dt_fac
    rain_to_snow *= dqr_dt_fac * dqs_dt_fac
    ice_to_snow *= dqi_dt_fac * dqs_dt_fac
    ice_to_graupel *= dqi_dt_fac * dqg_dt_fac
    snow_to_graupel *= dqs_dt_fac * dqg_dt_fac
    snow_to_vapor *= dqs_dt_fac * dqv_dt_fac
    snow_to_rain *= dqs_dt_fac * dqr_dt_fac
    graupel_to_rain *= dqg_dt_fac * dqr_dt_fac
    graupel_to_vapor *= dqg_dt_fac * dqv_dt_fac

    qtt = 0.
    qrt = 0.
    qst = 0.
    qgt = 0.
    thlt = 0.

    qtt -= cloud_to_rain
    qrt += cloud_to_rain
    thlt += LV / (CP * exner) * cloud_to_rain
    qtt -= cloud_to_graupel
    qgt += cloud_to_graupel
    thlt += LS / (CP * exner) * cloud_to_graupel
    qtt -= cloud_to_snow
    qst += cloud_to_snow
    thlt += LS / (CP * exner) * cloud_to_snow
    qrt -= rain_to_vapor
    qtt += rain_to_vapor
    thlt -= LV / (CP * exner) * rain_to_vapor
    qrt -= rain_to_graupel
    qgt += rain_to_graupel
    thlt += LF / (CP * exner) * rain_to_graupel
    qrt -= rain_to_snow
    qst += rain_to_snow
    thlt += LF / (CP * exner) * rain_to_snow
    qtt -= ice_to_snow
    qst += ice_to_snow
    thlt += LS / (CP * exner) * ice_to_snow
    qtt -= ice_to_graupel
    qgt += ice_to_graupel
    thlt += LS / (CP * exner) * ice_to_graupel
    qst -= snow_to_graupel
    qgt += snow_to_graupel
    qst -= snow_to_vapor
    qtt += snow_to_vapor
    thlt -= LS / (CP * exner) * snow_to_vapor
    qst -= snow_to_rain
    qrt += snow_to_rain
    thlt -= LF / (CP * exner) * snow_to_rain
    qgt -= graupel_to_rain
    qrt += graupel_to_rain
    thlt -= LF / (CP * exner) * graupel_to_rain
    qgt -= graupel_to_vapor
    qtt += graupel_to_vapor
    thlt -= LS / (CP * exner) * graupel_to_vapor

    return qrt, qst, qgt, qtt, thlt
