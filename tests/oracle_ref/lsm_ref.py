"""Oracle transliteration of the land-surface / soil kernels.

Mirrors /root/reference/include/land_surface_kernels.h (calc_tile_fractions
:64-87, calc_liquid_water_reservoir :89-155, calc_resistance_functions
:157-206, canopy/soil resistance :208-245, calc_fluxes :294-381) and
include/soil_kernels.h (van Genuchten diffusivity/conductivity :33-52,
calc_thermal_properties :213-249, calc_hydraulic_properties :251-297,
calc_root_water_extraction :299-344, calc_infiltration :346-378).

Scalar per-point python, used to pin the vectorized JAX implementation in
microhh_tpu/ops/boundary_surface_lsm.py at 1e-13.
"""

import math

CP = 1005.
LV = 2.501e6
RHO_W = 1.e3
SIGMA_B = 5.67e-8
RHO_C_MATRIX = 1.6e6
RHO_C_WATER = 4.18e6
GAMMA_T_MATRIX = 3.4293695508945325
GAMMA_T_WATER = 0.57
WLMAX = 0.0002
DSMALL = 1.e-9


def vg_diffusivity(vg_a, vg_l, vg_m, gamma_sat, theta_res, theta_sat, tn):
    vg_mi = 1. / vg_m
    return ((1. - vg_m) * gamma_sat / (vg_a * vg_m * (theta_sat - theta_res))
            * tn ** (vg_l - vg_mi)
            * ((1. - tn ** vg_mi) ** -vg_m + (1. - tn ** vg_mi) ** vg_m - 2.))


def vg_conductivity(tn, vg_l, vg_m, gamma_sat):
    return gamma_sat * tn ** vg_l * (1. - (1. - tn ** (1. / vg_m)) ** vg_m) ** 2


def hydraulic_properties(theta, theta_sat, theta_res, vg_a, vg_l, vg_m,
                         gamma_sat, gamma_min, gamma_max, kappa_min,
                         kappa_max):
    theta_lim = max(theta, 1.001 * theta_res)
    tn = (theta_lim - theta_res) / (theta_sat - theta_res)
    kappa = vg_diffusivity(vg_a, vg_l, vg_m, gamma_sat, theta_res,
                           theta_sat, tn)
    kappa = max(min(kappa_max, kappa), kappa_min)
    gamma = vg_conductivity(tn, vg_l, vg_m, gamma_sat)
    gamma = max(min(gamma_max, gamma), gamma_min)
    return kappa, gamma


def thermal_properties(theta, theta_sat, gamma_dry, rho_C):
    gamma_T_sat = (GAMMA_T_MATRIX ** (1. - theta_sat)
                   * GAMMA_T_WATER ** theta * 2.2 ** (theta_sat - theta))
    kersten = math.log10(max(0.1, theta / theta_sat)) + 1.
    gamma = kersten * (gamma_T_sat - gamma_dry) + gamma_dry
    return gamma / rho_C, gamma


def tile_fractions(wl, c_veg, lai):
    wlm = WLMAX * (1. - c_veg + c_veg * lai)
    f_wet = min(1., wl / wlm)
    return (1. - f_wet) * c_veg, (1. - f_wet) * (1. - c_veg), f_wet


def liquid_water_reservoir(wl_tend_in, wl, LE_veg, LE_soil, LE_wet,
                           f_veg, f_soil, f_wet, rain_rate, c_veg, lai,
                           subdt):
    """Returns (wl_tend_out, interception, throughfall)."""
    intercept_eff = 0.5
    to_ms = 1. / (RHO_W * LV)
    subdti = 1. / subdt
    rr_ms = rain_rate / RHO_W
    wlm = WLMAX * (1. - c_veg + c_veg * lai)
    wl_tend_max = (wlm - wl) * subdti - wl_tend_in
    wl_tend_min = (-wl) * subdti - wl_tend_in
    wl_tend_liq = -max(0., f_wet * LE_wet * to_ms)
    wl_tend_dew = -(min(0., f_wet * LE_wet * to_ms)
                    + min(0., f_veg * LE_veg * to_ms)
                    + min(0., f_soil * LE_soil * to_ms))
    wl_tend_precip = intercept_eff * c_veg * rr_ms
    wl_tend_sum = wl_tend_liq + wl_tend_dew + wl_tend_precip
    wl_tend_lim = min(wl_tend_max, max(wl_tend_min, wl_tend_sum))
    throughfall = (-(1. - c_veg) * rr_ms
                   - (1. - intercept_eff) * c_veg * rr_ms
                   + min(0., wl_tend_lim - wl_tend_sum))
    interception = max(0., wl_tend_lim)
    return wl_tend_in + wl_tend_lim, interception, throughfall


def resistance_functions(sw_dn, theta_top, theta_mean_n, vpd, gD, c_veg,
                         theta_wp, theta_fc, theta_res):
    a_f1, b_f1, c_f1 = 0.81, 0.004, 0.05
    sw_dn_lim = max(0., sw_dn)
    f1 = 1. / min(1., (b_f1 * sw_dn_lim + c_f1) / (a_f1 * (b_f1 * sw_dn_lim + 1.)))
    f2 = 1. / min(1., max(1e-9, theta_mean_n))
    f3 = 1. / math.exp(-gD * vpd)
    theta_min = c_veg * theta_wp + (1. - c_veg) * theta_res
    theta_rel = (theta_top - theta_min) / (theta_fc - theta_min)
    f2b = 1. / min(1., max(1e-9, theta_rel))
    return f1, f2, f2b, f3


def canopy_resistance(rs_min, lai, f1, f2, f3):
    return rs_min / (lai + DSMALL) * f1 * f2 * f3


def soil_resistance(rs_min, f2b):
    return rs_min * f2b


def seb_fluxes(T_a, qt1, T_bot, T_soil_top, qsat_bot, dqsatdT_bot, ra, rs,
               lam, cs_veg, sw_dn, sw_up, lw_dn, lw_up, rho_bot, emis_sfc,
               dt, dew):
    """calc_fluxes for one tile at one point; ``dew`` = qsat_bot < qt1
    switches the canopy resistance off.  Returns
    (H, LE, G, S, T_bot_new, qt_bot)."""
    rs_lim = 0. if dew else rs
    fH = rho_bot * CP / ra
    fLE = rho_bot * LV / (ra + rs_lim)
    Qnet = sw_dn - sw_up + lw_dn - lw_up
    num = (Qnet + lw_up + fH * T_a
           + fLE * (qt1 + dqsatdT_bot * T_bot - qsat_bot)
           + lam * T_soil_top + 3. * emis_sfc * SIGMA_B * T_bot ** 4
           - (1. - emis_sfc) * lw_dn)
    denom = (fH + fLE * dqsatdT_bot + lam
             + 4. * emis_sfc * SIGMA_B * T_bot ** 3)
    T_bot_new = (num + cs_veg / dt * T_bot) / (denom + cs_veg / dt)
    dT = T_bot_new - T_bot
    qsat_new = qsat_bot + dqsatdT_bot * dT
    H = fH * (T_bot_new - T_a)
    LE = fLE * (qsat_new - qt1)
    G = lam * (T_bot_new - T_soil_top)
    S = cs_veg * dT / dt
    qt_bot = qt1 + LE * ra / (rho_bot * LV)
    return H, LE, G, S, T_bot_new, qt_bot


def root_water_extraction(theta_col, root_frac_col, LE_veg, dzi_col):
    """One column; LE_veg already scaled by the tile fraction
    (boundary_surface_lsm.cxx:886-905)."""
    fac = 1. / (RHO_W * LV)
    tot = sum(rf * th for rf, th in zip(root_frac_col, theta_col))
    out = []
    for k in range(len(theta_col)):
        theta_frac = root_frac_col[k] * theta_col[k] / tot
        out.append(-max(0., LE_veg) * fac * dzi_col[k] * theta_frac)
    return out


def infiltration(throughfall, theta_top, theta_sat, kappa_max, gamma_max,
                 dz_top):
    dz2i = 1. / (0.5 * dz_top)
    i_max = min(0., -(kappa_max * (theta_sat - theta_top) * dz2i + gamma_max))
    infil = min(0., max(throughfall, i_max))
    runoff = min(0., throughfall - infil)
    return infil, runoff
