"""Oracle transliteration of the moist-thermo function family.

Mirrors /root/reference/include/thermo_moist_functions.h: the Arden-Buck
Taylor esat_liq (:86-96), esat_ice (:107-117), Tomita (2008) mixed-phase
blends (:126-170), and the scalar sat_adjust Newton solver with the
reference's warm/cold branches and convergence criterion (:187-290).
Constants from include/constants.h:31-84.
"""

import numpy as np

GRAV = 9.81
RD = 287.04
RV = 461.5
CP = 1005.
LV = 2.501e6
LF = 3.337e5
LS = LV + LF
T0 = 273.15
P0 = 1.e5
EP = RD / RV

_C = (+6.1121000000E+02, +4.4393067270E+01, +1.4279398448E+00,
      +2.6415206946E-02, +3.0291749160E-04, +2.1159987257E-06,
      +7.5015702516E-09, -1.5604873363E-12, -9.9726710231E-14,
      -4.8165754883E-17, +1.3839187032E-18)


def esat_liq(T):
    x = np.maximum(-75., T - T0)
    acc = _C[10]
    for c in _C[9::-1]:
        acc = c + x * acc
    return acc


def qsat_liq(p, T):
    return EP * esat_liq(T) / (p - (1. - EP) * esat_liq(T))


def esat_ice(T):
    x = np.maximum(-100., T - T0)
    return 611.15 * np.exp(22.452 * x / (272.55 + x))


def qsat_ice(p, T):
    return EP * esat_ice(T) / (p - (1. - EP) * esat_ice(T))


def water_fraction(T):
    return np.maximum(0., np.minimum((T - 233.15) / (T0 - 233.15), 1.))


def qsat(p, T):
    a = water_fraction(T)
    return a * qsat_liq(p, T) + (1. - a) * qsat_ice(p, T)


def esat(T):
    a = water_fraction(T)
    return a * esat_liq(T) + (1. - a) * esat_ice(T)


def dqsatdT_liq(p, T):
    den = p - esat_liq(T) * (1. - EP)
    return ((EP / den - (1. + EP) * EP * esat_liq(T) / den ** 2)
            * LV * esat_liq(T) / (RV * T ** 2))


def dqsatdT_ice(p, T):
    den = p - esat_ice(T) * (1. - EP)
    return ((EP / den + (1. - EP) * EP * esat_ice(T) / den ** 2)
            * LS * esat_ice(T) / (RV * T ** 2))


def dqsatdT(p, T):
    a = water_fraction(T)
    return a * dqsatdT_liq(p, T) + (1. - a) * dqsatdT_ice(p, T)


def exner(p):
    return (p / P0) ** (RD / CP)


def virtual_temperature(exn, thl, qt, ql, qi):
    th = thl + LV * ql / (CP * exn) + LS * qi / (CP * exn)
    return th * (1. - (1. - RV / RD) * qt - RV / RD * (ql + qi))


def buoyancy(exn, thl, qt, ql, qi, thvref):
    return GRAV * (virtual_temperature(exn, thl, qt, ql, qi) - thvref) / thvref


def buoyancy_no_ql(thl, qt, thvref):
    return GRAV * (thl * (1. - (1. - RV / RD) * qt) - thvref) / thvref


def buoyancy_flux_no_ql(thl, thlflux, qt, qtflux, thvref):
    return GRAV / thvref * (thlflux * (1. - (1. - RV / RD) * qt)
                            - (1. - RV / RD) * thl * qtflux)


def sat_adjust_scalar(thl, qt, p, exn):
    """thermo_moist_functions.h:187-290, scalar: returns (ql, qi, t, qs)."""
    nitermax = 10
    niter = 0
    tnr_old = 1.e9

    tl = thl * exn
    qs = qsat_liq(p, tl)

    if qt - qs <= 0.:
        return 0., 0., tl, qs

    tnr = tl
    if tl >= T0:
        # warm adjustment: liquid only
        while abs(tnr - tnr_old) / tnr_old > 1.e-5 and niter < nitermax:
            niter += 1
            tnr_old = tnr
            qs = qsat_liq(p, tnr)
            f = tnr - tl - LV / CP * (qt - qs)
            f_prime = 1. + LV / CP * dqsatdT_liq(p, tnr)
            tnr -= f / f_prime
        qs = qsat_liq(p, tnr)
        return max(0., qt - qs), 0., tnr, qs

    # cold adjustment: mixed phase
    while abs(tnr - tnr_old) / tnr_old > 1.e-5 and niter < nitermax:
        niter += 1
        tnr_old = tnr
        qs = qsat(p, tnr)
        alpha_w = water_fraction(tnr)
        alpha_i = 1. - alpha_w
        dalphadT = 0.025 if 0. < alpha_w < 1. else 0.
        dqsatdT_w = dqsatdT_liq(p, tnr)
        dqsatdT_i = dqsatdT_ice(p, tnr)
        f = (tnr - tl - alpha_w * LV / CP * qt - alpha_i * LS / CP * qt
             + alpha_w * LV / CP * qs + alpha_i * LS / CP * qs)
        f_prime = (1.
                   - dalphadT * LV / CP * qt + dalphadT * LS / CP * qt
                   + dalphadT * LV / CP * qs - dalphadT * LS / CP * qs
                   + alpha_w * LV / CP * dqsatdT_w
                   + alpha_i * LS / CP * dqsatdT_i)
        tnr -= f / f_prime
    alpha_w = water_fraction(tnr)
    alpha_i = 1. - alpha_w
    qs = qsat(p, tnr)
    ql_qi = max(0., qt - qs)
    return alpha_w * ql_qi, alpha_i * ql_qi, tnr, qs
