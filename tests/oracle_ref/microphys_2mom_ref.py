"""Oracle transliteration of the Seifert-Beheng 2-moment warm-rain scheme.

Mirrors the reference kernels in /root/reference/src/microphys_2mom_warm.cxx
(autoconversion :94-128, accretion :131-158, prepare slice :243-275,
evaporation :278-318, selfcollection_breakup :321-370, sedimentation_ss08
:373-539) and the helpers/constants of include/microphys_2mom_warm.h.

Scalar per-point (conversions) / per-column (sedimentation) loops, used to
pin the vectorized JAX implementation in microhh_tpu/ops/microphys.py —
including the reference quirks: the rational tanh2 in mu_r, the cc advance
reading c at the cell just left, and the nr loop's dzi at the output row.
"""

import math

import numpy as np

from .thermo_moist_ref import esat_liq, qsat_liq

# Micro_2mom_warm_constants (microphys_2mom_warm.h:53-70)
PI = 3.14159265359
K_T = 2.5e-2
D_V = 3.e-5
RHO_W = 1.e3
RHO_0 = 1.225
PIRHOW = PI * RHO_W / 6.
MC_MAX = 2.6e-10
MR_MIN = MC_MAX
MR_MAX = 3e-6
QL_MIN = 1.e-6
QR_MIN = 1.e-15
X_STAR = 2.6e-10
DSMALL = 1.e-9
LV = 2.501e6
CP = 1005.
RV = 461.5


def tanh2(x):
    return x * (27. + x * x) / (27. + 9. * x * x)


def calc_rain_mass(qr, nr, rho):
    mr = rho * qr / max(nr, 1.)
    return min(max(mr, MR_MIN), MR_MAX)


def calc_rain_diameter(mr):
    return (mr / PIRHOW) ** (1. / 3.)


def calc_mu_r(dr):
    return 10. * (1. + tanh2(1200. * (dr - 0.0015)))


def calc_lambda_r(mur, dr):
    return ((mur + 3.) * (mur + 2.) * (mur + 1.)) ** (1. / 3.) / dr


def minmod(a, b):
    return math.copysign(1., a) * max(0., min(abs(a), math.copysign(1., a) * b))


def conversion_cell(qr, nr, qt, thl, ql, rho, exner, p, nc):
    """All per-cell conversion tendencies for one grid point:
    returns (qrt, nrt, qtt, thlt)."""
    qrt = nrt = qtt = thlt = 0.

    # autoconversion (:94-128)
    x_star, k_cc, nu_c = 2.6e-10, 9.44e9, 1.
    kccxs = k_cc / (20. * x_star) * (nu_c + 2.) * (nu_c + 4.) / (nu_c + 1.) ** 2
    if ql > QL_MIN:
        xc = rho * ql / nc
        tau = 1. - ql / (ql + qr + DSMALL)
        phi_au = 600. * tau ** 0.68 * (1. - tau ** 0.68) ** 3
        au = RHO_0 * kccxs * ql ** 2 * xc ** 2 * (1. + phi_au / (1. - tau) ** 2)
        qrt += au
        nrt += au * rho / x_star
        qtt -= au
        thlt += LV / (CP * exner) * au

    # accretion (:131-158)
    if ql > QL_MIN and qr > QR_MIN:
        tau = 1. - ql / (ql + qr)
        phi_ac = (tau / (tau + 5e-5)) ** 4
        ac = 5.25 * ql * qr * phi_ac * math.sqrt(RHO_0 / rho)
        qrt += ac
        qtt -= ac
        thlt += LV / (CP * exner) * ac

    if qr > QR_MIN:
        mr = calc_rain_mass(qr, nr, rho)
        dr = calc_rain_diameter(mr)
        mur = calc_mu_r(dr)
        lamr = calc_lambda_r(mur, dr)

        # evaporation (:278-318)
        T = thl * exner + (LV * ql) / (CP * exner)
        Glv = 1. / (RV * T / (esat_liq(T) * D_V)
                    + (LV / (K_T * T)) * (LV / (RV * T) - 1.))
        S = (qt - ql) / qsat_liq(p, T) - 1.
        ev = 2. * PI * dr * Glv * S * 1. * nr / rho
        qrt += ev
        nrt += 1. * ev * rho / mr
        qtt -= ev
        thlt += LV / (CP * exner) * ev

        # selfcollection & breakup (:321-370)
        k_rr, kappa_rr, D_eq = 7.12, 60.7, 0.9e-3
        sc = (-k_rr * nr * qr * rho
              / (1. + kappa_rr / lamr * PIRHOW ** (1. / 3.)) ** 9
              * math.sqrt(RHO_0 / rho))
        nrt += sc
        dDr = dr - D_eq
        if dr > 0.35e-3:
            if dr <= D_eq:
                phi_br = 1.0e3 * dDr
            else:
                phi_br = 2. * math.exp(2.3e3 * dDr) - 1.
            nrt += -(phi_br + 1.) * sc
    return qrt, nrt, qtt, thlt


def sedimentation_column(qr, nr, rho, dzi, dz, dt, ks, ke):
    """SS08 sedimentation for ONE column (:373-539).

    qr, nr: full kcells columns (ghosts included, used by the slopes);
    returns (qrt[ks:ke], nrt[ks:ke], rr_bot)."""
    kc = len(qr)
    w_max, a_R, c_R = 9.65, 9.65, 600.
    b_R = a_R * math.exp(c_R * 25.0e-6)

    w_qr = np.zeros(kc + 1)
    w_nr = np.zeros(kc + 1)
    for k in range(ks, ke):
        if qr[k] > QR_MIN:
            mr = calc_rain_mass(qr[k], nr[k], rho[k])
            dr = calc_rain_diameter(mr)
            mur = calc_mu_r(dr)
            lamr = calc_lambda_r(mur, dr)
            rho_n = math.sqrt(1.2 / rho[k])
            w_qr[k] = min(w_max, max(0.1, rho_n * a_R - b_R * (1. + c_R / lamr) ** (-(mur + 4.))))
            w_nr[k] = min(w_max, max(0.1, rho_n * a_R - b_R * (1. + c_R / lamr) ** (-(mur + 1.))))
    w_qr[ks - 1] = w_qr[ks]
    w_nr[ks - 1] = w_nr[ks]
    w_qr[ke] = 0.
    w_nr[ke] = 0.

    c_qr = np.zeros(kc)
    c_nr = np.zeros(kc)
    for k in range(ks, ke):
        c_qr[k] = 0.25 * (w_qr[k - 1] + 2. * w_qr[k] + w_qr[k + 1]) * dzi[k] * dt
        c_nr[k] = 0.25 * (w_nr[k - 1] + 2. * w_nr[k] + w_nr[k + 1]) * dzi[k] * dt

    slope_qr = np.zeros(kc)
    slope_nr = np.zeros(kc)
    for k in range(ks, ke):
        slope_qr[k] = minmod(qr[k] - qr[k - 1], qr[k + 1] - qr[k])
        slope_nr[k] = minmod(nr[k] - nr[k - 1], nr[k + 1] - nr[k])

    flux_qr = np.zeros(kc + 1)
    flux_nr = np.zeros(kc + 1)
    for k in range(ke - 1, ks - 1, -1):
        # q_rain: note the reference advances cc with c at the cell it just
        # LEFT and dzi at the NEW cell (:480-487)
        kk = k
        ftot, dzz = 0., 0.
        cc = min(1., c_qr[k])
        while cc > 0. and kk < ke:
            ftot += rho[kk] * (qr[kk] + 0.5 * slope_qr[kk] * (1. - cc)) * cc * dz[kk]
            ikk = kk
            dzz += dz[kk]
            kk += 1
            cc = min(1., c_qr[ikk] - dzz * dzi[kk]) if kk < kc else 0.
        ftot = min(ftot, rho[k] * dz[k] * qr[k] - flux_qr[k + 1] * dt)
        flux_qr[k] = -ftot / dt

        # number density: quirk — dzi stays at the output row k (:508)
        kk = k
        ftot, dzz = 0., 0.
        cc = min(1., c_nr[k])
        while cc > 0. and kk < ke:
            ftot += rho[kk] * (nr[kk] + 0.5 * slope_nr[kk] * (1. - cc)) * cc * dz[kk]
            ikk = kk
            dzz += dz[kk]
            kk += 1
            cc = min(1., c_nr[ikk] - dzz * dzi[k])
        ftot = min(ftot, rho[k] * dz[k] * nr[k] - flux_nr[k + 1] * dt)
        flux_nr[k] = -ftot / dt

    qrt = np.zeros(ke - ks)
    nrt = np.zeros(ke - ks)
    for k in range(ks, ke):
        qrt[k - ks] = -(flux_qr[k + 1] - flux_qr[k]) / rho[k] * dzi[k]
        nrt[k - ks] = -(flux_nr[k + 1] - flux_nr[k]) / rho[k] * dzi[k]
    return qrt, nrt, -flux_qr[ks]
