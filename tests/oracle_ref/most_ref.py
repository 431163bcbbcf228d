"""Oracle transliteration of Monin-Obukhov surface-layer kernels.

Mirrors /root/reference/include/monin_obukhov.h (stability functions),
include/boundary_surface_kernels.h (calc_dutot :136-183, calc_duvdz_mo
:185-223, calc_dbdz_mo :225-243) and src/boundary_surface.cxx (stability
:56-134, surfm :180-288, surfs :290-339).

numpy, vectorized over the (j, i) surface plane; arrays carry explicit
periodic ghost cells like the other oracles.
"""

import numpy as np

KAPPA = 0.4
DBIG = 1.e9


# monin_obukhov.h:41-86
def phim_unstable(zeta):
    return (1. + 3.6 * np.abs(zeta) ** (2. / 3.)) ** -0.5


def phim_stable(zeta):
    return 1. + 5. * zeta


def phim(zeta):
    return np.where(zeta <= 0., phim_unstable(zeta), phim_stable(np.maximum(zeta, 0.)))


def phih_unstable(zeta):
    return (1. + 7.9 * np.abs(zeta) ** (2. / 3.)) ** -0.5


def phih_stable(zeta):
    return (1. + 4. * zeta) ** 2


def phih(zeta):
    return np.where(zeta <= 0., phih_unstable(zeta), phih_stable(np.maximum(zeta, 0.)))


# monin_obukhov.h:88-135
def psim_unstable(zeta):
    return 3. * np.log((1. + 1. / phim_unstable(zeta)) / 2.)


def psim_stable(zeta):
    a, b, c, d = 1., 2. / 3., 5., 0.35
    return -b * (zeta - c / d) * np.exp(-d * zeta) - a * zeta - (b * c) / d


def psih_unstable(zeta):
    return 3. * np.log((1. + 1. / phih_unstable(zeta)) / 2.)


def psih_stable(zeta):
    a, b, c, d = 1., 2. / 3., 5., 0.35
    return (-b * (zeta - c / d) * np.exp(-d * zeta)
            - (1. + b * a * zeta) ** 1.5 - (b * c) / d + 1.)


# monin_obukhov.h:137-151
def fm(zsl, z0m, L):
    Ls = np.where(L <= 0., 1., L)   # guard so stable branch sees L>0 only
    Lu = np.where(L <= 0., L, -1.)
    unstable = KAPPA / (np.log(zsl / z0m) - psim_unstable(zsl / Lu) + psim_unstable(z0m / Lu))
    stable = KAPPA / (np.log(zsl / z0m) - psim_stable(zsl / Ls) + psim_stable(z0m / Ls))
    return np.where(L <= 0., unstable, stable)


def fh(zsl, z0h, L):
    Ls = np.where(L <= 0., 1., L)
    Lu = np.where(L <= 0., L, -1.)
    unstable = KAPPA / (np.log(zsl / z0h) - psih_unstable(zsl / Lu) + psih_unstable(z0h / Lu))
    stable = KAPPA / (np.log(zsl / z0h) - psih_stable(zsl / Ls) + psih_stable(z0h / Ls))
    return np.where(L <= 0., unstable, stable)


# boundary_surface_kernels.h:136-183 — arrays with ghost cells, same (gc)
# layout as the 3-D oracles; u/v/ubot/vbot are (jcells, icells) planes of the
# kstart level.
def calc_dutot(u, v, ubot, vbot, istart, iend, jstart, jend):
    I, J = slice(istart, iend), slice(jstart, jend)

    def P(a, dj=0, di=0):
        return a[jstart + dj:jend + dj, istart + di:iend + di]

    u_f = (1. / 9) * (
        0.5 * P(u, -1, -1) + P(u, -1, 0) + P(u, -1, 1) + 0.5 * P(u, -1, 2)
        + 0.5 * P(u, 0, -1) + P(u, 0, 0) + P(u, 0, 1) + 0.5 * P(u, 0, 2)
        + 0.5 * P(u, 1, -1) + P(u, 1, 0) + P(u, 1, 1) + 0.5 * P(u, 1, 2))
    v_f = (1. / 9) * (
        0.5 * P(v, -1, -1) + P(v, 0, -1) + P(v, 1, -1) + 0.5 * P(v, 2, -1)
        + 0.5 * P(v, -1, 0) + P(v, 0, 0) + P(v, 1, 0) + 0.5 * P(v, 2, 0)
        + 0.5 * P(v, -1, 1) + P(v, 0, 1) + P(v, 1, 1) + 0.5 * P(v, 2, 1))
    du2 = ((u_f - 0.5 * (P(ubot) + P(ubot, 0, 1))) ** 2
           + (v_f - 0.5 * (P(vbot) + P(vbot, 1, 0))) ** 2)
    return np.maximum(np.sqrt(du2), 1.e-1)


# src/boundary_surface.cxx:180-288
def surfm_dirichlet(u, v, ubot, vbot, ustar, obuk, z0m, zsl,
                    istart, iend, jstart, jend):
    def P(a, dj=0, di=0):
        return a[jstart + dj:jend + dj, istart + di:iend + di]

    ufm = ustar * fm(zsl, z0m, obuk)   # full-plane, incl. ghosts
    ufluxbot = -(P(u) - P(ubot)) * 0.5 * (P(ufm, 0, -1) + P(ufm))
    vfluxbot = -(P(v) - P(vbot)) * 0.5 * (P(ufm, -1, 0) + P(ufm))
    ugradbot = (P(u) - P(ubot)) / zsl
    vgradbot = (P(v) - P(vbot)) / zsl
    return ufluxbot, vfluxbot, ugradbot, vgradbot


def surfm_ustar(u, v, ubot, vbot, ustar, zsl, istart, iend, jstart, jend):
    def P(a, dj=0, di=0):
        return a[jstart + dj:jend + dj, istart + di:iend + di]

    minval = 1.e-2
    du = u - ubot
    dv = v - vbot

    def Q(a, dj=0, di=0):
        return a[jstart + dj:jend + dj, istart + di:iend + di]

    vonu2 = np.maximum(minval, 0.25 * (
        Q(dv, 0, -1) ** 2 + Q(dv, 1, -1) ** 2 + Q(dv) ** 2 + Q(dv, 1, 0) ** 2))
    uonv2 = np.maximum(minval, 0.25 * (
        Q(du, -1, 0) ** 2 + Q(du, -1, 1) ** 2 + Q(du) ** 2 + Q(du, 0, 1) ** 2))
    u2 = np.maximum(minval, Q(du) ** 2)
    v2 = np.maximum(minval, Q(dv) ** 2)
    ustaronu4 = 0.5 * (P(ustar, 0, -1) ** 4 + P(ustar) ** 4)
    ustaronv4 = 0.5 * (P(ustar, -1, 0) ** 4 + P(ustar) ** 4)
    ufluxbot = -np.copysign(1., Q(du)) * (ustaronu4 / (1. + vonu2 / u2)) ** 0.5
    vfluxbot = -np.copysign(1., Q(dv)) * (ustaronv4 / (1. + uonv2 / v2)) ** 0.5
    ugradbot = Q(du) / zsl
    vgradbot = Q(dv) / zsl
    return ufluxbot, vfluxbot, ugradbot, vgradbot


# src/boundary_surface.cxx:290-339
def surfs_dirichlet(var, varbot, ustar, obuk, z0h, zsl):
    varfluxbot = -(var - varbot) * ustar * fh(zsl, z0h, obuk)
    vargradbot = (var - varbot) / zsl
    return varfluxbot, vargradbot


def surfs_flux(var, varfluxbot, ustar, obuk, z0h, zsl):
    varbot = varfluxbot / (ustar * fh(zsl, z0h, obuk)) + var
    vargradbot = (var - varbot) / zsl
    return varbot, vargradbot


# boundary_surface_kernels.h:185-243
def calc_duvdz_mo(u, v, ubot, vbot, ustar, obuk, z0m, zsl,
                  istart, iend, jstart, jend):
    def P(a, dj=0, di=0):
        return a[jstart + dj:jend + dj, istart + di:iend + di]

    du_c = 0.5 * ((P(u) - P(ubot)) + (P(u, 0, 1) - P(ubot, 0, 1)))
    dv_c = 0.5 * ((P(v) - P(vbot)) + (P(v, 1, 0) - P(vbot, 1, 0)))
    ufluxbot = -du_c * P(ustar) * fm(zsl, z0m, P(obuk))
    vfluxbot = -dv_c * P(ustar) * fm(zsl, z0m, P(obuk))
    dudz = -ufluxbot / (KAPPA * zsl * P(ustar)) * phim(zsl / P(obuk))
    dvdz = -vfluxbot / (KAPPA * zsl * P(ustar)) * phim(zsl / P(obuk))
    return dudz, dvdz


def calc_dbdz_mo(bfluxbot, ustar, obuk, zsl):
    return -bfluxbot / (KAPPA * zsl * ustar) * phih(zsl / obuk)


# src/boundary_surface.cxx:83-91 — Ustar_type + Flux_type
def obuk_ustar_flux(ustar, bfluxbot):
    return -(ustar ** 3) / (KAPPA * bfluxbot)
