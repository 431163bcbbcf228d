"""Oracle transliteration of the Smagorinsky diffusion kernels.

Mirrors /root/reference/src/diff_smag2.cxx: calc_strain2 (:48-155),
calc_evisc (:255-367), diff_u (:369-469), diff_v (:471-572), diff_w
(:574-617), diff_c (:619-709), calc_dnmul (:711-736).

numpy [k,j,i] arrays with ghost cells; surface_model enabled/disabled via
flag.  fm::pow2(x) == x*x; Constants::dsmall == 1e-9 (include/constants.h).
"""

import numpy as np

KAPPA = 0.4
DSMALL = 1.e-9


def _sq(x):
    return x * x


def calc_strain2(strain2, u, v, w, ugradbot, vgradbot, z, dzi, dzhi,
                 dxi, dyi, istart, iend, jstart, jend, kstart, kend,
                 surface_enabled):
    k_off = 1 if surface_enabled else 0
    I = slice(istart, iend)
    J = slice(jstart, jend)

    def S(arr, k, dj=0, di=0, ):
        return arr[k, jstart + dj:jend + dj, istart + di:iend + di]

    if surface_enabled:
        k = kstart
        strain2[k, J, I] = 2. * (
            _sq((S(u, k, 0, 1) - S(u, k)) * dxi)
            + _sq((S(v, k, 1, 0) - S(v, k)) * dyi)
            + _sq((S(w, k + 1) - S(w, k)) * dzi[k])
            + 0.125 * _sq((S(u, k) - S(u, k, -1)) * dyi + (S(v, k) - S(v, k, 0, -1)) * dxi)
            + 0.125 * _sq((S(u, k, 0, 1) - S(u, k, -1, 1)) * dyi + (S(v, k, 0, 1) - S(v, k)) * dxi)
            + 0.125 * _sq((S(u, k, 1) - S(u, k)) * dyi + (S(v, k, 1) - S(v, k, 1, -1)) * dxi)
            + 0.125 * _sq((S(u, k, 1, 1) - S(u, k, 0, 1)) * dyi + (S(v, k, 1, 1) - S(v, k, 1)) * dxi)
            + 0.5 * _sq(ugradbot[J, I])
            + 0.125 * _sq((S(w, k) - S(w, k, 0, -1)) * dxi)
            + 0.125 * _sq((S(w, k, 0, 1) - S(w, k)) * dxi)
            + 0.125 * _sq((S(w, k + 1) - S(w, k + 1, 0, -1)) * dxi)
            + 0.125 * _sq((S(w, k + 1, 0, 1) - S(w, k + 1)) * dxi)
            + 0.5 * _sq(vgradbot[J, I])
            + 0.125 * _sq((S(w, k) - S(w, k, -1)) * dyi)
            + 0.125 * _sq((S(w, k, 1) - S(w, k)) * dyi)
            + 0.125 * _sq((S(w, k + 1) - S(w, k + 1, -1)) * dyi)
            + 0.125 * _sq((S(w, k + 1, 1) - S(w, k + 1)) * dyi)) + DSMALL

    for k in range(kstart + k_off, kend):
        strain2[k, J, I] = 2. * (
            _sq((S(u, k, 0, 1) - S(u, k)) * dxi)
            + _sq((S(v, k, 1) - S(v, k)) * dyi)
            + _sq((S(w, k + 1) - S(w, k)) * dzi[k])
            + 0.125 * _sq((S(u, k) - S(u, k, -1)) * dyi + (S(v, k) - S(v, k, 0, -1)) * dxi)
            + 0.125 * _sq((S(u, k, 0, 1) - S(u, k, -1, 1)) * dyi + (S(v, k, 0, 1) - S(v, k)) * dxi)
            + 0.125 * _sq((S(u, k, 1) - S(u, k)) * dyi + (S(v, k, 1) - S(v, k, 1, -1)) * dxi)
            + 0.125 * _sq((S(u, k, 1, 1) - S(u, k, 0, 1)) * dyi + (S(v, k, 1, 1) - S(v, k, 1)) * dxi)
            + 0.125 * _sq((S(u, k) - S(u, k - 1)) * dzhi[k] + (S(w, k) - S(w, k, 0, -1)) * dxi)
            + 0.125 * _sq((S(u, k, 0, 1) - S(u, k - 1, 0, 1)) * dzhi[k] + (S(w, k, 0, 1) - S(w, k)) * dxi)
            + 0.125 * _sq((S(u, k + 1) - S(u, k)) * dzhi[k + 1] + (S(w, k + 1) - S(w, k + 1, 0, -1)) * dxi)
            + 0.125 * _sq((S(u, k + 1, 0, 1) - S(u, k, 0, 1)) * dzhi[k + 1] + (S(w, k + 1, 0, 1) - S(w, k + 1)) * dxi)
            + 0.125 * _sq((S(v, k) - S(v, k - 1)) * dzhi[k] + (S(w, k) - S(w, k, -1)) * dyi)
            + 0.125 * _sq((S(v, k, 1) - S(v, k - 1, 1)) * dzhi[k] + (S(w, k, 1) - S(w, k)) * dyi)
            + 0.125 * _sq((S(v, k + 1) - S(v, k)) * dzhi[k + 1] + (S(w, k + 1) - S(w, k + 1, -1)) * dyi)
            + 0.125 * _sq((S(v, k + 1, 1) - S(v, k, 1)) * dzhi[k + 1] + (S(w, k + 1, 1) - S(w, k + 1)) * dyi)) + DSMALL
    return strain2


def calc_evisc(evisc, N2, bgradbot, z, dz, z0m, dx, dy, cs, tPr,
               istart, iend, jstart, jend, kstart, kend, surface_enabled):
    """evisc holds strain2 on entry (as in the reference call sequence)."""
    I = slice(istart, iend)
    J = slice(jstart, jend)

    if not surface_enabled:
        for k in range(kstart, kend):
            mlen = cs * (dx * dy * dz[k]) ** (1. / 3.)
            fac = _sq(mlen)
            Ri = np.minimum(N2[k, J, I] / evisc[k, J, I] / tPr, 1. - DSMALL)
            evisc[k, J, I] = fac * np.sqrt(evisc[k, J, I]) * np.sqrt(1. - Ri)
        evisc[kstart - 1] = evisc[kstart]
        evisc[kend] = evisc[kend - 1]
        return evisc

    n = 2.
    mlen0 = cs * (dx * dy * dz[kstart]) ** (1. / 3.)
    Ri = np.minimum(bgradbot[J, I] / evisc[kstart, J, I] / tPr, 1. - DSMALL)
    mlen = (1. / (1. / mlen0 ** n + 1. / (KAPPA * (z[kstart] + z0m)) ** n)) ** (1. / n)
    evisc[kstart, J, I] = _sq(mlen) * np.sqrt(evisc[kstart, J, I]) * np.sqrt(1. - Ri)

    for k in range(kstart + 1, kend):
        mlen0 = cs * (dx * dy * dz[k]) ** (1. / 3.)
        Ri = np.minimum(N2[k, J, I] / evisc[k, J, I] / tPr, 1. - DSMALL)
        mlen = (1. / (1. / mlen0 ** n + 1. / (KAPPA * (z[k] + z0m)) ** n)) ** (1. / n)
        evisc[k, J, I] = _sq(mlen) * np.sqrt(evisc[k, J, I]) * np.sqrt(1. - Ri)
    return evisc


def _quarter(e, k, dj, di, dk):
    """0.25*(e[ijk+off1]+e[ijk]+...) helper built at call sites instead."""
    raise NotImplementedError


def diff_u(ut, u, v, w, dzi, dzhi, dxi, dyi, evisc, fluxbot, fluxtop,
           rhoref, rhorefh, visc, istart, iend, jstart, jend, kstart, kend,
           surface_enabled):
    I = slice(istart, iend)
    J = slice(jstart, jend)

    def E(k, dj=0, di=0):
        return evisc[k, jstart + dj:jend + dj, istart + di:iend + di]

    def A(arr, k, dj=0, di=0):
        return arr[k, jstart + dj:jend + dj, istart + di:iend + di]

    def row(k, evisct_term):
        evisce = E(k) + visc
        eviscw = E(k, 0, -1) + visc
        eviscn = 0.25 * (E(k, 0, -1) + E(k) + E(k, 1, -1) + E(k, 1)) + visc
        eviscs = 0.25 * (E(k, -1, -1) + E(k, -1) + E(k, 0, -1) + E(k)) + visc
        ut[k, J, I] += (
            (evisce * (A(u, k, 0, 1) - A(u, k)) * dxi
             - eviscw * (A(u, k) - A(u, k, 0, -1)) * dxi) * 2. * dxi
            + (eviscn * ((A(u, k, 1) - A(u, k)) * dyi + (A(v, k, 1) - A(v, k, 1, -1)) * dxi)
               - eviscs * ((A(u, k) - A(u, k, -1)) * dyi + (A(v, k) - A(v, k, 0, -1)) * dxi)) * dyi
            + evisct_term)

    def evisct(k):
        return 0.25 * (E(k, 0, -1) + E(k) + E(k + 1, 0, -1) + E(k + 1)) + visc

    def eviscb(k):
        return 0.25 * (E(k - 1, 0, -1) + E(k - 1) + E(k, 0, -1) + E(k)) + visc

    def gradt(k):
        return (A(u, k + 1) - A(u, k)) * dzhi[k + 1] + (A(w, k + 1) - A(w, k + 1, 0, -1)) * dxi

    def gradb(k):
        return (A(u, k) - A(u, k - 1)) * dzhi[k] + (A(w, k) - A(w, k, 0, -1)) * dxi

    if surface_enabled:
        k = kstart
        row(k, (rhorefh[k + 1] * evisct(k) * gradt(k)
                + rhorefh[k] * fluxbot[J, I]) / rhoref[k] * dzi[k])
        k = kend - 1
        row(k, (-rhorefh[kend] * fluxtop[J, I]
                - rhorefh[kend - 1] * eviscb(k) * gradb(k)) / rhoref[k] * dzi[k])
        krange = range(kstart + 1, kend - 1)
    else:
        krange = range(kstart, kend)
    for k in krange:
        row(k, (rhorefh[k + 1] * evisct(k) * gradt(k)
                - rhorefh[k] * eviscb(k) * gradb(k)) / rhoref[k] * dzi[k])
    return ut


def diff_v(vt, u, v, w, dzi, dzhi, dxi, dyi, evisc, fluxbot, fluxtop,
           rhoref, rhorefh, visc, istart, iend, jstart, jend, kstart, kend,
           surface_enabled):
    I = slice(istart, iend)
    J = slice(jstart, jend)

    def E(k, dj=0, di=0):
        return evisc[k, jstart + dj:jend + dj, istart + di:iend + di]

    def A(arr, k, dj=0, di=0):
        return arr[k, jstart + dj:jend + dj, istart + di:iend + di]

    def row(k, vt_term):
        evisce = 0.25 * (E(k, -1) + E(k) + E(k, -1, 1) + E(k, 0, 1)) + visc
        eviscw = 0.25 * (E(k, -1, -1) + E(k, 0, -1) + E(k, -1) + E(k)) + visc
        eviscn = E(k) + visc
        eviscs = E(k, -1) + visc
        vt[k, J, I] += (
            (evisce * ((A(v, k, 0, 1) - A(v, k)) * dxi + (A(u, k, 0, 1) - A(u, k, -1, 1)) * dyi)
             - eviscw * ((A(v, k) - A(v, k, 0, -1)) * dxi + (A(u, k) - A(u, k, -1)) * dyi)) * dxi
            + (eviscn * (A(v, k, 1) - A(v, k)) * dyi
               - eviscs * (A(v, k) - A(v, k, -1)) * dyi) * 2. * dyi
            + vt_term)

    def evisct(k):
        return 0.25 * (E(k, -1) + E(k) + E(k + 1, -1) + E(k + 1)) + visc

    def eviscb(k):
        return 0.25 * (E(k - 1, -1) + E(k - 1) + E(k, -1) + E(k)) + visc

    def gradt(k):
        return (A(v, k + 1) - A(v, k)) * dzhi[k + 1] + (A(w, k + 1) - A(w, k + 1, -1)) * dyi

    def gradb(k):
        return (A(v, k) - A(v, k - 1)) * dzhi[k] + (A(w, k) - A(w, k, -1)) * dyi

    if surface_enabled:
        k = kstart
        row(k, (rhorefh[k + 1] * evisct(k) * gradt(k)
                + rhorefh[k] * fluxbot[J, I]) / rhoref[k] * dzi[k])
        k = kend - 1
        row(k, (-rhorefh[kend] * fluxtop[J, I]
                - rhorefh[kend - 1] * eviscb(k) * gradb(k)) / rhoref[k] * dzi[k])
        krange = range(kstart + 1, kend - 1)
    else:
        krange = range(kstart, kend)
    for k in krange:
        row(k, (rhorefh[k + 1] * evisct(k) * gradt(k)
                - rhorefh[k] * eviscb(k) * gradb(k)) / rhoref[k] * dzi[k])
    return vt


def diff_w(wt, u, v, w, dzi, dzhi, dxi, dyi, evisc, rhoref, rhorefh, visc,
           istart, iend, jstart, jend, kstart, kend):
    I = slice(istart, iend)
    J = slice(jstart, jend)

    def E(k, dj=0, di=0):
        return evisc[k, jstart + dj:jend + dj, istart + di:iend + di]

    def A(arr, k, dj=0, di=0):
        return arr[k, jstart + dj:jend + dj, istart + di:iend + di]

    for k in range(kstart + 1, kend):
        evisce = 0.25 * (E(k - 1) + E(k) + E(k - 1, 0, 1) + E(k, 0, 1)) + visc
        eviscw = 0.25 * (E(k - 1, 0, -1) + E(k, 0, -1) + E(k - 1) + E(k)) + visc
        eviscn = 0.25 * (E(k - 1) + E(k) + E(k - 1, 1) + E(k, 1)) + visc
        eviscs = 0.25 * (E(k - 1, -1) + E(k, -1) + E(k - 1) + E(k)) + visc
        evisct = E(k) + visc
        eviscb = E(k - 1) + visc
        wt[k, J, I] += (
            (evisce * ((A(w, k, 0, 1) - A(w, k)) * dxi + (A(u, k, 0, 1) - A(u, k - 1, 0, 1)) * dzhi[k])
             - eviscw * ((A(w, k) - A(w, k, 0, -1)) * dxi + (A(u, k) - A(u, k - 1)) * dzhi[k])) * dxi
            + (eviscn * ((A(w, k, 1) - A(w, k)) * dyi + (A(v, k, 1) - A(v, k - 1, 1)) * dzhi[k])
               - eviscs * ((A(w, k) - A(w, k, -1)) * dyi + (A(v, k) - A(v, k - 1)) * dzhi[k])) * dyi
            + (rhoref[k] * evisct * (A(w, k + 1) - A(w, k)) * dzi[k]
               - rhoref[k - 1] * eviscb * (A(w, k) - A(w, k - 1)) * dzi[k - 1]) / rhorefh[k] * 2. * dzhi[k])
    return wt


def diff_c(at, a, dzi, dzhi, dxidxi, dyidyi, evisc, fluxbot, fluxtop,
           rhoref, rhorefh, tPr, visc, istart, iend, jstart, jend,
           kstart, kend, surface_enabled):
    I = slice(istart, iend)
    J = slice(jstart, jend)

    def E(k, dj=0, di=0):
        return evisc[k, jstart + dj:jend + dj, istart + di:iend + di]

    def A(arr, k, dj=0, di=0):
        return arr[k, jstart + dj:jend + dj, istart + di:iend + di]

    def row(k, zterm):
        evisce = 0.5 * (E(k) + E(k, 0, 1)) / tPr + visc
        eviscw = 0.5 * (E(k, 0, -1) + E(k)) / tPr + visc
        eviscn = 0.5 * (E(k) + E(k, 1)) / tPr + visc
        eviscs = 0.5 * (E(k, -1) + E(k)) / tPr + visc
        at[k, J, I] += (
            (evisce * (A(a, k, 0, 1) - A(a, k)) - eviscw * (A(a, k) - A(a, k, 0, -1))) * dxidxi
            + (eviscn * (A(a, k, 1) - A(a, k)) - eviscs * (A(a, k) - A(a, k, -1))) * dyidyi
            + zterm)

    def evisct(k):
        return 0.5 * (E(k) + E(k + 1)) / tPr + visc

    def eviscb(k):
        return 0.5 * (E(k - 1) + E(k)) / tPr + visc

    if surface_enabled:
        k = kstart
        row(k, (rhorefh[k + 1] * evisct(k) * (A(a, k + 1) - A(a, k)) * dzhi[k + 1]
                + rhorefh[k] * fluxbot[J, I]) / rhoref[k] * dzi[k])
        k = kend - 1
        row(k, (-rhorefh[kend] * fluxtop[J, I]
                - rhorefh[kend - 1] * eviscb(k) * (A(a, k) - A(a, k - 1)) * dzhi[kend - 1])
               / rhoref[k] * dzi[k])
        krange = range(kstart + 1, kend - 1)
    else:
        krange = range(kstart, kend)
    for k in krange:
        row(k, (rhorefh[k + 1] * evisct(k) * (A(a, k + 1) - A(a, k)) * dzhi[k + 1]
                - rhorefh[k] * eviscb(k) * (A(a, k) - A(a, k - 1)) * dzhi[k]) / rhoref[k] * dzi[k])
    return at


def calc_dnmul(evisc, dzi, dxidxi, dyidyi, tPr,
               istart, iend, jstart, jend, kstart, kend):
    tPrfac_i = 1. / min(1., tPr)
    dnmul = 0.
    for k in range(kstart, kend):
        dnmul = max(dnmul, np.abs(
            evisc[k, jstart:jend, istart:iend] * tPrfac_i
            * (dxidxi + dyidyi + dzi[k] * dzi[k])).max())
    return dnmul
