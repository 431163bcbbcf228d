"""Oracle transliteration of the budget_2 statistics kernels.

Mirrors /root/reference/src/budget_2.cxx:51-1278 row by row, including the
fork's quirks (uw_diss z-part overwrite, the non-demeaned stencil point in
interior w2_turb).  Arrays are numpy [k, j, i] with ghost cells; functions
fill 3-D term fields over the same loop ranges as the reference; the test
horizontally averages them.
"""

import numpy as np


def i2(a, b):
    return 0.5 * (a + b)


def i22(a, b, c, d):
    return 0.25 * (a + b + c + d)


class _P:
    def __init__(self, arr, k, js, je, is_, ie):
        self.arr, self.k = arr, k
        self.js, self.je, self.is_, self.ie = js, je, is_, ie

    def __call__(self, dk=0, dj=0, di=0):
        return self.arr[self.k + dk,
                        self.js + dj:self.je + dj,
                        self.is_ + di:self.ie + di]


def _mk(shape):
    return np.zeros(shape)


def shear_terms(u, v, w, umean, vmean, wmean, wx, wy, dzi, dzhi,
                istart, iend, jstart, jend, kstart, kend):
    sh = {n: _mk(u.shape) for n in
          ("u2_shear", "v2_shear", "tke_shear", "uw_shear", "vw_shear")}
    for k in range(kstart, kend):
        U, V = (_P(a, k, jstart, jend, istart, iend) for a in (u, v))
        WX, WY = (_P(a, k, jstart, jend, istart, iend) for a in (wx, wy))
        dudz = (i2(umean[k], umean[k + 1]) - i2(umean[k - 1], umean[k])) * dzi[k]
        dvdz = (i2(vmean[k], vmean[k + 1]) - i2(vmean[k - 1], vmean[k])) * dzi[k]
        I, J = slice(istart, iend), slice(jstart, jend)
        sh["u2_shear"][k, J, I] = -2. * (U() - umean[k]) * i2(
            WX() - wmean[k], WX(1) - wmean[k + 1]) * dudz
        sh["v2_shear"][k, J, I] = -2. * (V() - vmean[k]) * i2(
            WY() - wmean[k], WY(1) - wmean[k + 1]) * dvdz
        sh["uw_shear"][k, J, I] = -WX() ** 2 * (umean[k] - umean[k - 1]) * dzhi[k]
        sh["vw_shear"][k, J, I] = -WY() ** 2 * (vmean[k] - vmean[k - 1]) * dzhi[k]
        sh["tke_shear"][k, J, I] = 0.5 * (sh["u2_shear"][k, J, I]
                                          + sh["v2_shear"][k, J, I])
    return sh


def turb_terms(u, v, w, umean, vmean, wmean, wx, wy, dzi, dzhi,
               istart, iend, jstart, jend, kstart, kend):
    tb = {n: _mk(u.shape) for n in
          ("u2_turb", "v2_turb", "w2_turb", "tke_turb", "uw_turb", "vw_turb")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
        WX, WY = (_P(a, k, jstart, jend, istart, iend) for a in (wx, wy))
        tb["u2_turb"][k, J, I] = -(
            i2(U() - umean[k], U(1) - umean[k + 1]) ** 2 * (WX(1) - wmean[k + 1])
            - i2(U() - umean[k], U(-1) - umean[k - 1]) ** 2 * (WX() - wmean[k])
        ) * dzi[k]
        tb["v2_turb"][k, J, I] = -(
            i2(V() - vmean[k], V(1) - vmean[k + 1]) ** 2 * (WY(1) - wmean[k + 1])
            - i2(V() - vmean[k], V(-1) - vmean[k - 1]) ** 2 * (WY() - wmean[k])
        ) * dzi[k]
        tb["tke_turb"][k, J, I] = (
            -0.5 * ((W(1) - wmean[k + 1]) ** 3 - (W() - wmean[k]) ** 3) * dzi[k]
            + 0.5 * (tb["u2_turb"][k, J, I] + tb["v2_turb"][k, J, I]))
    # boundaries
    k = kstart
    U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
    WX, WY = (_P(a, k, jstart, jend, istart, iend) for a in (wx, wy))
    tb["w2_turb"][k, J, I] = -2. * i2(W(), W(1)) ** 3 * dzhi[k]
    tb["uw_turb"][k, J, I] = -(
        (U() - umean[k]) * i2(WX() - wmean[k], WX(1) - wmean[k + 1]) ** 2
        - (U(-1) - umean[k - 1]) * i2(WX() - wmean[k],
                                      WX(-1) - wmean[k + 1]) ** 2) * dzhi[k]
    tb["vw_turb"][k, J, I] = -(
        (V() - vmean[k]) * i2(WY() - wmean[k], WY(1) - wmean[k + 1]) ** 2
        - (V(-1) - vmean[k - 1]) * i2(WY() - wmean[k],
                                      WY(-1) - wmean[k + 1]) ** 2) * dzhi[k]
    k = kend
    U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
    WX, WY = (_P(a, k, jstart, jend, istart, iend) for a in (wx, wy))
    tb["w2_turb"][k, J, I] = -2. * i2(W() - wmean[k], W(-1) - wmean[k - 1]) ** 3 * dzhi[k]
    tb["uw_turb"][k, J, I] = -(
        (U() - umean[k]) * i2(WX() - wmean[k], WX(-1) - wmean[k - 1]) ** 2
        - (U(-1) - umean[k - 1]) * i2(WX() - wmean[k],
                                      WX(-1) - wmean[k - 1]) ** 2) * dzhi[k]
    tb["vw_turb"][k, J, I] = -(
        (V() - vmean[k]) * i2(WY() - wmean[k], WY(-1) - wmean[k - 1]) ** 2
        - (V(-1) - vmean[k - 1]) * i2(WY() - wmean[k],
                                      WY(-1) - wmean[k - 1]) ** 2) * dzhi[k]
    for k in range(kstart + 1, kend):
        U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
        WX, WY = (_P(a, k, jstart, jend, istart, iend) for a in (wx, wy))
        # NOTE budget_2.cxx:225 — w[ijk-kk] is NOT demeaned (fork quirk)
        tb["w2_turb"][k, J, I] = -(
            i2(W() - wmean[k], W(1) - wmean[k + 1]) ** 3
            - i2(W() - wmean[k], W(-1)) ** 3) * dzhi[k]
        tb["uw_turb"][k, J, I] = -(
            (U() - umean[k]) * i2(WX() - wmean[k], WX(1) - wmean[k + 1]) ** 2
            - (U(-1) - umean[k - 1]) * i2(WX() - wmean[k],
                                          WX(-1) - wmean[k - 1]) ** 2) * dzhi[k]
        tb["vw_turb"][k, J, I] = -(
            (V() - vmean[k]) * i2(WY() - wmean[k], WY(1) - wmean[k + 1]) ** 2
            - (V(-1) - vmean[k - 1]) * i2(WY() - wmean[k],
                                          WY(-1) - wmean[k - 1]) ** 2) * dzhi[k]
    return tb


def coriolis_terms(u, v, w, umean, vmean, wmean, fc,
                   istart, iend, jstart, jend, kstart, kend):
    co = {n: _mk(u.shape) for n in ("u2_cor", "v2_cor", "uw_cor", "vw_cor")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        U, V = (_P(a, k, jstart, jend, istart, iend) for a in (u, v))
        co["u2_cor"][k, J, I] = 2. * (U() - umean[k]) * (
            i22(V(0, 0, -1), V(), V(0, 1, -1), V(0, 1, 0)) - vmean[k]) * fc
        co["v2_cor"][k, J, I] = -2. * (V() - vmean[k]) * (
            i22(U(0, -1, 0), U(), U(0, -1, 1), U(0, 0, 1)) - umean[k]) * fc
    for k in range(kstart + 1, kend):
        U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
        co["uw_cor"][k, J, I] = i2(W() - wmean[k], W(0, 0, -1) - wmean[k]) * i2(
            i22(V() - vmean[k], V(0, 0, -1) - vmean[k],
                V(-1, 0, -1) - vmean[k - 1], V(-1) - vmean[k - 1]),
            i22(V(0, 1, 0) - vmean[k], V(0, 1, -1) - vmean[k],
                V(-1, 1, -1) - vmean[k - 1], V(-1, 1, 0) - vmean[k - 1])) * fc
        co["vw_cor"][k, J, I] = i2(W() - wmean[k], W(0, -1, 0) - wmean[k]) * i2(
            i22(U() - umean[k], U(0, -1, 0) - umean[k],
                U(-1, -1, 0) - umean[k - 1], U(-1) - umean[k - 1]),
            i22(U(0, 0, 1) - umean[k], U(0, -1, 1) - umean[k],
                U(-1, -1, 1) - umean[k - 1], U(-1, 0, 1) - umean[k - 1])) * fc
    return co


def pressure_transport_terms(u, v, w, p, umean, vmean, wmean, dzi, dzhi,
                             dxi, dyi, istart, iend, jstart, jend,
                             kstart, kend):
    pr = {n: _mk(u.shape) for n in ("w2_pres", "tke_pres", "uw_pres", "vw_pres")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        U, V, W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w, p))
        pr["tke_pres"][k, J, I] = -(
            i2(Pp(), Pp(1)) * (W(1) - wmean[k + 1])
            - i2(Pp(), Pp(-1)) * (W() - wmean[k])) * dzi[k]
        pr["uw_pres"][k, J, I] = (
            -(i2(Pp(), Pp(-1)) * (W() - wmean[k])
              - i2(Pp(0, 0, -1), Pp(-1, 0, -1)) * (W(0, 0, -1) - wmean[k])) * dxi
            + (i2(Pp(), Pp(0, 0, -1)) * (U() - umean[k])
               - i2(Pp(-1), Pp(-1, 0, -1)) * (U(-1) - umean[k - 1])) * dzhi[k])
        pr["vw_pres"][k, J, I] = (
            -(i2(Pp(-1), Pp()) * (W() - wmean[k])
              - i2(Pp(-1, -1, 0), Pp(0, -1, 0)) * (W(0, -1, 0) - wmean[k])) * dyi
            + (i2(Pp(0, -1, 0), Pp()) * (V() - vmean[k])
               - i2(Pp(-1, -1, 0), Pp(-1)) * (V(-1) - vmean[k - 1])) * dzhi[k])
    k = kstart
    W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (w, p))
    pr["w2_pres"][k, J, I] = -2. * (
        i2(W() - wmean[k], W(1) - wmean[k + 1]) * Pp()
        - (-i2(W() - wmean[k], W(1) - wmean[k + 1])) * Pp(-1)) * dzhi[k]
    for k in range(kstart + 1, kend):
        W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (w, p))
        pr["w2_pres"][k, J, I] = -2. * (
            i2(W() - wmean[k], W(1) - wmean[k + 1]) * Pp()
            - i2(W() - wmean[k], W(-1) - wmean[k - 1]) * Pp(-1)) * dzhi[k]
    return pr


def pressure_redistribution_terms(u, v, w, p, umean, vmean, wmean, dzi, dzhi,
                                  dxi, dyi, istart, iend, jstart, jend,
                                  kstart, kend):
    rd = {n: _mk(u.shape) for n in
          ("u2_rdstr", "v2_rdstr", "w2_rdstr", "uw_rdstr", "vw_rdstr")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        U, V, W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w, p))
        rd["u2_rdstr"][k, J, I] = 2. * i2(Pp(), Pp(0, 0, -1)) * (
            i2(U() - umean[k], U(0, 0, 1) - umean[k])
            - i2(U() - umean[k], U(0, 0, -1) - umean[k])) * dxi
        rd["v2_rdstr"][k, J, I] = 2. * i2(Pp(), Pp(0, -1, 0)) * (
            i2(V() - vmean[k], V(0, 1, 0) - vmean[k])
            - i2(V() - vmean[k], V(0, -1, 0) - vmean[k])) * dyi
        rd["uw_rdstr"][k, J, I] = i22(Pp(), Pp(-1), Pp(-1, 0, -1), Pp(0, 0, -1)) * (
            ((U() - umean[k]) - (U(-1) - umean[k - 1])) * dzhi[k]
            + (W() - W(0, 0, -1)) * dxi)
        rd["vw_rdstr"][k, J, I] = i22(Pp(), Pp(-1), Pp(-1, -1, 0), Pp(0, -1, 0)) * (
            ((V() - vmean[k]) - (V(-1) - vmean[k - 1])) * dzhi[k]
            + (W() - W(0, -1, 0)) * dyi)
    k = kstart
    W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (w, p))
    rd["w2_rdstr"][k, J, I] = 2. * i2(Pp(), Pp(-1)) * (
        W(1) - wmean[k + 1] - (W() - wmean[k])) * dzi[k]
    for k in range(kstart + 1, kend):
        W, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (w, p))
        rd["w2_rdstr"][k, J, I] = 2. * i2(Pp(), Pp(-1)) * (
            i2(W() - wmean[k], W(1) - wmean[k + 1])
            - i2(W() - wmean[k], W(-1) - wmean[k - 1])) * dzhi[k]
    return rd


def diffusion_transport_terms_dns(u, v, w, umean, vmean, wmean, wx, dzi, dzhi,
                                  dxi, dyi, visc, istart, iend, jstart, jend,
                                  kstart, kend):
    vs = {n: _mk(u.shape) for n in
          ("u2_visc", "v2_visc", "w2_visc", "tke_visc", "uw_visc")}
    I, J = slice(istart, iend), slice(jstart, jend)
    # wz at full levels, mirrored
    wz = _mk(u.shape)
    for k in range(kstart, kend):
        wz[k] = i2(w[k] - wmean[k], w[k + 1] - wmean[k + 1])
    wz[kstart - 1] = -wz[kstart]
    wz[kend] = -wz[kend - 1]
    for k in range(kstart, kend):
        U, V, WZ = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, wz))
        vs["u2_visc"][k, J, I] = visc * (
            ((U(1) - umean[k + 1]) ** 2 - (U() - umean[k]) ** 2) * dzhi[k + 1]
            - ((U() - umean[k]) ** 2 - (U(-1) - umean[k - 1]) ** 2) * dzhi[k]) * dzi[k]
        vs["v2_visc"][k, J, I] = visc * (
            ((V(1) - vmean[k + 1]) ** 2 - (V() - vmean[k]) ** 2) * dzhi[k + 1]
            - ((V() - vmean[k]) ** 2 - (V(-1) - vmean[k - 1]) ** 2) * dzhi[k]) * dzi[k]
        vs["tke_visc"][k, J, I] = (0.5 * visc * (
            (WZ(1) ** 2 - WZ() ** 2) * dzhi[k + 1]
            - (WZ() ** 2 - WZ(-1) ** 2) * dzhi[k]) * dzi[k]
            + 0.5 * (vs["u2_visc"][k, J, I] + vs["v2_visc"][k, J, I]))
    k = kstart
    U, W, WX = (_P(a, k, jstart, jend, istart, iend) for a in (u, w, wx))
    vs["w2_visc"][k, J, I] = visc * (
        ((W(1) - wmean[k + 1]) ** 2 - (W() - wmean[k]) ** 2) * dzi[k]
        - ((W() - wmean[k]) ** 2 - (W(1) - wmean[k + 1]) ** 2) * dzi[k - 1]) * dzhi[k]
    utmp = 1.5 * (U(-1) - umean[k - 1]) - 0.5 * (U() - umean[k])
    vs["uw_visc"][k, J, I] = visc * (
        (i2(U() - umean[k], U(1) - umean[k + 1]) * (WX(1) - wmean[k + 1])
         - i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])) * dzi[k]
        - (i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])
           - utmp * -(WX(1) - wmean[k + 1])) * dzi[k - 1]) * dzhi[k]
    k = kend
    U, W, WX = (_P(a, k, jstart, jend, istart, iend) for a in (u, w, wx))
    vs["w2_visc"][k, J, I] = visc * (
        ((W(-1) - wmean[k - 1]) ** 2 - (W() - wmean[k]) ** 2) * dzi[k]
        - ((W() - wmean[k]) ** 2 - (W(-1) - wmean[k - 1]) ** 2) * dzi[k - 1]) * dzhi[k]
    utmp = 1.5 * (U() - umean[k]) - 0.5 * (U(-1) - umean[k - 1])
    vs["uw_visc"][k, J, I] = visc * (
        (utmp * -(WX(-1) - wmean[k - 1])
         - i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])) * dzi[k]
        - (i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])
           - i2(U(-1) - umean[k - 1], U(-2) - umean[k - 2]) * (WX(-1) - wmean[k - 1]))
        * dzi[k - 1]) * dzhi[k]
    for k in range(kstart + 1, kend):
        U, W, WX = (_P(a, k, jstart, jend, istart, iend) for a in (u, w, wx))
        vs["w2_visc"][k, J, I] = visc * (
            ((W(1) - wmean[k + 1]) ** 2 - (W() - wmean[k]) ** 2) * dzi[k]
            - ((W() - wmean[k]) ** 2 - (W(-1) - wmean[k - 1]) ** 2) * dzi[k - 1]) * dzhi[k]
        vs["uw_visc"][k, J, I] = visc * (
            (i2(U() - umean[k], U(1) - umean[k + 1]) * (WX(1) - wmean[k + 1])
             - i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])) * dzi[k]
            - (i2(U() - umean[k], U(-1) - umean[k - 1]) * (WX() - wmean[k])
               - i2(U(-1) - umean[k - 1], U(-2) - umean[k - 2]) * (WX(-1) - wmean[k - 1]))
            * dzi[k - 1]) * dzhi[k]
    return vs


def diffusion_dissipation_terms_dns(u, v, w, umean, vmean, wmean, dzi, dzhi,
                                    dxi, dyi, visc, istart, iend,
                                    jstart, jend, kstart, kend):
    ds = {n: _mk(u.shape) for n in
          ("u2_diss", "v2_diss", "w2_diss", "tke_diss", "uw_diss")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        U, V, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w))
        up = lambda dk=0, dj=0, di=0: U(dk, dj, di) - umean[k + dk]
        vpf = lambda dk=0, dj=0, di=0: V(dk, dj, di) - vmean[k + dk]
        ds["u2_diss"][k, J, I] = -2. * visc * (
            ((i2(up(), up(0, 0, 1)) - i2(up(), up(0, 0, -1))) * dxi) ** 2
            + ((i2(up(), up(0, 1, 0)) - i2(up(), up(0, -1, 0))) * dyi) ** 2
            + ((i2(up(), up(1)) - i2(up(), up(-1))) * dzi[k]) ** 2)
        ds["v2_diss"][k, J, I] = -2. * visc * (
            ((i2(vpf(), vpf(0, 0, 1)) - i2(vpf(), vpf(0, 0, -1))) * dxi) ** 2
            + ((i2(vpf(), vpf(0, 1, 0)) - i2(vpf(), vpf(0, -1, 0))) * dyi) ** 2
            + ((i2(vpf(), vpf(1)) - i2(vpf(), vpf(-1))) * dzi[k]) ** 2)
        ds["tke_diss"][k, J, I] = (-visc * (
            ((W(0, 0, 1) - W()) * dxi) ** 2
            + ((W(0, 1, 0) - W()) * dyi) ** 2
            + ((W(1) - wmean[k + 1] - (W() - wmean[k])) * dzi[k]) ** 2)
            + 0.5 * (ds["u2_diss"][k, J, I] + ds["v2_diss"][k, J, I]))
    k = kstart
    U, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, w))
    ds["w2_diss"][k, J, I] = -2. * visc * (
        ((i2(W(), W(0, 0, 1)) - i2(W(), W(0, 0, -1))) * dxi) ** 2
        + ((i2(W(), W(0, 1, 0)) - i2(W(), W(0, -1, 0))) * dyi) ** 2
        + (2. * i2(W(), W(1)) * dzhi[k]) ** 2)
    ds["uw_diss"][k, J, I] = (-2. * visc
        * ((U() - umean[k]) - (U(-1) - umean[k - 1])) * dzhi[k]
        * 2. * i22(W() - wmean[k], W(1) - wmean[k + 1],
                   W(1, 0, -1) - wmean[k + 1], W(0, 0, -1) - wmean[k]) * dzhi[k])
    k = kend
    U, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, w))
    ds["w2_diss"][k, J, I] = -2. * visc * (
        ((i2(W(), W(0, 0, 1)) - i2(W(), W(0, 0, -1))) * dxi) ** 2
        + ((i2(W(), W(0, 1, 0)) - i2(W(), W(0, -1, 0))) * dyi) ** 2
        + (-2. * i2(W() - wmean[k], W(-1) - wmean[k - 1]) * dzhi[k]) ** 2)
    ds["uw_diss"][k, J, I] = (-2. * visc
        * ((U() - umean[k]) - (U(-1) - umean[k - 1])) * dzhi[k]
        * -2. * i22(W() - wmean[k], W(-1) - wmean[k - 1],
                    W(-1, 0, -1) - wmean[k - 1], W(0, 0, -1) - wmean[k]) * dzhi[k])
    for k in range(kstart + 1, kend):
        U, W = (_P(a, k, jstart, jend, istart, iend) for a in (u, w))
        ds["w2_diss"][k, J, I] = -2. * visc * (
            ((i2(W(), W(0, 0, 1)) - i2(W(), W(0, 0, -1))) * dxi) ** 2
            + ((i2(W(), W(0, 1, 0)) - i2(W(), W(0, -1, 0))) * dyi) ** 2
            + ((i2(W() - wmean[k], W(1) - wmean[k + 1])
                - i2(W() - wmean[k], W(-1) - wmean[k - 1])) * dzhi[k]) ** 2)
        ds["uw_diss"][k, J, I] = (-2. * visc
            * ((U() - umean[k]) - (U(-1) - umean[k - 1])) * dzhi[k]
            * (i22(W() - wmean[k], W(1) - wmean[k + 1],
                   W(1, 0, -1) - wmean[k + 1], W(0, 0, -1) - wmean[k])
               - i22(W() - wmean[k], W(-1) - wmean[k - 1],
                     W(-1, 0, -1) - wmean[k - 1], W(0, 0, -1) - wmean[k]))
            * dzhi[k])
    return ds


def buoyancy_terms(u, v, w, b, umean, vmean, wmean, bmean,
                   istart, iend, jstart, jend, kstart, kend):
    by = {n: _mk(u.shape) for n in
          ("w2_buoy", "tke_buoy", "uw_buoy", "vw_buoy")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        W, B = (_P(a, k, jstart, jend, istart, iend) for a in (w, b))
        by["tke_buoy"][k, J, I] = i2(W() - wmean[k], W(1) - wmean[k + 1]) * (B() - bmean[k])
    for k in range(kstart + 1, kend):
        U, V, W, B = (_P(a, k, jstart, jend, istart, iend) for a in (u, v, w, b))
        by["w2_buoy"][k, J, I] = 2. * i2(B() - bmean[k], B(-1) - bmean[k - 1]) * (W() - wmean[k])
        by["uw_buoy"][k, J, I] = i2(U() - umean[k], U(-1) - umean[k - 1]) * i22(
            B() - bmean[k], B(0, 0, -1) - bmean[k],
            B(-1, 0, -1) - bmean[k - 1], B(-1) - bmean[k - 1])
        by["vw_buoy"][k, J, I] = i2(V() - vmean[k], V(-1) - vmean[k - 1]) * i22(
            B() - bmean[k], B(0, -1, 0) - bmean[k],
            B(-1, -1, 0) - bmean[k - 1], B(-1) - bmean[k - 1])
    return by


def advection_terms_scalar(w, s, smean, dzi, dzhi,
                           istart, iend, jstart, jend, kstart, kend):
    ad = {n: _mk(w.shape) for n in
          ("s2_shear", "s2_turb", "sw_shear", "sw_turb")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        W, S = (_P(a, k, jstart, jend, istart, iend) for a in (w, s))
        dsdz = (i2(smean[k], smean[k + 1]) - i2(smean[k], smean[k - 1])) * dzi[k]
        dsdzh = (smean[k] - smean[k - 1]) * dzhi[k]
        ad["s2_shear"][k, J, I] = -2. * (S() - smean[k]) * i2(W(), W(1)) * dsdz
        ad["s2_turb"][k, J, I] = -(
            i2(S() - smean[k], S(1) - smean[k + 1]) ** 2 * W(1)
            - i2(S() - smean[k], S(-1) - smean[k - 1]) ** 2 * W()) * dzi[k]
        ad["sw_shear"][k, J, I] = -W() ** 2 * dsdzh
        ad["sw_turb"][k, J, I] = -(
            i2(W(), W(1)) ** 2 * (S() - smean[k])
            - i2(W(), W(-1)) ** 2 * (S(-1) - smean[k - 1])) * dzhi[k]
    return ad


def buoyancy_terms_scalar(s, b, smean, bmean,
                          istart, iend, jstart, jend, kstart, kend):
    out = _mk(s.shape)
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        S, B = (_P(a, k, jstart, jend, istart, iend) for a in (s, b))
        out[k, J, I] = i2(S() - smean[k], S(-1) - smean[k - 1]) * i2(
            B() - bmean[k], B(-1) - bmean[k - 1])
    return out


def diffusion_terms_scalar_dns(w, b, bmean, dzi, dzhi, dxi, dyi, visc, diff,
                               istart, iend, jstart, jend, kstart, kend):
    out = {n: _mk(w.shape) for n in ("b2_visc", "b2_diss", "bw_visc", "bw_diss")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        B = _P(b, k, jstart, jend, istart, iend)
        out["b2_visc"][k, J, I] = diff * (
            ((B(1) - bmean[k + 1]) ** 2 - (B() - bmean[k]) ** 2) * dzhi[k + 1]
            - ((B() - bmean[k]) ** 2 - (B(-1) - bmean[k - 1]) ** 2) * dzhi[k]) * dzi[k]
        out["b2_diss"][k, J, I] = -2. * diff * (
            ((i2(B() - bmean[k], B(1) - bmean[k + 1])
              - i2(B() - bmean[k], B(-1) - bmean[k - 1])) * dzi[k]) ** 2
            + ((i2(B() - bmean[k], B(0, 0, 1) - bmean[k])
                - i2(B() - bmean[k], B(0, 0, -1) - bmean[k])) * dxi) ** 2
            + ((i2(B() - bmean[k], B(0, 1, 0) - bmean[k])
                - i2(B() - bmean[k], B(0, -1, 0) - bmean[k])) * dyi) ** 2)
    k = kstart
    W, B = (_P(a, k, jstart, jend, istart, iend) for a in (w, b))
    out["bw_diss"][k, J, I] = (-2. * visc * (W(1) - W()) * dzi[k]
                               * ((B() - bmean[k]) - (B(-1) - bmean[k - 1])) * dzhi[k])
    k = kend
    W, B = (_P(a, k, jstart, jend, istart, iend) for a in (w, b))
    out["bw_diss"][k, J, I] = (-2. * visc * (W() - W(-1)) * dzi[k - 1]
                               * ((B() - bmean[k]) - (B(-1) - bmean[k - 1])) * dzhi[k])
    for k in range(kstart + 1, kend - 1):
        W, B = (_P(a, k, jstart, jend, istart, iend) for a in (w, b))
        out["bw_visc"][k, J, I] = visc * (
            ((W(1) * i2(B() - bmean[k], B(1) - bmean[k + 1]))
             - (W() * i2(B(-1) - bmean[k - 1], B() - bmean[k]))) * dzi[k]
            - ((W() * i2(B(-1) - bmean[k - 1], B() - bmean[k]))
               - (W(-1) * i2(B(-2) - bmean[k - 2], B(-1) - bmean[k - 1]))) * dzi[k - 1]
        ) * dzhi[k]
        out["bw_diss"][k, J, I] = -2. * visc * (
            (i2(W(0, 0, 1), W()) - i2(W(), W(0, 0, -1))) * dxi
            * (i22(B() - bmean[k], B(0, 0, 1) - bmean[k],
                   B(-1, 0, 1) - bmean[k - 1], B(-1) - bmean[k - 1])
               - i22(B() - bmean[k], B(0, 0, -1) - bmean[k],
                     B(-1, 0, -1) - bmean[k - 1], B(-1) - bmean[k - 1])) * dxi
            + (i2(W(0, 1, 0), W()) - i2(W(), W(0, -1, 0))) * dyi
            * (i22(B() - bmean[k], B(0, 1, 0) - bmean[k],
                   B(-1, 1, 0) - bmean[k - 1], B(-1) - bmean[k - 1])
               - i22(B() - bmean[k], B(0, -1, 0) - bmean[k],
                     B(-1, -1, 0) - bmean[k - 1], B(-1) - bmean[k - 1])) * dyi
            + (i2(W(1), W()) - i2(W(), W(-1))) * dzhi[k]
            * ((B() - bmean[k]) - (B(-1) - bmean[k - 1])) * dzhi[k])
    out["bw_visc"][kstart, J, I] = out["bw_visc"][kstart + 1, J, I]
    out["bw_visc"][kend, J, I] = out["bw_visc"][kend - 1, J, I]
    return out


def pressure_terms_scalar(s, p, smean, pmean, dzi, dzhi,
                          istart, iend, jstart, jend, kstart, kend):
    out = {n: _mk(s.shape) for n in ("sw_pres", "sw_rdstr")}
    I, J = slice(istart, iend), slice(jstart, jend)
    for k in range(kstart, kend):
        S, Pp = (_P(a, k, jstart, jend, istart, iend) for a in (s, p))
        out["sw_pres"][k, J, I] = -(
            (Pp() - pmean[k]) * (S() - smean[k])
            - (Pp(-1) - pmean[k - 1]) * (S(-1) - smean[k - 1])) * dzhi[k]
        out["sw_rdstr"][k, J, I] = i2(Pp() - pmean[k], Pp(-1) - pmean[k - 1]) * (
            (S() - smean[k]) - (S(-1) - smean[k - 1])) * dzhi[k]
    return out
