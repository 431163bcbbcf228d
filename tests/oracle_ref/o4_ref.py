"""Oracle transliteration of the fully-4th-order stack.

Mirrors, row regime by row regime, the reference kernels in
/root/reference/src/advec_4.cxx (advec_u :89-186, advec_v :189-286,
advec_w :289-386, advec_s :389-486), src/advec_4m.cxx (advec_u :90-182,
advec_v :184-276, advec_w :278-323, advec_s :325-417),
src/diff_4.cxx (diff_c :41-106, diff_w :108-173), the 4th-order vertical
ghost fills in src/boundary.cxx:762-907, and the pres_4 heptadiagonal
band setup in src/pres_4.cxx:178-252.

Arrays are numpy [k, j, i]; k loops are literal per reference row regime,
i/j vectorized as full periodic planes (np.roll), so the per-point
expression trees are identical to the reference's.
"""

import numpy as np

from microhh_tpu.fd import (ci0, ci1, ci2, ci3, cg0, cg1, cg2, cg3,
                            bi0, bi1, bi2, bi3, ti0, ti1, ti2, ti3,
                            bg0, bg1, bg2, bg3, tg0, tg1, tg2, tg3,
                            cdg0, cdg1, cdg2, cdg3)


def _A(arr, k):
    """Plane accessor with periodic horizontal wrap:
    A(di,dj,dk) == arr[k+dk, j+dj, i+di] over the whole plane."""
    def f(di=0, dj=0, dk=0):
        p = arr[k + dk]
        if dj:
            p = np.roll(p, -dj, axis=0)
        if di:
            p = np.roll(p, -di, axis=1)
        return p
    return f


def i4(a, b, c, d):
    return ci0 * a + ci1 * b + ci2 * c + ci3 * d


def b4(a, b, c, d):
    return bi0 * a + bi1 * b + bi2 * c + bi3 * d


def t4(a, b, c, d):
    return ti0 * a + ti1 * b + ti2 * c + ti3 * d


def G(a, b, c, d):
    return cg0 * a + cg1 * b + cg2 * c + cg3 * d


def grad4(a, b, c, d):
    return -cg0 * (d - a) - cg1 * (c - b)


def i2(a, b):
    return 0.5 * (a + b)


# --- advec_4 (src/advec_4.cxx) ----------------------------------------------

def advec4_u(u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    ut = np.zeros_like(u)
    for k in range(ks, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        ut[k] -= G(i4(U(-3), U(-2), U(-1), U(0)) * i4(U(-3), U(-2), U(-1), U(0)),
                   i4(U(-2), U(-1), U(0), U(1)) * i4(U(-2), U(-1), U(0), U(1)),
                   i4(U(-1), U(0), U(1), U(2)) * i4(U(-1), U(0), U(1), U(2)),
                   i4(U(0), U(1), U(2), U(3)) * i4(U(0), U(1), U(2), U(3))) * dxi
        if dim3:
            ut[k] -= G(i4(V(-2, -1), V(-1, -1), V(0, -1), V(1, -1)) * i4(U(0, -3), U(0, -2), U(0, -1), U(0, 0)),
                       i4(V(-2, 0), V(-1, 0), V(0, 0), V(1, 0)) * i4(U(0, -2), U(0, -1), U(0, 0), U(0, 1)),
                       i4(V(-2, 1), V(-1, 1), V(0, 1), V(1, 1)) * i4(U(0, -1), U(0, 0), U(0, 1), U(0, 2)),
                       i4(V(-2, 2), V(-1, 2), V(0, 2), V(1, 2)) * i4(U(0, 0), U(0, 1), U(0, 2), U(0, 3))) * dyi
        wx = [i4(W(-2, 0, dk), W(-1, 0, dk), W(0, 0, dk), W(1, 0, dk))
              for dk in (-1, 0, 1, 2)]
        if k == ks:
            uz0 = b4(U(0, 0, -2), U(0, 0, -1), U(0, 0, 0), U(0, 0, 1))
        else:
            uz0 = i4(U(0, 0, -3), U(0, 0, -2), U(0, 0, -1), U(0, 0, 0))
        if k == ke - 1:
            uz3 = t4(U(0, 0, -1), U(0, 0, 0), U(0, 0, 1), U(0, 0, 2))
        else:
            uz3 = i4(U(0, 0, 0), U(0, 0, 1), U(0, 0, 2), U(0, 0, 3))
        ut[k] -= G(wx[0] * uz0,
                   wx[1] * i4(U(0, 0, -2), U(0, 0, -1), U(0, 0, 0), U(0, 0, 1)),
                   wx[2] * i4(U(0, 0, -1), U(0, 0, 0), U(0, 0, 1), U(0, 0, 2)),
                   wx[3] * uz3) * dzi4[k]
    return ut


def advec4_v(u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    vt = np.zeros_like(v)
    for k in range(ks, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        vt[k] -= G(i4(U(-1, -2), U(-1, -1), U(-1, 0), U(-1, 1)) * i4(V(-3), V(-2), V(-1), V(0)),
                   i4(U(0, -2), U(0, -1), U(0, 0), U(0, 1)) * i4(V(-2), V(-1), V(0), V(1)),
                   i4(U(1, -2), U(1, -1), U(1, 0), U(1, 1)) * i4(V(-1), V(0), V(1), V(2)),
                   i4(U(2, -2), U(2, -1), U(2, 0), U(2, 1)) * i4(V(0), V(1), V(2), V(3))) * dxi
        if dim3:
            vt[k] -= G(i4(V(0, -3), V(0, -2), V(0, -1), V(0, 0)) * i4(V(0, -3), V(0, -2), V(0, -1), V(0, 0)),
                       i4(V(0, -2), V(0, -1), V(0, 0), V(0, 1)) * i4(V(0, -2), V(0, -1), V(0, 0), V(0, 1)),
                       i4(V(0, -1), V(0, 0), V(0, 1), V(0, 2)) * i4(V(0, -1), V(0, 0), V(0, 1), V(0, 2)),
                       i4(V(0, 0), V(0, 1), V(0, 2), V(0, 3)) * i4(V(0, 0), V(0, 1), V(0, 2), V(0, 3))) * dyi
        wy = [i4(W(0, -2, dk), W(0, -1, dk), W(0, 0, dk), W(0, 1, dk))
              for dk in (-1, 0, 1, 2)]
        if k == ks:
            vz0 = b4(V(0, 0, -2), V(0, 0, -1), V(0, 0, 0), V(0, 0, 1))
        else:
            vz0 = i4(V(0, 0, -3), V(0, 0, -2), V(0, 0, -1), V(0, 0, 0))
        if k == ke - 1:
            vz3 = t4(V(0, 0, -1), V(0, 0, 0), V(0, 0, 1), V(0, 0, 2))
        else:
            vz3 = i4(V(0, 0, 0), V(0, 0, 1), V(0, 0, 2), V(0, 0, 3))
        vt[k] -= G(wy[0] * vz0,
                   wy[1] * i4(V(0, 0, -2), V(0, 0, -1), V(0, 0, 0), V(0, 0, 1)),
                   wy[2] * i4(V(0, 0, -1), V(0, 0, 0), V(0, 0, 1), V(0, 0, 2)),
                   wy[3] * vz3) * dzi4[k]
    return vt


def advec4_w(u, v, w, dzhi4, dxi, dyi, ks, ke, dim3=True):
    wt = np.zeros_like(w)
    for k in range(ks + 1, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        wt[k] -= G(i4(U(-1, 0, -2), U(-1, 0, -1), U(-1, 0, 0), U(-1, 0, 1)) * i4(W(-3), W(-2), W(-1), W(0)),
                   i4(U(0, 0, -2), U(0, 0, -1), U(0, 0, 0), U(0, 0, 1)) * i4(W(-2), W(-1), W(0), W(1)),
                   i4(U(1, 0, -2), U(1, 0, -1), U(1, 0, 0), U(1, 0, 1)) * i4(W(-1), W(0), W(1), W(2)),
                   i4(U(2, 0, -2), U(2, 0, -1), U(2, 0, 0), U(2, 0, 1)) * i4(W(0), W(1), W(2), W(3))) * dxi
        if dim3:
            wt[k] -= G(i4(V(0, -1, -2), V(0, -1, -1), V(0, -1, 0), V(0, -1, 1)) * i4(W(0, -3), W(0, -2), W(0, -1), W(0, 0)),
                       i4(V(0, 0, -2), V(0, 0, -1), V(0, 0, 0), V(0, 0, 1)) * i4(W(0, -2), W(0, -1), W(0, 0), W(0, 1)),
                       i4(V(0, 1, -2), V(0, 1, -1), V(0, 1, 0), V(0, 1, 1)) * i4(W(0, -1), W(0, 0), W(0, 1), W(0, 2)),
                       i4(V(0, 2, -2), V(0, 2, -1), V(0, 2, 0), V(0, 2, 1)) * i4(W(0, 0), W(0, 1), W(0, 2), W(0, 3))) * dyi
        if k == ks + 1:
            wz0 = b4(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1))
        else:
            wz0 = i4(W(0, 0, -3), W(0, 0, -2), W(0, 0, -1), W(0, 0, 0))
        if k == ke - 1:
            wz3 = t4(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))
        else:
            wz3 = i4(W(0, 0, 0), W(0, 0, 1), W(0, 0, 2), W(0, 0, 3))
        wt[k] -= G(wz0 * wz0,
                   i4(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1)) ** 2,
                   i4(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2)) ** 2,
                   wz3 * wz3) * dzhi4[k]
    return wt


def advec4_s(s, u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    st = np.zeros_like(s)
    for k in range(ks, ke):
        S, U, V, W = _A(s, k), _A(u, k), _A(v, k), _A(w, k)
        st[k] -= G(U(-1) * i4(S(-3), S(-2), S(-1), S(0)),
                   U(0) * i4(S(-2), S(-1), S(0), S(1)),
                   U(1) * i4(S(-1), S(0), S(1), S(2)),
                   U(2) * i4(S(0), S(1), S(2), S(3))) * dxi
        if dim3:
            st[k] -= G(V(0, -1) * i4(S(0, -3), S(0, -2), S(0, -1), S(0, 0)),
                       V(0, 0) * i4(S(0, -2), S(0, -1), S(0, 0), S(0, 1)),
                       V(0, 1) * i4(S(0, -1), S(0, 0), S(0, 1), S(0, 2)),
                       V(0, 2) * i4(S(0, 0), S(0, 1), S(0, 2), S(0, 3))) * dyi
        if k == ks:
            sz0 = b4(S(0, 0, -2), S(0, 0, -1), S(0, 0, 0), S(0, 0, 1))
        else:
            sz0 = i4(S(0, 0, -3), S(0, 0, -2), S(0, 0, -1), S(0, 0, 0))
        if k == ke - 1:
            sz3 = t4(S(0, 0, -1), S(0, 0, 0), S(0, 0, 1), S(0, 0, 2))
        else:
            sz3 = i4(S(0, 0, 0), S(0, 0, 1), S(0, 0, 2), S(0, 0, 3))
        st[k] -= G(W(0, 0, -1) * sz0,
                   W(0, 0, 0) * i4(S(0, 0, -2), S(0, 0, -1), S(0, 0, 0), S(0, 0, 1)),
                   W(0, 0, 1) * i4(S(0, 0, -1), S(0, 0, 0), S(0, 0, 1), S(0, 0, 2)),
                   W(0, 0, 2) * sz3) * dzi4[k]
    return st


# --- advec_4m (src/advec_4m.cxx) --------------------------------------------

def advec4m_u(u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    ut = np.zeros_like(u)
    for k in range(ks, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        ut[k] += -grad4(i4(U(-3), U(-2), U(-1), U(0)) * i2(U(-3), U(0)),
                        i4(U(-2), U(-1), U(0), U(1)) * i2(U(-1), U(0)),
                        i4(U(-1), U(0), U(1), U(2)) * i2(U(0), U(1)),
                        i4(U(0), U(1), U(2), U(3)) * i2(U(0), U(3))) * dxi
        if dim3:
            ut[k] += -grad4(
                i4(V(-2, -1), V(-1, -1), V(0, -1), V(1, -1)) * i2(U(0, -3), U(0, 0)),
                i4(V(-2, 0), V(-1, 0), V(0, 0), V(1, 0)) * i2(U(0, -1), U(0, 0)),
                i4(V(-2, 1), V(-1, 1), V(0, 1), V(1, 1)) * i2(U(0, 0), U(0, 1)),
                i4(V(-2, 2), V(-1, 2), V(0, 2), V(1, 2)) * i2(U(0, 0), U(0, 3))) * dyi
        wx = {dk: i4(W(-2, 0, dk), W(-1, 0, dk), W(0, 0, dk), W(1, 0, dk))
              for dk in (-1, 0, 1, 2)}
        if k == ks:
            fa = -wx[1] * i2(U(0, 0, -1), U(0, 0, 2))
        else:
            fa = wx[-1] * i2(U(0, 0, -3), U(0, 0, 0))
        if k == ke - 1:
            fd_ = -wx[0] * i2(U(0, 0, -2), U(0, 0, 1))
        else:
            fd_ = wx[2] * i2(U(0, 0, 0), U(0, 0, 3))
        ut[k] += -grad4(fa,
                        wx[0] * i2(U(0, 0, -1), U(0, 0, 0)),
                        wx[1] * i2(U(0, 0, 0), U(0, 0, 1)),
                        fd_) * dzi4[k]
    return ut


def advec4m_v(u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    vt = np.zeros_like(v)
    for k in range(ks, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        vt[k] += -grad4(
            i4(U(-1, -2), U(-1, -1), U(-1, 0), U(-1, 1)) * i2(V(-3), V(0)),
            i4(U(0, -2), U(0, -1), U(0, 0), U(0, 1)) * i2(V(-1), V(0)),
            i4(U(1, -2), U(1, -1), U(1, 0), U(1, 1)) * i2(V(0), V(1)),
            i4(U(2, -2), U(2, -1), U(2, 0), U(2, 1)) * i2(V(0), V(3))) * dxi
        if dim3:
            vt[k] += -grad4(
                i4(V(0, -3), V(0, -2), V(0, -1), V(0, 0)) * i2(V(0, -3), V(0, 0)),
                i4(V(0, -2), V(0, -1), V(0, 0), V(0, 1)) * i2(V(0, -1), V(0, 0)),
                i4(V(0, -1), V(0, 0), V(0, 1), V(0, 2)) * i2(V(0, 0), V(0, 1)),
                i4(V(0, 0), V(0, 1), V(0, 2), V(0, 3)) * i2(V(0, 0), V(0, 3))) * dyi
        wy = {dk: i4(W(0, -2, dk), W(0, -1, dk), W(0, 0, dk), W(0, 1, dk))
              for dk in (-1, 0, 1, 2)}
        if k == ks:
            fa = -wy[1] * i2(V(0, 0, -1), V(0, 0, 2))
        else:
            fa = wy[-1] * i2(V(0, 0, -3), V(0, 0, 0))
        if k == ke - 1:
            fd_ = -wy[0] * i2(V(0, 0, -2), V(0, 0, 1))
        else:
            fd_ = wy[2] * i2(V(0, 0, 0), V(0, 0, 3))
        vt[k] += -grad4(fa,
                        wy[0] * i2(V(0, 0, -1), V(0, 0, 0)),
                        wy[1] * i2(V(0, 0, 0), V(0, 0, 1)),
                        fd_) * dzi4[k]
    return vt


def advec4m_w(u, v, w, dzhi4, dxi, dyi, ks, ke, dim3=True):
    wt = np.zeros_like(w)
    for k in range(ks + 1, ke):
        U, V, W = _A(u, k), _A(v, k), _A(w, k)
        wt[k] += -grad4(
            i4(U(-1, 0, -2), U(-1, 0, -1), U(-1, 0, 0), U(-1, 0, 1)) * i2(W(-3), W(0)),
            i4(U(0, 0, -2), U(0, 0, -1), U(0, 0, 0), U(0, 0, 1)) * i2(W(-1), W(0)),
            i4(U(1, 0, -2), U(1, 0, -1), U(1, 0, 0), U(1, 0, 1)) * i2(W(0), W(1)),
            i4(U(2, 0, -2), U(2, 0, -1), U(2, 0, 0), U(2, 0, 1)) * i2(W(0), W(3))) * dxi
        if dim3:
            wt[k] += -grad4(
                i4(V(0, -1, -2), V(0, -1, -1), V(0, -1, 0), V(0, -1, 1)) * i2(W(0, -3), W(0, 0)),
                i4(V(0, 0, -2), V(0, 0, -1), V(0, 0, 0), V(0, 0, 1)) * i2(W(0, -1), W(0, 0)),
                i4(V(0, 1, -2), V(0, 1, -1), V(0, 1, 0), V(0, 1, 1)) * i2(W(0, 0), W(0, 1)),
                i4(V(0, 2, -2), V(0, 2, -1), V(0, 2, 0), V(0, 2, 1)) * i2(W(0, 0), W(0, 3))) * dyi
        wt[k] += -grad4(
            i4(W(0, 0, -3), W(0, 0, -2), W(0, 0, -1), W(0, 0, 0)) * i2(W(0, 0, -3), W(0, 0, 0)),
            i4(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1)) * i2(W(0, 0, -1), W(0, 0, 0)),
            i4(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2)) * i2(W(0, 0, 0), W(0, 0, 1)),
            i4(W(0, 0, 0), W(0, 0, 1), W(0, 0, 2), W(0, 0, 3)) * i2(W(0, 0, 0), W(0, 0, 3))) * dzhi4[k]
    return wt


def advec4m_s(s, u, v, w, dzi4, dxi, dyi, ks, ke, dim3=True):
    st = np.zeros_like(s)
    for k in range(ks, ke):
        S, U, V, W = _A(s, k), _A(u, k), _A(v, k), _A(w, k)
        st[k] += -grad4(U(-1) * i2(S(-3), S(0)),
                        U(0) * i2(S(-1), S(0)),
                        U(1) * i2(S(0), S(1)),
                        U(2) * i2(S(0), S(3))) * dxi
        if dim3:
            st[k] += -grad4(V(0, -1) * i2(S(0, -3), S(0, 0)),
                            V(0, 0) * i2(S(0, -1), S(0, 0)),
                            V(0, 1) * i2(S(0, 0), S(0, 1)),
                            V(0, 2) * i2(S(0, 0), S(0, 3))) * dyi
        if k == ks:
            fa = -W(0, 0, 1) * i2(S(0, 0, -1), S(0, 0, 2))
        else:
            fa = W(0, 0, -1) * i2(S(0, 0, -3), S(0, 0, 0))
        if k == ke - 1:
            fd_ = -W(0, 0, 0) * i2(S(0, 0, -2), S(0, 0, 1))
        else:
            fd_ = W(0, 0, 2) * i2(S(0, 0, 0), S(0, 0, 3))
        st[k] += -grad4(fa,
                        W(0, 0, 0) * i2(S(0, 0, -1), S(0, 0, 0)),
                        W(0, 0, 1) * i2(S(0, 0, 0), S(0, 0, 1)),
                        fd_) * dzi4[k]
    return st


# --- diff_4 (src/diff_4.cxx) ------------------------------------------------

def _lap_h(A, dxidxi, dyidyi, dim3):
    out = (cdg3 * A(-3) + cdg2 * A(-2) + cdg1 * A(-1) + cdg0 * A(0)
           + cdg1 * A(1) + cdg2 * A(2) + cdg3 * A(3)) * dxidxi
    if dim3:
        out = out + (cdg3 * A(0, -3) + cdg2 * A(0, -2) + cdg1 * A(0, -1)
                     + cdg0 * A(0, 0) + cdg1 * A(0, 1) + cdg2 * A(0, 2)
                     + cdg3 * A(0, 3)) * dyidyi
    return out


def diff4_c(a, visc, dxidxi, dyidyi, dzi4, dzhi4, ks, ke, dim3=True):
    at = np.zeros_like(a)
    for k in range(ks, ke):
        A = _A(a, k)
        at[k] += visc * _lap_h(A, dxidxi, dyidyi, dim3)
        if k == ks:
            g0 = (bg0 * A(0, 0, -2) + bg1 * A(0, 0, -1) + bg2 * A(0, 0, 0)
                  + bg3 * A(0, 0, 1)) * dzhi4[k - 1]
        else:
            g0 = G(A(0, 0, -3), A(0, 0, -2), A(0, 0, -1), A(0, 0, 0)) * dzhi4[k - 1]
        if k == ke - 1:
            g3 = (tg0 * A(0, 0, -1) + tg1 * A(0, 0, 0) + tg2 * A(0, 0, 1)
                  + tg3 * A(0, 0, 2)) * dzhi4[k + 2]
        else:
            g3 = G(A(0, 0, 0), A(0, 0, 1), A(0, 0, 2), A(0, 0, 3)) * dzhi4[k + 2]
        at[k] += visc * (cg0 * g0
                         + cg1 * G(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1)) * dzhi4[k]
                         + cg2 * G(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2)) * dzhi4[k + 1]
                         + cg3 * g3) * dzi4[k]
    return at


def diff4_w(a, visc, dxidxi, dyidyi, dzi4, dzhi4, ks, ke, dim3=True):
    at = np.zeros_like(a)
    for k in range(ks + 1, ke):
        A = _A(a, k)
        at[k] += visc * _lap_h(A, dxidxi, dyidyi, dim3)
        if k == ks + 1:
            g0 = (bg0 * A(0, 0, -2) + bg1 * A(0, 0, -1) + bg2 * A(0, 0, 0)
                  + bg3 * A(0, 0, 1)) * dzi4[k - 2]
        else:
            g0 = G(A(0, 0, -3), A(0, 0, -2), A(0, 0, -1), A(0, 0, 0)) * dzi4[k - 2]
        if k == ke - 1:
            g3 = (tg0 * A(0, 0, -1) + tg1 * A(0, 0, 0) + tg2 * A(0, 0, 1)
                  + tg3 * A(0, 0, 2)) * dzi4[k + 1]
        else:
            g3 = G(A(0, 0, 0), A(0, 0, 1), A(0, 0, 2), A(0, 0, 3)) * dzi4[k + 1]
        at[k] += visc * (cg0 * g0
                         + cg1 * G(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1)) * dzi4[k - 1]
                         + cg2 * G(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2)) * dzi4[k]
                         + cg3 * g3) * dzhi4[k]
    return at


# --- 4th-order vertical ghost fills (src/boundary.cxx:762-907) --------------

def ghost4_bot(a, z, btype, val, ks):
    """btype: 'dirichlet' (val=surface value) or 'neumann' (val=gradient)."""
    a = a.copy()
    if btype == "dirichlet":
        a[ks - 1] = (8. / 3.) * val - 2. * a[ks] + (1. / 3.) * a[ks + 1]
        a[ks - 2] = 8. * val - 9. * a[ks] + 2. * a[ks + 1]
    else:
        g4 = grad4(z[ks - 2], z[ks - 1], z[ks], z[ks + 1])
        a[ks - 1] = -1. * g4 * val + a[ks]
        a[ks - 2] = -3. * g4 * val + a[ks + 1]
    return a


def ghost4_top(a, z, btype, val, ke):
    a = a.copy()
    if btype == "dirichlet":
        a[ke] = (8. / 3.) * val - 2. * a[ke - 1] + (1. / 3.) * a[ke - 2]
        a[ke + 1] = 8. * val - 9. * a[ke - 1] + 2. * a[ke - 2]
    else:
        g4 = grad4(z[ke - 2], z[ke - 1], z[ke], z[ke + 1])
        a[ke] = 1. * g4 * val + a[ke - 1]
        a[ke + 1] = 3. * g4 * val + a[ke - 2]
    return a


def ghost4_w(w, ks, ke, conservation):
    w = w.copy()
    if conservation:
        w[ks - 1] = -w[ks + 1]
        w[ks - 2] = -w[ks + 2]
        w[ke + 1] = -w[ke - 1]
        w[ke + 2] = -w[ke - 2]
    else:
        w[ks - 1] = -6. * w[ks + 1] + 4. * w[ks + 2] - w[ks + 3]
        w[ke + 1] = -6. * w[ke - 1] + 4. * w[ke - 2] - w[ke - 3]
    return w


# --- pres_4 band setup (src/pres_4.cxx:178-252) ------------------------------

def pres4_bmat(ntot, didi):
    b = np.zeros(ntot)
    for n in range(ntot // 2 + 1):
        b[n] = (2. * (1. / 576.) * np.cos(6. * np.pi * n / ntot)
                - 2. * (54. / 576.) * np.cos(4. * np.pi * n / ntot)
                + 2. * (783. / 576.) * np.cos(2. * np.pi * n / ntot)
                - (1460. / 576.)) * didi
    for n in range(ntot // 2 + 1, ntot):
        b[n] = b[ntot - n]
    return b


def pres4_bands(dzi4, dzhi4, kmax, kstart):
    m = np.zeros((7, kmax))
    c = 1. / 576.
    k, kc = 0, kstart
    m[0, k] = 0.
    m[1, k] = c * (-27. * dzhi4[kc]) * dzi4[kc]
    m[2, k] = c * (-1. * dzhi4[kc + 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1]) * dzi4[kc]
    m[3, k] = c * (27. * dzhi4[kc + 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] - 1. * dzhi4[kc + 2]) * dzi4[kc]
    m[4, k] = c * (-27. * dzhi4[kc + 1] + 27. * dzhi4[kc] + 729. * dzhi4[kc + 1] + 27. * dzhi4[kc + 2]) * dzi4[kc]
    m[5, k] = c * (1. * dzhi4[kc + 1] - 27. * dzhi4[kc + 1] - 27. * dzhi4[kc + 2]) * dzi4[kc]
    m[6, k] = c * (1. * dzhi4[kc + 2]) * dzi4[kc]
    for k in range(1, kmax - 1):
        kc = kstart + k
        m[0, k] = c * (1. * dzhi4[kc - 1]) * dzi4[kc]
        m[1, k] = c * (-27. * dzhi4[kc - 1] - 27. * dzhi4[kc]) * dzi4[kc]
        m[2, k] = c * (27. * dzhi4[kc - 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1]) * dzi4[kc]
        m[3, k] = c * (-1. * dzhi4[kc - 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] - 1. * dzhi4[kc + 2]) * dzi4[kc]
        m[4, k] = c * (27. * dzhi4[kc] + 729. * dzhi4[kc + 1] + 27. * dzhi4[kc + 2]) * dzi4[kc]
        m[5, k] = c * (-27. * dzhi4[kc + 1] - 27. * dzhi4[kc + 2]) * dzi4[kc]
        m[6, k] = c * (1. * dzhi4[kc + 2]) * dzi4[kc]
    k, kc = kmax - 1, kstart + kmax - 1
    m[0, k] = c * (1. * dzhi4[kc - 1]) * dzi4[kc]
    m[1, k] = c * (-27. * dzhi4[kc - 1] - 27. * dzhi4[kc] + 1. * dzhi4[kc]) * dzi4[kc]
    m[2, k] = c * (27. * dzhi4[kc - 1] + 729. * dzhi4[kc] + 27. * dzhi4[kc + 1] - 27. * dzhi4[kc]) * dzi4[kc]
    m[3, k] = c * (-1. * dzhi4[kc - 1] - 729. * dzhi4[kc] - 729. * dzhi4[kc + 1] + 27. * dzhi4[kc]) * dzi4[kc]
    m[4, k] = c * (27. * dzhi4[kc] + 729. * dzhi4[kc + 1] - 1. * dzhi4[kc]) * dzi4[kc]
    m[5, k] = c * (-27. * dzhi4[kc + 1]) * dzi4[kc]
    m[6, k] = 0.
    return m
