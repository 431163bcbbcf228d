"""Oracle transliteration of the interpolated advection family.

Mirrors, row by row, the reference kernels in
/root/reference/src/advec_2i4.cxx, advec_2i5.cxx, advec_2i53.cxx,
advec_2i62.cxx and include/advec_monotonic.h (Koren limiter).

Arrays are numpy [k, j, i] with explicit ghost cells; loops over k are
literal (one code block per reference row), i/j vectorized as full planes —
the per-point expression trees are identical to the reference's.

The momentum kernels advec_u and advec_v are one function: the reference
bodies differ only in the staggering offset of the transported field
(u: -ii1, v: -jj1) applied to the advecting velocities, compare
advec_2i5.cxx:180-300 (u) with :302-450 (v).
"""

import numpy as np

from .interp import (interp2 as i2, interp4c as i4c, interp4_ws as i4w,
                     interp3_ws as i3w, interp6_ws as i6w, interp5_ws as i5w)


class _P:
    """Plane accessor: A(di,dj,dk) == arr[k+dk, js+dj:je+dj, is+di:ie+di]."""

    def __init__(self, arr, k, js, je, is_, ie):
        self.arr, self.k = arr, k
        self.js, self.je, self.is_, self.ie = js, je, is_, ie

    def __call__(self, di=0, dj=0, dk=0):
        return self.arr[self.k + dk,
                        self.js + dj:self.je + dj,
                        self.is_ + di:self.ie + di]


def _x6(A, vR, vL, dxi, upwind):
    """6th-centered (+5th upwind) x flux divergence (advec_2i5.cxx:186-193)."""
    t = -(vR * i6w(A(-2), A(-1), A(0), A(1), A(2), A(3))
          - vL * i6w(A(-3), A(-2), A(-1), A(0), A(1), A(2))) * dxi
    if upwind:
        t = t + (np.abs(vR) * i5w(A(-2), A(-1), A(0), A(1), A(2), A(3))
                 - np.abs(vL) * i5w(A(-3), A(-2), A(-1), A(0), A(1), A(2))) * dxi
    return t


def _y6(A, vR, vL, dyi, upwind):
    t = -(vR * i6w(A(0, -2), A(0, -1), A(0, 0), A(0, 1), A(0, 2), A(0, 3))
          - vL * i6w(A(0, -3), A(0, -2), A(0, -1), A(0, 0), A(0, 1), A(0, 2))) * dyi
    if upwind:
        t = t + (np.abs(vR) * i5w(A(0, -2), A(0, -1), A(0, 0), A(0, 1), A(0, 2), A(0, 3))
                 - np.abs(vL) * i5w(A(0, -3), A(0, -2), A(0, -1), A(0, 0), A(0, 1), A(0, 2))) * dyi
    return t


def _x4(A, vR, vL, dxi):
    """4th-order centered x flux divergence (advec_2i4.cxx:134-135)."""
    return -(vR * i4c(A(-1), A(0), A(1), A(2))
             - vL * i4c(A(-2), A(-1), A(0), A(1))) * dxi


def _y4(A, vR, vL, dyi):
    return -(vR * i4c(A(0, -1), A(0, 0), A(0, 1), A(0, 2))
             - vL * i4c(A(0, -2), A(0, -1), A(0, 0), A(0, 1))) * dyi


def _horiz(scheme, A, U, V, da, dxi, dyi):
    """Horizontal advection terms for one k plane.

    da = staggering offset (di,dj,dk) of the transported field's location:
    u:(-1,0,0), v:(0,-1,0), w:(0,0,-1), scalars: None (velocity used as-is).
    """
    if da is None:
        vRx, vLx = U(1), U(0)
        vRy, vLy = V(0, 1), V(0, 0)
    else:
        di, dj, dk = da
        vRx = i2(U(1 + di, dj, dk), U(1))
        vLx = i2(U(di, dj, dk), U(0))
        vRy = i2(V(di, 1 + dj, dk), V(0, 1))
        vLy = i2(V(di, dj, dk), V(0, 0))
    if scheme == "2i4":
        return _x4(A, vRx, vLx, dxi) + _y4(A, vRy, vLy, dyi)
    up = scheme != "2i62"
    return _x6(A, vRx, vLx, dxi, up) + _y6(A, vRy, vLy, dyi, up)


# vertical face interpolants of the transported field, at the BOTTOM face of
# the current cell (dk=0 plane is the current cell k)
def _f_i2b(A):
    return i2(A(0, 0, -1), A(0, 0, 0))


def _f_i2t(A):
    return i2(A(0, 0, 0), A(0, 0, 1))


def _f_i4b(A):
    return i4w(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1))


def _f_i4t(A):
    return i4w(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))


def _f_i3b(A):
    return i3w(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1))


def _f_i3t(A):
    return i3w(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))


def _f_i6b(A):
    return i6w(A(0, 0, -3), A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))


def _f_i6t(A):
    return i6w(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2), A(0, 0, 3))


def _f_i5b(A):
    return i5w(A(0, 0, -3), A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))


def _f_i5t(A):
    return i5w(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2), A(0, 0, 3))


def advec_cell(scheme, at, a, u, v, w, dzi, dx, dy, rhoref, rhorefh,
               istart, iend, jstart, jend, kstart, kend, da=None):
    """u/v/scalar advection tendency (cell-centered rows in k).

    scheme row structure:
      2i5  — advec_2i5.cxx:150-300 (u), :581-728 (s)
      2i53 — advec_2i53.cxx:140-239 (u), :390-480 (s)
      2i62 — advec_2i62.cxx:125-160 (u), :280-305 (s)
      2i4  — advec_2i4.cxx:119-230 (u), :385-460 (s)
    """
    dxi, dyi = 1. / dx, 1. / dy
    ks, ke = kstart, kend

    def P(arr, k):
        return _P(arr, k, jstart, jend, istart, iend)

    # --- horizontal terms, every row ---
    for k in range(ks, ke):
        A, U, V = P(a, k), P(u, k), P(v, k)
        at[k, jstart:jend, istart:iend] += _horiz(scheme, A, U, V, da, dxi, dyi)

    # --- vertical terms ---
    def wbot(k):
        """advecting velocity at the bottom face of cell k"""
        W = P(w, k)
        if da is None:
            return W(0, 0, 0)
        di, dj, dk = da
        return i2(W(di, dj, dk), W(0, 0, 0))

    def wtop(k):
        W = P(w, k)
        if da is None:
            return W(0, 0, 1)
        di, dj, dk = da
        return i2(W(di, dj, 1 + dk), W(0, 0, 1))

    def add(k, expr):
        at[k, jstart:jend, istart:iend] += expr / rhoref[k] * dzi[k]

    if scheme == "2i62":
        # single generic row for all k; wall faces die because w==0 there
        for k in range(ks, ke):
            A = P(a, k)
            add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)
                     - rhorefh[k] * wbot(k) * _f_i2b(A)))
        return at

    if scheme == "2i4":
        k = ks
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)))
        k = ks + 1
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k)
                 * i4c(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))
                 - rhorefh[k] * wbot(k) * _f_i2b(A)))
        for k in range(ks + 2, ke - 2):
            A = P(a, k)
            add(k, -(rhorefh[k + 1] * wtop(k)
                     * i4c(A(0, 0, -1), A(0, 0, 0), A(0, 0, 1), A(0, 0, 2))
                     - rhorefh[k] * wbot(k)
                     * i4c(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1))))
        k = ke - 2
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)
                 - rhorefh[k] * wbot(k)
                 * i4c(A(0, 0, -2), A(0, 0, -1), A(0, 0, 0), A(0, 0, 1))))
        k = ke - 1
        A = P(a, k)
        add(k, -(-rhorefh[k] * wbot(k) * _f_i2b(A)))
        return at

    if scheme == "2i53":
        k = ks
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)))
        k = ks + 1
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i4t(A)
                 - rhorefh[k] * wbot(k) * _f_i2b(A))
               + rhorefh[k + 1] * np.abs(wtop(k)) * _f_i3t(A))
        for k in range(ks + 2, ke - 2):
            A = P(a, k)
            add(k, -(rhorefh[k + 1] * wtop(k) * _f_i4t(A)
                     - rhorefh[k] * wbot(k) * _f_i4b(A))
                   + (rhorefh[k + 1] * np.abs(wtop(k)) * _f_i3t(A)
                      - rhorefh[k] * np.abs(wbot(k)) * _f_i3b(A)))
        k = ke - 2
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)
                 - rhorefh[k] * wbot(k) * _f_i4b(A))
               - rhorefh[k] * np.abs(wbot(k)) * _f_i3b(A))
        k = ke - 1
        A = P(a, k)
        add(k, -(-rhorefh[k] * wbot(k) * _f_i2b(A)))
        return at

    assert scheme == "2i5"
    k = ks
    A = P(a, k)
    add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)))
    k = ks + 1
    A = P(a, k)
    add(k, -(rhorefh[k + 1] * wtop(k) * _f_i4t(A)
             - rhorefh[k] * wbot(k) * _f_i2b(A))
           + rhorefh[k + 1] * np.abs(wtop(k)) * _f_i3t(A))
    k = ks + 2
    A = P(a, k)
    add(k, -(rhorefh[k + 1] * wtop(k) * _f_i6t(A)
             - rhorefh[k] * wbot(k) * _f_i4b(A))
           + (rhorefh[k + 1] * np.abs(wtop(k)) * _f_i5t(A)
              - rhorefh[k] * np.abs(wbot(k)) * _f_i3b(A)))
    for k in range(ks + 3, ke - 3):
        A = P(a, k)
        add(k, -(rhorefh[k + 1] * wtop(k) * _f_i6t(A)
                 - rhorefh[k] * wbot(k) * _f_i6b(A))
               + (rhorefh[k + 1] * np.abs(wtop(k)) * _f_i5t(A)
                  - rhorefh[k] * np.abs(wbot(k)) * _f_i5b(A)))
    k = ke - 3
    A = P(a, k)
    add(k, -(rhorefh[k + 1] * wtop(k) * _f_i4t(A)
             - rhorefh[k] * wbot(k) * _f_i6b(A))
           + (rhorefh[k + 1] * np.abs(wtop(k)) * _f_i3t(A)
              - rhorefh[k] * np.abs(wbot(k)) * _f_i5b(A)))
    k = ke - 2
    A = P(a, k)
    add(k, -(rhorefh[k + 1] * wtop(k) * _f_i2t(A)
             - rhorefh[k] * wbot(k) * _f_i4b(A))
           - rhorefh[k] * np.abs(wbot(k)) * _f_i3b(A))
    k = ke - 1
    A = P(a, k)
    add(k, -(-rhorefh[k] * wbot(k) * _f_i2b(A)))
    return at


def advec_w(scheme, wt, u, v, w, dzhi, dx, dy, rhoref, rhorefh,
            istart, iend, jstart, jend, kstart, kend):
    """w advection (half-level rows kstart+1..kend-1).

    2i5: advec_2i5.cxx:452-579; 2i53: advec_2i53.cxx (advec_w);
    2i62: advec_2i62.cxx:237-260; 2i4: advec_2i4.cxx (advec_w)."""
    dxi, dyi = 1. / dx, 1. / dy
    ks, ke = kstart, kend
    da = (0, 0, -1)

    def P(arr, k):
        return _P(arr, k, jstart, jend, istart, iend)

    for k in range(ks + 1, ke):
        A, U, V = P(w, k), P(u, k), P(v, k)
        wt[k, jstart:jend, istart:iend] += _horiz(scheme, A, U, V, da, dxi, dyi)

    # vertical: fluxes at the two adjacent cell centers
    def wc_b(k):   # advecting velocity at center k-1
        W = P(w, k)
        return i2(W(0, 0, -1), W(0, 0, 0))

    def wc_t(k):   # advecting velocity at center k
        W = P(w, k)
        return i2(W(0, 0, 0), W(0, 0, 1))

    def add(k, expr):
        wt[k, jstart:jend, istart:iend] += expr / rhorefh[k] * dzhi[k]

    # transported w interpolated to centers k-1 (bottom) / k (top)
    def c_i2b(W):
        return i2(W(0, 0, -1), W(0, 0, 0))

    def c_i2t(W):
        return i2(W(0, 0, 0), W(0, 0, 1))

    def c_i4b(W):
        return i4c(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1))

    def c_i4t(W):
        return i4c(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))

    def c_w4b(W):
        return i4w(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1))

    def c_w4t(W):
        return i4w(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))

    def c_w3b(W):
        return i3w(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1))

    def c_w3t(W):
        return i3w(W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))

    def c_w6b(W):
        return i6w(W(0, 0, -3), W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))

    def c_w6t(W):
        return i6w(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2), W(0, 0, 3))

    def c_w5b(W):
        return i5w(W(0, 0, -3), W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2))

    def c_w5t(W):
        return i5w(W(0, 0, -2), W(0, 0, -1), W(0, 0, 0), W(0, 0, 1), W(0, 0, 2), W(0, 0, 3))

    if scheme == "2i62":
        for k in range(ks + 1, ke):
            W = P(w, k)
            add(k, -(rhoref[k] * wc_t(k) * c_i2t(W)
                     - rhoref[k - 1] * wc_b(k) * c_i2b(W)))
        return wt

    if scheme == "2i4":
        k = ks + 1
        W = P(w, k)
        add(k, -(rhoref[k] * wc_t(k) * c_i4t(W)
                 - rhoref[k - 1] * wc_b(k) * c_i2b(W)))
        for k in range(ks + 2, ke - 1):
            W = P(w, k)
            add(k, -(rhoref[k] * wc_t(k) * c_i4t(W)
                     - rhoref[k - 1] * wc_b(k) * c_i4b(W)))
        k = ke - 1
        W = P(w, k)
        add(k, -(rhoref[k] * wc_t(k) * c_i2t(W)
                 - rhoref[k - 1] * wc_b(k) * c_i4b(W)))
        return wt

    if scheme == "2i53":
        k = ks + 1
        W = P(w, k)
        add(k, -(rhoref[k] * wc_t(k) * c_w4t(W)
                 - rhoref[k - 1] * wc_b(k) * c_i2b(W))
               + rhoref[k] * np.abs(wc_t(k)) * c_w3t(W))
        for k in range(ks + 2, ke - 1):
            W = P(w, k)
            add(k, -(rhoref[k] * wc_t(k) * c_w4t(W)
                     - rhoref[k - 1] * wc_b(k) * c_w4b(W))
                   + (rhoref[k] * np.abs(wc_t(k)) * c_w3t(W)
                      - rhoref[k - 1] * np.abs(wc_b(k)) * c_w3b(W)))
        k = ke - 1
        W = P(w, k)
        add(k, -(rhoref[k] * wc_t(k) * c_i2t(W)
                 - rhoref[k - 1] * wc_b(k) * c_w4b(W))
               - rhoref[k - 1] * np.abs(wc_b(k)) * c_w3b(W))
        return wt

    assert scheme == "2i5"
    k = ks + 1
    W = P(w, k)
    add(k, -(rhoref[k] * wc_t(k) * c_w4t(W)
             - rhoref[k - 1] * wc_b(k) * c_i2b(W))
           + rhoref[k] * np.abs(wc_t(k)) * c_w3t(W))
    k = ks + 2
    W = P(w, k)
    add(k, -(rhoref[k] * wc_t(k) * c_w6t(W)
             - rhoref[k - 1] * wc_b(k) * c_w4b(W))
           + (rhoref[k] * np.abs(wc_t(k)) * c_w5t(W)
              - rhoref[k - 1] * np.abs(wc_b(k)) * c_w3b(W)))
    for k in range(ks + 3, ke - 2):
        W = P(w, k)
        add(k, -(rhoref[k] * wc_t(k) * c_w6t(W)
                 - rhoref[k - 1] * wc_b(k) * c_w6b(W))
               + (rhoref[k] * np.abs(wc_t(k)) * c_w5t(W)
                  - rhoref[k - 1] * np.abs(wc_b(k)) * c_w5b(W)))
    k = ke - 2
    W = P(w, k)
    add(k, -(rhoref[k] * wc_t(k) * c_w4t(W)
             - rhoref[k - 1] * wc_b(k) * c_w6b(W))
           + (rhoref[k] * np.abs(wc_t(k)) * c_w3t(W)
              - rhoref[k - 1] * np.abs(wc_b(k)) * c_w5b(W)))
    k = ke - 1
    W = P(w, k)
    add(k, -(rhoref[k] * wc_t(k) * c_i2t(W)
             - rhoref[k - 1] * wc_b(k) * c_w4b(W))
           - rhoref[k - 1] * np.abs(wc_b(k)) * c_w3b(W))
    return wt


# ---------------------------------------------------------------------------
# Koren (1993) monotone scalar advection — include/advec_monotonic.h:9-180
# ---------------------------------------------------------------------------

def _flux_lim(u, sm2, sm1, sp1, sp2):
    eps = np.finfo(np.float64).eps
    pos = u >= 0.
    den_p = np.copysign(1., sm1 - sm2) * np.maximum(np.abs(sm1 - sm2), eps)
    r_p = 2. * (sp1 - sm1) / den_p
    phi_p = np.maximum(0., np.minimum(r_p, np.minimum((1. / 3.) * (1. + r_p), 2.)))
    den_n = np.copysign(1., sp1 - sp2) * np.maximum(np.abs(sp1 - sp2), eps)
    r_n = 2. * (sm1 - sp1) / den_n
    phi_n = np.maximum(0., np.minimum(r_n, np.minimum((1. / 3.) * (1. + r_n), 2.)))
    return np.where(pos, u * (sm1 + 0.5 * phi_p * (sm1 - sm2)),
                    u * (sp1 + 0.5 * phi_n * (sp1 - sp2)))


def _flux_lim_bot(u, sm2, sm1, sp1, sp2):
    eps = np.finfo(np.float64).eps
    den_n = np.copysign(1., sp1 - sp2) * np.maximum(np.abs(sp1 - sp2), eps)
    r_n = 2. * (sm1 - sp1) / den_n
    phi_n = np.maximum(0., np.minimum(r_n, np.minimum((1. / 3.) * (1. + r_n), 2.)))
    return np.where(u >= 0., u * sm1, u * (sp1 + 0.5 * phi_n * (sp1 - sp2)))


def _flux_lim_top(u, sm2, sm1, sp1, sp2):
    eps = np.finfo(np.float64).eps
    den_p = np.copysign(1., sm1 - sm2) * np.maximum(np.abs(sm1 - sm2), eps)
    r_p = 2. * (sp1 - sm1) / den_p
    phi_p = np.maximum(0., np.minimum(r_p, np.minimum((1. / 3.) * (1. + r_p), 2.)))
    return np.where(u >= 0., u * (sm1 + 0.5 * phi_p * (sm1 - sm2)), u * sp1)


def advec_s_lim(st, s, u, v, w, dzi, dx, dy, rhoref, rhorefh,
                istart, iend, jstart, jend, kstart, kend):
    """advec_monotonic.h:76-180."""
    dxi, dyi = 1. / dx, 1. / dy
    ks, ke = kstart, kend

    def P(arr, k):
        return _P(arr, k, jstart, jend, istart, iend)

    def horiz(k):
        S, U, V = P(s, k), P(u, k), P(v, k)
        return (-(_flux_lim(U(1), S(-1), S(0), S(1), S(2))
                  - _flux_lim(U(0), S(-2), S(-1), S(0), S(1))) * dxi
                - (_flux_lim(V(0, 1), S(0, -1), S(0, 0), S(0, 1), S(0, 2))
                   - _flux_lim(V(0, 0), S(0, -2), S(0, -1), S(0, 0), S(0, 1))) * dyi)

    def add(k, expr):
        st[k, jstart:jend, istart:iend] += expr

    def zf(fn, k, dk):
        """vertical flux at face k+dk of cell k with limiter variant fn"""
        S, W = P(s, k), P(w, k)
        return fn(W(0, 0, dk), S(0, 0, dk - 2), S(0, 0, dk - 1),
                  S(0, 0, dk), S(0, 0, dk + 1))

    k = ks
    add(k, horiz(k) - (rhorefh[k + 1] * zf(_flux_lim_bot, k, 1)) / rhoref[k] * dzi[k])
    k = ks + 1
    add(k, horiz(k) - (rhorefh[k + 1] * zf(_flux_lim, k, 1)
                       - rhorefh[k] * zf(_flux_lim_bot, k, 0)) / rhoref[k] * dzi[k])
    for k in range(ks + 2, ke - 2):
        add(k, horiz(k) - (rhorefh[k + 1] * zf(_flux_lim, k, 1)
                           - rhorefh[k] * zf(_flux_lim, k, 0)) / rhoref[k] * dzi[k])
    k = ke - 2
    add(k, horiz(k) - (rhorefh[k + 1] * zf(_flux_lim_top, k, 1)
                       - rhorefh[k] * zf(_flux_lim, k, 0)) / rhoref[k] * dzi[k])
    k = ke - 1
    add(k, horiz(k) - (-rhorefh[k] * zf(_flux_lim_top, k, 0)) / rhoref[k] * dzi[k])
    return st
