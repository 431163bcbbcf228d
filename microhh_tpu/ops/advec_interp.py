"""Interpolated advection family: 2i4, 2i5, 2i62 (reference
``src/advec_2i4.cxx``, ``advec_2i5.cxx``, ``advec_2i62.cxx``).

All are 2nd-order flux-divergence schemes where the advecting velocity is
interpolated 2nd-order to the flux face while the transported quantity uses
higher-order interpolation:

* 2i4  — 4th-order centered (interp4c) horizontal+vertical, reduced to 2nd
         order at the two half-levels nearest each wall.
* 2i5  — 6th-order centered + 5th-order upwind-dissipative (|vel| *
         interp5_ws) horizontal and vertical, vertical ladder
         2nd/4th/6th from the walls inward.
* 2i62 — 6th-order centered horizontal (no upwind), plain 2nd-order vertical.
* 2i53 — 6th+5th-upwind horizontal, 4th-order WS + 3rd-order upwind
         vertical (interp4_ws/interp3_ws, ``src/advec_2i53.cxx:155-530``),
         2nd order at the first half-level off each wall.
"""

import jax.numpy as jnp

from .. import fd
from .stencil import im, ip, jm, jp, i2


# --- half-location interpolators (value at i-1/2 / j-1/2) -----------------

def i2h_x(q):
    return 0.5 * (im(q) + q)


def i4h_x(q):
    return fd.ci0 * im(q, 2) + fd.ci1 * im(q) + fd.ci2 * q + fd.ci3 * ip(q)


def i6h_x(q):
    return ((37. / 60.) * (im(q) + q) - (8. / 60.) * (im(q, 2) + ip(q))
            + (1. / 60.) * (im(q, 3) + ip(q, 2)))


def i5h_x(q):
    return ((10. / 60.) * (q - im(q)) - (5. / 60.) * (ip(q) - im(q, 2))
            + (1. / 60.) * (ip(q, 2) - im(q, 3)))


def i2h_y(q):
    return 0.5 * (jm(q) + q)


def i4h_y(q):
    return fd.ci0 * jm(q, 2) + fd.ci1 * jm(q) + fd.ci2 * q + fd.ci3 * jp(q)


def i6h_y(q):
    return ((37. / 60.) * (jm(q) + q) - (8. / 60.) * (jm(q, 2) + jp(q))
            + (1. / 60.) * (jm(q, 3) + jp(q, 2)))


def i5h_y(q):
    return ((10. / 60.) * (q - jm(q)) - (5. / 60.) * (jp(q) - jm(q, 2))
            + (1. / 60.) * (jp(q, 2) - jm(q, 3)))


def _zh_ladder(scheme, q, ks, ke):
    """Transported-quantity value at half levels ks..ke (index 0 = ks).

    Wall half-levels carry 0 (w=0 kills the flux); the ladder inward is
    2nd / [4th] / [6th] order per scheme.  Returns (ktot+1, ...) plus the
    matching upwind-dissipation ladder (zeros where no upwind applies).
    """
    kt = ke - ks
    X = jnp.zeros((kt + 1,) + q.shape[1:], dtype=q.dtype)
    U = jnp.zeros_like(X)

    def i2z(m):
        return 0.5 * (q[m - 1] + q[m])

    def i4z(lo, hi):  # half levels lo..hi-1
        return (fd.ci0 * q[lo - 2:hi - 2] + fd.ci1 * q[lo - 1:hi - 1]
                + fd.ci2 * q[lo:hi] + fd.ci3 * q[lo + 1:hi + 1])

    def i6z(lo, hi):
        return ((37. / 60.) * (q[lo - 1:hi - 1] + q[lo:hi])
                - (8. / 60.) * (q[lo - 2:hi - 2] + q[lo + 1:hi + 1])
                + (1. / 60.) * (q[lo - 3:hi - 3] + q[lo + 2:hi + 2]))

    def i5z(lo, hi):
        return ((10. / 60.) * (q[lo:hi] - q[lo - 1:hi - 1])
                - (5. / 60.) * (q[lo + 1:hi + 1] - q[lo - 2:hi - 2])
                + (1. / 60.) * (q[lo + 2:hi + 2] - q[lo - 3:hi - 3]))

    def i4z_ws(lo, hi):  # WS 4-point centered (finite_difference.h:111-116)
        return ((7. / 12.) * (q[lo - 1:hi - 1] + q[lo:hi])
                - (1. / 12.) * (q[lo - 2:hi - 2] + q[lo + 1:hi + 1]))

    def i3z_ws(lo, hi):  # WS 3rd-order upwind part (finite_difference.h:119-124)
        return ((3. / 12.) * (q[lo:hi] - q[lo - 1:hi - 1])
                - (1. / 12.) * (q[lo + 1:hi + 1] - q[lo - 2:hi - 2]))

    if scheme == "2i62":
        X = X.at[1:kt].set(0.5 * (q[ks:ke - 1] + q[ks + 1:ke]))
    elif scheme == "2i53":
        X = X.at[1].set(i2z(ks + 1))
        X = X.at[kt - 1].set(i2z(ke - 1))
        if kt > 3:
            X = X.at[2:kt - 1].set(i4z_ws(ks + 2, ke - 1))
            U = U.at[2:kt - 1].set(i3z_ws(ks + 2, ke - 1))
    elif scheme == "2i4":
        X = X.at[1].set(i2z(ks + 1))
        X = X.at[kt - 1].set(i2z(ke - 1))
        if kt > 3:
            X = X.at[2:kt - 1].set(i4z(ks + 2, ke - 1))
    elif scheme == "2i5":
        X = X.at[1].set(i2z(ks + 1))
        X = X.at[kt - 1].set(i2z(ke - 1))
        if kt > 3:
            # second face off each wall: 4th-order WS + 3rd-order upwind
            # (advec_2i5.cxx:239-242,284-287 — NOT the plain-centered ci
            # interpolant; interp4_ws/interp3_ws with 7/12,1/12 weights)
            X = X.at[2].set(i4z_ws(ks + 2, ks + 3)[0])
            U = U.at[2].set(i3z_ws(ks + 2, ks + 3)[0])
            X = X.at[kt - 2].set(i4z_ws(ke - 2, ke - 1)[0])
            U = U.at[kt - 2].set(i3z_ws(ke - 2, ke - 1)[0])
        if kt > 5:
            X = X.at[3:kt - 2].set(i6z(ks + 3, ke - 2))
            U = U.at[3:kt - 2].set(i5z(ks + 3, ke - 2))
    else:
        raise ValueError(scheme)
    return X, U


def _koren(vel, sm2, sm1, sp1, sp2):
    """Koren (1993) limited upwind flux (advec_monotonic.h flux_lim)."""
    eps = jnp.finfo(vel.dtype).eps

    def branch(a2, a1, b1, b2):
        d = jnp.where(a1 - a2 >= 0., 1., -1.) * jnp.maximum(jnp.abs(a1 - a2), eps)
        two_r = 2. * (b1 - a1) / d
        phi = jnp.maximum(0., jnp.minimum(two_r,
                                          jnp.minimum((1. + two_r) / 3., 2.)))
        return a1 + 0.5 * phi * (a1 - a2)

    return vel * jnp.where(vel >= 0.,
                           branch(sm2, sm1, sp1, sp2),
                           branch(sp2, sp1, sm1, sm2))


def _advec_s_lim(ctx, a, u, v, w):
    """Monotone scalar advection (advec_monotonic.h advec_s_lim): Koren
    fluxes in all directions, first-order upwind at the first face off each
    wall, zero wall fluxes."""
    ks, ke = ctx.ks, ctx.ke
    kt = ke - ks
    dxi, dyi = ctx.dxi, ctx.dyi

    # horizontal Koren fluxes at the west/south faces
    Fx = _koren(u, im(a, 2), im(a), a, ip(a))
    Fy = _koren(v, jm(a, 2), jm(a), a, jp(a))
    ts = (-(ip(Fx) - Fx) * dxi - (jp(Fy) - Fy) * dyi)[ks:ke]

    # vertical fluxes at half levels 0..kt (wall faces zero)
    ai = a[ks:ke]
    wi = w[ks:ke + 1]
    F = jnp.zeros((kt + 1,) + a.shape[1:], a.dtype)
    if kt > 3:
        F = F.at[2:kt - 1].set(_koren(wi[2:kt - 1], ai[0:kt - 3], ai[1:kt - 2],
                                      ai[2:kt - 1], ai[3:kt]))
    # first face off the bottom wall: upwind-from-below is 1st order
    f_up = wi[1] * ai[0]
    f_dn = _koren(jnp.minimum(wi[1], 0.), ai[0], ai[0], ai[1], ai[2])
    F = F.at[1].set(jnp.where(wi[1] >= 0., f_up, f_dn))
    # first face off the top wall: upwind-from-above is 1st order
    f_dn_t = wi[kt - 1] * ai[kt - 1]
    f_up_t = _koren(jnp.maximum(wi[kt - 1], 0.), ai[kt - 3], ai[kt - 2],
                    ai[kt - 1], ai[kt - 1])
    F = F.at[kt - 1].set(jnp.where(wi[kt - 1] >= 0., f_up_t, f_dn_t))

    rho = ctx.rhoref[ks:ke][:, None, None]
    rhoh = ctx.rhorefh[ks:ke + 1][:, None, None]
    dzi = ctx.dzi[ks:ke][:, None, None]
    ts = ts - (rhoh[1:] * F[1:] - rhoh[:-1] * F[:-1]) / rho * dzi
    return ts


class AdvecInterp:
    """Shared implementation; scheme in {'2i4', '2i5', '2i62', '2i53'}."""

    scheme = None

    def __init__(self, ini, grid):
        self.cflmax = ini.get_float("advec", "cflmax", default=1.0)
        self.cflmin = 1.e-5
        self.jtot = grid.jtot
        # Koren (1993) monotone fluxes for selected scalars
        # (advec_2i5.cxx:39-44, include/advec_monotonic.h)
        self.fluxlimit_list = ini.get_list(str, "advec", "fluxlimit_list",
                                           default=[])

    # horizontal face value + optional upwind part, at the LEFT face (-1/2).
    # 2i4 is 4th-order centered; 2i62 is 6th-order centered with NO upwind
    # dissipation anywhere (advec_2i62.cxx has no interp5_ws/interp3_ws);
    # 2i5/2i53 are 6th-order centered + 5th-order upwind.
    def _hx(self, q):
        if self.scheme == "2i4":
            return i4h_x(q), None
        if self.scheme == "2i62":
            return i6h_x(q), None
        return i6h_x(q), i5h_x(q)

    def _hy(self, q):
        if self.scheme == "2i4":
            return i4h_y(q), None
        if self.scheme == "2i62":
            return i6h_y(q), None
        return i6h_y(q), i5h_y(q)

    def _hterms(self, velR_x, velR_y, q):
        """-d(vel*q)/dx - d(vel*q)/dy + upwind, with velR_* the RIGHT-face
        advecting velocities of cell/node i (left = im/jm of them)."""
        qx, ux = self._hx(q)
        qxR, qxL = ip(qx), qx
        Fx = velR_x * qxR
        out = -(Fx - im(Fx))
        if ux is not None:
            Gx = jnp.abs(velR_x) * ip(ux)
            out = out + (Gx - im(Gx))
        out_x = out

        qy, uy = self._hy(q)
        Fy = velR_y * jp(qy)
        out = -(Fy - jm(Fy))
        if uy is not None:
            Gy = jnp.abs(velR_y) * jp(uy)
            out = out + (Gy - jm(Gy))
        return out_x, out

    def _vterm(self, ctx, velw_h, q, sign_rho=True):
        """Vertical flux divergence at centers using the half-level ladder.
        velw_h: advecting w-velocity at half levels ks..ke (ktot+1 planes)."""
        ks, ke = ctx.ks, ctx.ke
        X, U = _zh_ladder(self.scheme, q, ks, ke)
        rhh = ctx.rhorefh[ks:ke + 1][:, None, None]
        F = rhh * velw_h * X
        out = -(F[1:] - F[:-1]) / ctx.rhoref[ks:ke][:, None, None] * ctx.dzi[ks:ke][:, None, None]
        if self.scheme in ("2i5", "2i53"):
            G = rhh * jnp.abs(velw_h) * U
            out = out + (G[1:] - G[:-1]) / ctx.rhoref[ks:ke][:, None, None] * ctx.dzi[ks:ke][:, None, None]
        return out

    def exec(self, ctx, s, t, aux):
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        dxi, dyi = ctx.dxi, ctx.dyi
        t = dict(t)

        # ---- u ----
        velR_x = i2(u, ip(u))                 # at center i
        velR_y = jp(i2(im(v), v))             # at (xh, j+1/2)
        tx, ty = self._hterms(velR_x, velR_y, u)
        tu = tx[ks:ke] * dxi + ty[ks:ke] * dyi
        w_at_u = i2(im(w), w)[ks:ke + 1]
        tu = tu + self._vterm(ctx, w_at_u, u)
        t["u"] = t["u"].at[ks:ke].add(tu)

        # ---- v ----
        velR_x = ip(i2(jm(u), u))             # at (i+1/2, yh)
        velR_y = i2(v, jp(v))
        tx, ty = self._hterms(velR_x, velR_y, v)
        tv = tx[ks:ke] * dxi + ty[ks:ke] * dyi
        w_at_v = i2(jm(w), w)[ks:ke + 1]
        tv = tv + self._vterm(ctx, w_at_v, v)
        t["v"] = t["v"].at[ks:ke].add(tv)

        # ---- w ---- (half levels ks+1..ke-1)
        lo, hi = ks + 1, ke
        u_at_wh = jnp.zeros_like(u)
        u_at_wh = u_at_wh.at[lo:hi].set(0.5 * (u[lo - 1:hi - 1] + u[lo:hi]))
        v_at_wh = jnp.zeros_like(v)
        v_at_wh = v_at_wh.at[lo:hi].set(0.5 * (v[lo - 1:hi - 1] + v[lo:hi]))
        velR_x = ip(u_at_wh)
        velR_y = jp(v_at_wh)
        tx, ty = self._hterms(velR_x, velR_y, w)
        tw = tx[lo:hi] * dxi + ty[lo:hi] * dyi

        # vertical: fluxes at centers c in ks..ke-1; ladder over centers.
        kt = ke - ks
        velw_c = i2(w[ks:ke], w[ks + 1:ke + 1])   # at centers
        Xc = jnp.zeros((kt,) + w.shape[1:], dtype=w.dtype)
        Uc = jnp.zeros_like(Xc)
        # center value of w: interior per scheme; edge centers 2nd order
        Xc = Xc.at[0].set(i2(w[ks], w[ks + 1]))
        Xc = Xc.at[kt - 1].set(i2(w[ke - 1], w[ke]))
        if self.scheme == "2i62":
            Xc = Xc.at[1:kt - 1].set(i2(w[ks + 1:ke - 1], w[ks + 2:ke]))
        elif self.scheme == "2i53":
            if kt > 2:
                Xc = Xc.at[1:kt - 1].set(
                    (7. / 12.) * (w[ks + 1:ke - 1] + w[ks + 2:ke])
                    - (1. / 12.) * (w[ks:ke - 2] + w[ks + 3:ke + 1]))
                Uc = Uc.at[1:kt - 1].set(
                    (3. / 12.) * (w[ks + 2:ke] - w[ks + 1:ke - 1])
                    - (1. / 12.) * (w[ks + 3:ke + 1] - w[ks:ke - 2]))
        elif self.scheme == "2i4":
            if kt > 2:
                Xc = Xc.at[1:kt - 1].set(fd.ci0 * w[ks:ke - 2] + fd.ci1 * w[ks + 1:ke - 1]
                                         + fd.ci2 * w[ks + 2:ke] + fd.ci3 * w[ks + 3:ke + 1])
        else:  # 2i5
            if kt > 2:
                # second center off each wall: 4th-order WS + 3rd upwind
                # (advec_2i5.cxx:530-533,574-577)
                Xc = Xc.at[1].set(fd.interp4_ws(w[ks], w[ks + 1], w[ks + 2], w[ks + 3]))
                Uc = Uc.at[1].set(fd.interp3_ws(w[ks], w[ks + 1], w[ks + 2], w[ks + 3]))
                Xc = Xc.at[kt - 2].set(fd.interp4_ws(w[ke - 3], w[ke - 2], w[ke - 1], w[ke]))
                Uc = Uc.at[kt - 2].set(fd.interp3_ws(w[ke - 3], w[ke - 2], w[ke - 1], w[ke]))
            if kt > 4:
                Xc = Xc.at[2:kt - 2].set(
                    (37. / 60.) * (w[ks + 2:ke - 2] + w[ks + 3:ke - 1])
                    - (8. / 60.) * (w[ks + 1:ke - 3] + w[ks + 4:ke])
                    + (1. / 60.) * (w[ks:ke - 4] + w[ks + 5:ke + 1]))
                Uc = Uc.at[2:kt - 2].set(
                    (10. / 60.) * (w[ks + 3:ke - 1] - w[ks + 2:ke - 2])
                    - (5. / 60.) * (w[ks + 4:ke] - w[ks + 1:ke - 3])
                    + (1. / 60.) * (w[ks + 5:ke + 1] - w[ks:ke - 4]))
        rho_c = ctx.rhoref[ks:ke][:, None, None]
        Fc = rho_c * velw_c * Xc
        rhh = ctx.rhorefh[lo:hi][:, None, None]
        tw = tw - (Fc[1:] - Fc[:-1]) / rhh * ctx.dzhi[lo:hi][:, None, None]
        if self.scheme in ("2i5", "2i53"):
            Gc = rho_c * jnp.abs(velw_c) * Uc
            tw = tw + (Gc[1:] - Gc[:-1]) / rhh * ctx.dzhi[lo:hi][:, None, None]
        t["w"] = t["w"].at[lo:hi].add(tw)

        # ---- scalars ----
        for name in ctx.scalar_names:
            a = s[name]
            if name in self.fluxlimit_list:
                t[name] = t[name].at[ks:ke].add(
                    _advec_s_lim(ctx, a, u, v, w))
                continue
            tx, ty = self._hterms(ip(u), jp(v), a)
            ts = tx[ks:ke] * dxi + ty[ks:ke] * dyi
            ts = ts + self._vterm(ctx, w[ks:ke + 1], a)
            t[name] = t[name].at[ks:ke].add(ts)
        return t

    def cfl_max(self, ctx, s):
        ks, ke = ctx.ks, ctx.ke
        kt = ke - ks
        u, v, w = s["u"], s["v"], s["w"]
        if self.scheme == "2i4":
            uc = fd.ci0 * im(u) + fd.ci1 * u + fd.ci2 * ip(u) + fd.ci3 * ip(u, 2)
            vc = fd.ci0 * jm(v) + fd.ci1 * v + fd.ci2 * jp(v) + fd.ci3 * jp(v, 2)
        else:
            uc = ip(i6h_x(u))
            vc = jp(i6h_y(v))
        # |w| at centers: per-scheme vertical ladder matching the reference CFL
        # (advec_2i5.cxx:89-143, advec_2i53.cxx:83-113, advec_2i4.cxx:69-99,
        # advec_2i62.cxx:94-96)
        wc = i2(w[ks:ke], w[ks + 1:ke + 1])
        if self.scheme == "2i4" and kt > 2:
            wc = wc.at[1:kt - 1].set(fd.interp4c(
                w[ks:ke - 2], w[ks + 1:ke - 1], w[ks + 2:ke], w[ks + 3:ke + 1]))
        elif self.scheme == "2i53" and kt > 2:
            wc = wc.at[1:kt - 1].set(fd.interp4_ws(
                w[ks:ke - 2], w[ks + 1:ke - 1], w[ks + 2:ke], w[ks + 3:ke + 1]))
        elif self.scheme == "2i5":
            if kt > 2:
                wc = wc.at[1].set(fd.interp4_ws(w[ks], w[ks + 1], w[ks + 2], w[ks + 3]))
                wc = wc.at[kt - 2].set(fd.interp4_ws(w[ke - 3], w[ke - 2], w[ke - 1], w[ke]))
            if kt > 4:
                wc = wc.at[2:kt - 2].set(
                    (37. / 60.) * (w[ks + 2:ke - 2] + w[ks + 3:ke - 1])
                    - (8. / 60.) * (w[ks + 1:ke - 3] + w[ks + 4:ke])
                    + (1. / 60.) * (w[ks:ke - 4] + w[ks + 5:ke + 1]))
        c = (jnp.abs(uc)[ks:ke] * ctx.dxi + jnp.abs(vc)[ks:ke] * ctx.dyi
             + jnp.abs(wc) * ctx.dzi[ks:ke][:, None, None])
        return jnp.max(c)


class Advec2i4(AdvecInterp):
    scheme = "2i4"


class Advec2i5(AdvecInterp):
    scheme = "2i5"


class Advec2i62(AdvecInterp):
    scheme = "2i62"


class Advec2i53(AdvecInterp):
    scheme = "2i53"
