"""4th-order modified (kinetic-energy conserving) advection
(reference ``src/advec_4m.cxx``).

Fluxes at the four half-positions around each node: 4th-order interpolated
advecting velocity times a *midpoint* (2-point) interpolation of the
transported quantity — narrow (adjacent) for the inner pair, wide (3-apart)
for the outer pair — combined with grad4.  Wall rows replace the
outside-the-wall flux by a mirrored negative flux.
"""

import jax.numpy as jnp

from .. import fd
from . import fd4
from .stencil import im, ip, jm, jp
from .advec_4 import Advec4


def _grad4(a, b, c, d):
    return -fd.cg0 * (d - a) - fd.cg1 * (c - b)


def _flux4_x(velh, q):
    """-grad4 of the x-fluxes around each node; velh at i-1/2."""
    a = im(velh) * 0.5 * (im(q, 3) + q)
    b = velh * 0.5 * (im(q) + q)
    c = ip(velh) * 0.5 * (q + ip(q))
    d = ip(velh, 2) * 0.5 * (q + ip(q, 3))
    return -_grad4(a, b, c, d)


def _flux4_y(velh, q):
    a = jm(velh) * 0.5 * (jm(q, 3) + q)
    b = velh * 0.5 * (jm(q) + q)
    c = jp(velh) * 0.5 * (q + jp(q))
    d = jp(velh, 2) * 0.5 * (q + jp(q, 3))
    return -_grad4(a, b, c, d)


def _vert_4m(ctx, wvel_h, q):
    """Vertical -grad4 term for a cell-centered target, levels ks..ke-1.
    wvel_h: advecting velocity at half levels (full kcells array)."""
    ks, ke = ctx.ks, ctx.ke
    a = wvel_h[ks - 1:ke - 1] * 0.5 * (q[ks - 3:ke - 3] + q[ks:ke])
    b = wvel_h[ks:ke] * 0.5 * (q[ks - 1:ke - 1] + q[ks:ke])
    c = wvel_h[ks + 1:ke + 1] * 0.5 * (q[ks:ke] + q[ks + 1:ke + 1])
    d = wvel_h[ks + 2:ke + 2] * 0.5 * (q[ks:ke] + q[ks + 3:ke + 3])
    # Wall rows: mirrored negative outer fluxes (advec_4m.cxx bottom/top).
    a = a.at[0].set(-wvel_h[ks + 1] * 0.5 * (q[ks - 1] + q[ks + 2]))
    d = d.at[-1].set(-wvel_h[ke - 1] * 0.5 * (q[ke - 3] + q[ke]))
    return -_grad4(a, b, c, d) * ctx.dzi4[ks:ke][:, None, None]


class Advec4m(Advec4):
    """Inherits CFL from Advec4 (same interp4c formula, advec_4m.cxx)."""

    needs_w_cons_ghosts = True

    def exec(self, ctx, s, t, aux):
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        dxi, dyi = ctx.dxi, ctx.dyi
        dim3 = self.jtot > 1
        t = dict(t)

        # ---- u ----
        tu = _flux4_x(fd4.ixh(u), u)[ks:ke] * dxi
        if dim3:
            tu = tu + _flux4_y(fd4.ixh(v), u)[ks:ke] * dyi
        tu = tu + _vert_4m(ctx, fd4.ixh(w), u)
        t["u"] = t["u"].at[ks:ke].add(tu)

        # ---- v (advected in 2-D too; only the y-flux is gated,
        #      advec_4m.cxx:536 instantiates advec_v<TF,0>) ----
        tv = _flux4_x(fd4.jyh(u), v)[ks:ke] * dxi
        if dim3:
            tv = tv + _flux4_y(fd4.jyh(v), v)[ks:ke] * dyi
        tv = tv + _vert_4m(ctx, fd4.jyh(w), v)
        t["v"] = t["v"].at[ks:ke].add(tv)

        # ---- w (half levels ks+1..ke-1; uses conservation w ghosts) ----
        lo, hi = ks + 1, ke
        uzh4 = jnp.zeros_like(u)
        uzh4 = uzh4.at[ks - 1:ke + 2].set(
            fd.ci0 * u[ks - 3:ke] + fd.ci1 * u[ks - 2:ke + 1]
            + fd.ci2 * u[ks - 1:ke + 2] + fd.ci3 * u[ks:ke + 3])
        tw = _flux4_x(uzh4, w)[lo:hi] * dxi
        if dim3:
            vzh4 = jnp.zeros_like(v)
            vzh4 = vzh4.at[ks - 1:ke + 2].set(
                fd.ci0 * v[ks - 3:ke] + fd.ci1 * v[ks - 2:ke + 1]
                + fd.ci2 * v[ks - 1:ke + 2] + fd.ci3 * v[ks:ke + 3])
            tw = tw + _flux4_y(vzh4, w)[lo:hi] * dyi
        # vertical: center-located fluxes; wc4[c] needs w[c-1..c+2], so the
        # usable center range is ks-1..ke (w has 3 ghost levels).
        wc4 = jnp.zeros_like(w)
        wc4 = wc4.at[ks - 1:ke + 1].set(
            fd.ci0 * w[ks - 2:ke] + fd.ci1 * w[ks - 1:ke + 1]
            + fd.ci2 * w[ks:ke + 2] + fd.ci3 * w[ks + 1:ke + 3])
        a = wc4[lo - 2:hi - 2] * 0.5 * (w[lo - 3:hi - 3] + w[lo:hi])
        b = wc4[lo - 1:hi - 1] * 0.5 * (w[lo - 1:hi - 1] + w[lo:hi])
        c = wc4[lo:hi] * 0.5 * (w[lo:hi] + w[lo + 1:hi + 1])
        d = wc4[lo + 1:hi + 1] * 0.5 * (w[lo:hi] + w[lo + 3:hi + 3])
        tw = tw - _grad4(a, b, c, d) * ctx.dzhi4[lo:hi][:, None, None]
        t["w"] = t["w"].at[lo:hi].add(tw)

        # ---- scalars ----
        for name in ctx.scalar_names:
            a_ = s[name]
            ts = _flux4_x(u, a_)[ks:ke] * dxi
            if dim3:
                ts = ts + _flux4_y(v, a_)[ks:ke] * dyi
            ts = ts + _vert_4m(ctx, w, a_)
            t[name] = t[name].at[ks:ke].add(ts)
        return t
