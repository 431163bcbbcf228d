"""Fully 4th-order energy-conserving advection (reference ``src/advec_4.cxx``).

Flux-divergence form with ci/cg interior stencils and bi/ti boundary rows at
the walls; needs 3 vertical ghost levels and conservation-type w ghosts
(set by the model around advec, as model.cxx:387-389 does).
"""

import jax.numpy as jnp

from .. import fd
from . import fd4
from .stencil import im, ip, jm, jp


def _phi_ext(mid, bot, top):
    return jnp.concatenate([bot[None], mid, top[None]], axis=0)


def advec_u(ctx, u, v, w, dim3):
    ks, ke = ctx.ks, ctx.ke
    dzi4 = ctx.dzi4[ks:ke][:, None, None]

    G = fd4.ixh(u)
    out = -fd4.ixd(G * G)[ks:ke] * ctx.dxi

    if dim3:
        F = fd4.ixh(v) * fd4.jyh(u)
        out = out - fd4.jyd(F)[ks:ke] * ctx.dyi

    wix = fd4.ixh(w)
    phi_mid = wix[ks:ke + 1] * fd4.izh_mid(u, ks, ke)
    phi_bot = wix[ks - 1] * fd4.izh_bot(u, ks)
    phi_top = wix[ke + 1] * fd4.izh_top(u, ke)
    out = out - fd4.izd(_phi_ext(phi_mid, phi_bot, phi_top), dzi4)
    return out


def advec_v(ctx, u, v, w, dim3):
    """v is advected even in 2-D runs; only the vv y-flux is gated
    (advec_4.cxx:605 instantiates advec_v<TF,0>)."""
    ks, ke = ctx.ks, ctx.ke
    dzi4 = ctx.dzi4[ks:ke][:, None, None]

    F = fd4.jyh(u) * fd4.ixh(v)
    out = -fd4.ixd(F)[ks:ke] * ctx.dxi

    if dim3:
        G = fd4.jyh(v)
        out = out - fd4.jyd(G * G)[ks:ke] * ctx.dyi

    wjy = fd4.jyh(w)
    phi_mid = wjy[ks:ke + 1] * fd4.izh_mid(v, ks, ke)
    phi_bot = wjy[ks - 1] * fd4.izh_bot(v, ks)
    phi_top = wjy[ke + 1] * fd4.izh_top(v, ke)
    out = out - fd4.izd(_phi_ext(phi_mid, phi_bot, phi_top), dzi4)
    return out


def advec_w(ctx, u, v, w, dim3):
    """Half levels ks+1..ke-1."""
    ks, ke = ctx.ks, ctx.ke
    lo, hi = ks + 1, ke
    dzhi4 = ctx.dzhi4[lo:hi][:, None, None]

    # u interpolated to half level (uzh at xh), times w interpolated in x.
    uzh = fd4.izh_mid(u, lo, hi - 1)  # half levels lo..hi-1
    wix4 = fd4.ixh(w)[lo:hi]
    out = -fd4.ixd(uzh * wix4)[...] * ctx.dxi
    # note ixd acts on i axis; k extent already lo..hi-1

    if dim3:
        vzh = fd4.izh_mid(v, lo, hi - 1)
        wjy4 = fd4.jyh(w)[lo:hi]
        out = out - fd4.jyd(vzh * wjy4) * ctx.dyi

    # vertical: wc[c] = interp of w to center c (uses w[c-1..c+2])
    # needed for c in ks-1 .. ke; edge rows replace cg0/cg3 factors.
    wc = (fd.ci0 * w[ks - 2:ke] + fd.ci1 * w[ks - 1:ke + 1]
          + fd.ci2 * w[ks:ke + 2] + fd.ci3 * w[ks + 1:ke + 3])  # c = ks-1..ke
    wc2 = wc * wc  # index c - (ks-1)
    kt = hi - lo  # number of target half levels

    # term_z[k] = cg0*wc2[k-2] + cg1*wc2[k-1] + cg2*wc2[k] + cg3*wc2[k+1]
    # with k = lo..hi-1; in wc-index space k-2 -> (k-2)-(ks-1) = k-ks-1.
    c0 = wc2[0:kt]          # c = k-2
    c1 = wc2[1:kt + 1]      # c = k-1
    c2 = wc2[2:kt + 2]      # c = k
    c3 = wc2[3:kt + 3]      # c = k+1
    # Edge replacements (advec_4.cxx:327-331, 380-384):
    wb = fd.bi0 * w[ks - 1] + fd.bi1 * w[ks] + fd.bi2 * w[ks + 1] + fd.bi3 * w[ks + 2]
    wt_ = fd.ti0 * w[ke - 2] + fd.ti1 * w[ke - 1] + fd.ti2 * w[ke] + fd.ti3 * w[ke + 1]
    c0 = c0.at[0].set(wb * wb)
    c3 = c3.at[-1].set(wt_ * wt_)

    out = out - (fd.cg0 * c0 + fd.cg1 * c1 + fd.cg2 * c2 + fd.cg3 * c3) * dzhi4
    return out


def advec_s(ctx, s, u, v, w, dim3):
    ks, ke = ctx.ks, ctx.ke
    dzi4 = ctx.dzi4[ks:ke][:, None, None]

    out = -fd4.ixd(u * fd4.ixh(s))[ks:ke] * ctx.dxi
    if dim3:
        out = out - fd4.jyd(v * fd4.jyh(s))[ks:ke] * ctx.dyi

    phi_mid = w[ks:ke + 1] * fd4.izh_mid(s, ks, ke)
    phi_bot = w[ks - 1] * fd4.izh_bot(s, ks)
    phi_top = w[ke + 1] * fd4.izh_top(s, ke)
    out = out - fd4.izd(_phi_ext(phi_mid, phi_bot, phi_top), dzi4)
    return out


class Advec4:
    needs_w_cons_ghosts = True

    def __init__(self, ini, grid):
        self.cflmax = ini.get_float("advec", "cflmax", default=1.0)
        self.cflmin = 1.e-5
        self.jtot = grid.jtot

    def exec(self, ctx, s, t, aux):
        u, v, w = s["u"], s["v"], s["w"]
        ks, ke = ctx.ks, ctx.ke
        dim3 = self.jtot > 1
        t = dict(t)
        t["u"] = t["u"].at[ks:ke].add(advec_u(ctx, u, v, w, dim3))
        t["v"] = t["v"].at[ks:ke].add(advec_v(ctx, u, v, w, dim3))
        t["w"] = t["w"].at[ks + 1:ke].add(advec_w(ctx, u, v, w, dim3))
        for name in ctx.scalar_names:
            t[name] = t[name].at[ks:ke].add(advec_s(ctx, s[name], u, v, w, dim3))
        return t

    def cfl_max(self, ctx, s):
        """interp4c-based CFL (advec_4.cxx:51-86)."""
        ks, ke = ctx.ks, ctx.ke
        u, v, w = s["u"], s["v"], s["w"]
        uc = (fd.ci0 * im(u) + fd.ci1 * u + fd.ci2 * ip(u) + fd.ci3 * ip(u, 2))[ks:ke]
        vc = (fd.ci0 * jm(v) + fd.ci1 * v + fd.ci2 * jp(v) + fd.ci3 * jp(v, 2))[ks:ke]
        wc = (fd.ci0 * w[ks - 1:ke - 1] + fd.ci1 * w[ks:ke]
              + fd.ci2 * w[ks + 1:ke + 1] + fd.ci3 * w[ks + 2:ke + 2])
        c = (jnp.abs(uc) * ctx.dxi + jnp.abs(vc) * ctx.dyi
             + jnp.abs(wc) * ctx.dzi[ks:ke][:, None, None])
        return jnp.max(c)
