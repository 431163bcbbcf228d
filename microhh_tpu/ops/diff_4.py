"""4th-order constant-viscosity diffusion (reference ``src/diff_4.cxx``)."""

import jax.numpy as jnp

from .. import fd
from .stencil import im, ip, jm, jp


def _lap_h(a, dxidxi, dyidyi, dim3):
    """7-point 4th-order second derivative, horizontal (cdg stencil)."""
    out = (fd.cdg3 * (im(a, 3) + ip(a, 3)) + fd.cdg2 * (im(a, 2) + ip(a, 2))
           + fd.cdg1 * (im(a, 1) + ip(a, 1)) + fd.cdg0 * a) * dxidxi
    if dim3:
        out = out + (fd.cdg3 * (jm(a, 3) + jp(a, 3)) + fd.cdg2 * (jm(a, 2) + jp(a, 2))
                     + fd.cdg1 * (jm(a, 1) + jp(a, 1)) + fd.cdg0 * a) * dyidyi
    return out


def diff_c(ctx, a, visc, dim3):
    """Cell-centered field, interior levels (diff_4.cxx diff_c)."""
    ks, ke = ctx.ks, ctx.ke
    kt = ke - ks
    dxidxi, dyidyi = ctx.dxi ** 2, ctx.dyi ** 2
    out = _lap_h(a, dxidxi, dyidyi, dim3)[ks:ke]

    # vertical: gradient at half levels ks-1..ke+1, cg-divergence at centers
    gz_mid = ((fd.cg0 * a[ks - 2:ke - 1] + fd.cg1 * a[ks - 1:ke]
               + fd.cg2 * a[ks:ke + 1] + fd.cg3 * a[ks + 1:ke + 2])
              * ctx.dzhi4[ks:ke + 1][:, None, None])  # half ks..ke
    gz_bot = ((fd.bg0 * a[ks - 2] + fd.bg1 * a[ks - 1] + fd.bg2 * a[ks] + fd.bg3 * a[ks + 1])
              * ctx.dzhi4[ks - 1])
    gz_top = ((fd.tg0 * a[ke - 2] + fd.tg1 * a[ke - 1] + fd.tg2 * a[ke] + fd.tg3 * a[ke + 1])
              * ctx.dzhi4[ke + 1])
    gz = jnp.concatenate([gz_bot[None], gz_mid, gz_top[None]], axis=0)
    vert = (fd.cg0 * gz[0:kt] + fd.cg1 * gz[1:kt + 1]
            + fd.cg2 * gz[2:kt + 2] + fd.cg3 * gz[3:kt + 3]) * ctx.dzi4[ks:ke][:, None, None]
    return visc * (out + vert)


def diff_w(ctx, w, visc, dim3):
    """w on half levels ks+1..ke-1 (diff_4.cxx diff_w)."""
    ks, ke = ctx.ks, ctx.ke
    lo, hi = ks + 1, ke
    kt = hi - lo
    dxidxi, dyidyi = ctx.dxi ** 2, ctx.dyi ** 2
    out = _lap_h(w, dxidxi, dyidyi, dim3)[lo:hi]

    # gradient of w at centers c = ks..ke-1 (uses w[c-1..c+2]), times dzi4[c]
    gz_mid = ((fd.cg0 * w[ks - 1:ke - 1] + fd.cg1 * w[ks:ke]
               + fd.cg2 * w[ks + 1:ke + 1] + fd.cg3 * w[ks + 2:ke + 2])
              * ctx.dzi4[ks:ke][:, None, None])  # centers ks..ke-1
    gz_bot = ((fd.bg0 * w[ks - 1] + fd.bg1 * w[ks] + fd.bg2 * w[ks + 1] + fd.bg3 * w[ks + 2])
              * ctx.dzi4[ks - 1])
    gz_top = ((fd.tg0 * w[ke - 2] + fd.tg1 * w[ke - 1] + fd.tg2 * w[ke] + fd.tg3 * w[ke + 1])
              * ctx.dzi4[ke])
    gz = jnp.concatenate([gz_bot[None], gz_mid, gz_top[None]], axis=0)
    # term[k] = (cg0*gz[c=k-2] + cg1*gz[k-1] + cg2*gz[k] + cg3*gz[k+1]) * dzhi4[k]
    vert = (fd.cg0 * gz[0:kt] + fd.cg1 * gz[1:kt + 1]
            + fd.cg2 * gz[2:kt + 2] + fd.cg3 * gz[3:kt + 3]) * ctx.dzhi4[lo:hi][:, None, None]
    return visc * (out + vert)


class Diff4:
    def __init__(self, ini, grid, fields):
        self.dnmax = ini.get_float("diff", "dnmax", default=0.4)
        viscmax = fields.visc
        for f in fields.sp.values():
            viscmax = max(viscmax, f.visc)
        g = grid
        dn = 0.
        for k in range(g.kstart, g.kend):
            dn = max(dn, abs(viscmax * (1. / g.dx ** 2 + 1. / g.dy ** 2 + 1. / g.dz[k] ** 2)))
        self.dnmul = dn
        self.visc = fields.visc
        self.viscs = {name: f.visc for name, f in fields.sp.items()}
        self.jtot = grid.jtot

    def exec_viscosity(self, ctx, s, sfc, aux):
        return aux

    def exec(self, ctx, s, t, aux, sfc=None):
        ks, ke = ctx.ks, ctx.ke
        dim3 = self.jtot > 1
        t = dict(t)
        t["u"] = t["u"].at[ks:ke].add(diff_c(ctx, s["u"], self.visc, dim3))
        if dim3:
            t["v"] = t["v"].at[ks:ke].add(diff_c(ctx, s["v"], self.visc, dim3))
        t["w"] = t["w"].at[ks + 1:ke].add(diff_w(ctx, s["w"], self.visc, dim3))
        for name in ctx.scalar_names:
            t[name] = t[name].at[ks:ke].add(diff_c(ctx, s[name], self.viscs[name], dim3))
        return t

    def get_dn(self, ctx, s, aux):
        return jnp.asarray(self.dnmul, dtype=ctx.dtype)
