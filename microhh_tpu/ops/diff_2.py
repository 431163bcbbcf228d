"""2nd-order constant-viscosity diffusion (reference ``src/diff_2.cxx``)."""

import numpy as np
import jax.numpy as jnp

from .stencil import im, ip, jm, jp


def diff_c(ctx, a, visc):
    """Laplacian diffusion of a cell-centered field, interior k slice."""
    ks, ke = ctx.ks, ctx.ke
    dxidxi = ctx.dxi * ctx.dxi
    dyidyi = ctx.dyi * ctx.dyi
    lap_h = ((ip(a) - 2. * a + im(a)) * dxidxi
             + (jp(a) - 2. * a + jm(a)) * dyidyi)[ks:ke]
    dzhi = ctx.dzhi
    dzi = ctx.dzi
    lap_z = ((a[ks + 1:ke + 1] - a[ks:ke]) * dzhi[ks + 1:ke + 1][:, None, None]
             - (a[ks:ke] - a[ks - 1:ke - 1]) * dzhi[ks:ke][:, None, None]) * dzi[ks:ke][:, None, None]
    return visc * (lap_h + lap_z)


def diff_w(ctx, w, visc):
    """Diffusion of w on half levels k in [ks+1, ke)."""
    ks, ke = ctx.ks, ctx.ke
    lo, hi = ks + 1, ke
    dxidxi = ctx.dxi * ctx.dxi
    dyidyi = ctx.dyi * ctx.dyi
    lap_h = ((ip(w) - 2. * w + im(w)) * dxidxi
             + (jp(w) - 2. * w + jm(w)) * dyidyi)[lo:hi]
    dzi = ctx.dzi
    dzhi = ctx.dzhi
    lap_z = ((w[lo + 1:hi + 1] - w[lo:hi]) * dzi[lo:hi][:, None, None]
             - (w[lo:hi] - w[lo - 1:hi - 1]) * dzi[lo - 1:hi - 1][:, None, None]) * dzhi[lo:hi][:, None, None]
    return visc * (lap_h + lap_z)


class Diff2:
    def __init__(self, ini, grid, fields):
        self.dnmax = ini.get_float("diff", "dnmax", default=0.4)
        # dnmul: static dt multiplier (reference diff_2.cxx:139-151).
        viscmax = fields.visc
        for f in fields.sp.values():
            viscmax = max(viscmax, f.visc)
        g = grid
        dn = 0.
        for k in range(g.kstart, g.kend):
            dn = max(dn, abs(viscmax * (1. / g.dx ** 2 + 1. / g.dy ** 2 + 1. / g.dz[k] ** 2)))
        self.dnmul = dn
        self.viscs = {}
        self.visc = fields.visc
        for name, f in fields.sp.items():
            self.viscs[name] = f.visc

    def exec_viscosity(self, ctx, s, sfc, aux):
        return aux

    def exec(self, ctx, s, t, aux, sfc=None):
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        t["u"] = t["u"].at[ks:ke].add(diff_c(ctx, s["u"], self.visc))
        t["v"] = t["v"].at[ks:ke].add(diff_c(ctx, s["v"], self.visc))
        t["w"] = t["w"].at[ks + 1:ke].add(diff_w(ctx, s["w"], self.visc))
        for name in ctx.scalar_names:
            t[name] = t[name].at[ks:ke].add(diff_c(ctx, s[name], self.viscs[name]))
        return t

    def get_dn(self, ctx, s, aux):
        """Diffusion number per unit dt (host multiplies by dt)."""
        return jnp.asarray(self.dnmul, dtype=ctx.dtype)
