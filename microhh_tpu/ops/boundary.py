"""Default boundary conditions: vertical ghost-cell fill.

Reference: ``src/boundary.cxx`` (``set_bc``, ``calc_ghost_cells_{bot,top}_{2nd,4th}``,
``calc_ghost_cells_{bot,top}w[_cons]_4th``, ``set_ghost_cells``).

In the TPU design, horizontal periodicity needs no explicit exchange (rolls
handle it; see stencil.py), so only the vertical ghost levels are computed
here — as a functional update on the state dict, executed at the top of every
RK substep exactly like the reference calls ``set_ghost_cells`` in its loop
(``src/model.cxx:345-380``).
"""

import numpy as np
import jax.numpy as jnp

from .. import fd

DIRICHLET = "dirichlet"
NEUMANN = "neumann"
FLUX = "flux"
OFF = "off"
USTAR = "ustar"

_MOMENTUM_MAP = {"noslip": DIRICHLET, "freeslip": NEUMANN, "neumann": NEUMANN,
                 "ustar": USTAR, "off": OFF}


class BC:
    """Per-field boundary condition: (type, value) at bot and top.

    ``value`` semantics per type (reference ``set_bc``, boundary.cxx:50-91):
    dirichlet -> surface value; neumann -> gradient; flux -> flux (the ghost
    fill converts it to a gradient with -flux/visc).
    """

    def __init__(self, bcbot, bot, bctop, top):
        self.bcbot, self.bot, self.bctop, self.top = bcbot, bot, bctop, top


def make_bcs(ini, fields):
    """Parse [boundary] like Boundary::process_bcs (boundary.cxx:185-273)."""
    swbot = ini.get_str("boundary", "mbcbot")
    swtop = ini.get_str("boundary", "mbctop")
    if swbot not in _MOMENTUM_MAP:
        raise ValueError("%s is an illegal value for mbcbot" % swbot)
    if swtop not in _MOMENTUM_MAP:
        raise ValueError("%s is an illegal value for mbctop" % swtop)

    ubot = ini.get_float("boundary", "ubot", default=0.)
    utop = ini.get_float("boundary", "utop", default=0.)
    vbot = ini.get_float("boundary", "vbot", default=0.)
    vtop = ini.get_float("boundary", "vtop", default=0.)

    bcs = {
        "u": BC(_MOMENTUM_MAP[swbot], ubot, _MOMENTUM_MAP[swtop], utop),
        "v": BC(_MOMENTUM_MAP[swbot], vbot, _MOMENTUM_MAP[swtop], vtop),
    }
    for name in fields.sp:
        bcs[name] = BC(
            ini.get_str("boundary", "sbcbot", subitem=name),
            ini.get_float("boundary", "sbot", subitem=name, default=0.),
            ini.get_str("boundary", "sbctop", subitem=name),
            ini.get_float("boundary", "stop", subitem=name, default=0.),
        )
    return bcs


def _grad_from(bctype, value, visc):
    """Neumann gradient equivalent of a BC value (flux -> -flux/visc)."""
    if bctype == FLUX:
        return -value / visc
    return value


def _bot_ghost_2nd(ctx, a, bcbot, bot, visc, offset=0.):
    """Bottom ghost plane (reference calc_ghost_cells_bot_2nd); None if the
    BC type leaves it untouched."""
    ks = ctx.ks
    if bcbot == DIRICHLET:
        return 2. * (bot - offset) - a[ks]
    if bcbot in (NEUMANN, FLUX):
        return -_grad_from(bcbot, bot, visc) * ctx.dzh[ks] + a[ks]
    return None


def _top_ghost_2nd(ctx, a, bctop, top, visc, offset=0.):
    """Top ghost plane (reference calc_ghost_cells_top_2nd)."""
    ke = ctx.ke
    if bctop in (DIRICHLET, OFF):
        topv = top - offset
        if bctop == OFF:
            topv = 1.5 * a[ke - 1] - 0.5 * a[ke - 2]
        return 2. * topv - a[ke - 1]
    if bctop in (NEUMANN, FLUX):
        return _grad_from(bctop, top, visc) * ctx.dzh[ke] + a[ke - 1]
    return None


def _assemble_ghosts(ctx, a, bot, top):
    """Rebuild the field with new ghost planes in ONE fused pass (a single
    concatenate instead of per-plane scatter updates, which XLA
    materializes as separate full-array copies)."""
    ks, ke = ctx.ks, ctx.ke
    bot = a[ks - 1] if bot is None else jnp.broadcast_to(bot, a.shape[1:])
    top = a[ke] if top is None else jnp.broadcast_to(top, a.shape[1:])
    return jnp.concatenate([bot[None].astype(a.dtype), a[ks:ke],
                            top[None].astype(a.dtype)], axis=0)


def set_ghost_cells_field(ctx, a, bc, visc, offset=0.):
    """Fill the vertical ghost levels of one cell-centered field."""
    ks, ke = ctx.ks, ctx.ke
    if ctx.spatial_order == 2:
        bot = _bot_ghost_2nd(ctx, a, bc.bcbot, bc.bot, visc, offset)
        top = _top_ghost_2nd(ctx, a, bc.bctop, bc.top, visc, offset)
        return _assemble_ghosts(ctx, a, bot, top)
    else:
        z = ctx.z
        # Bottom (reference calc_ghost_cells_bot_4th).
        if bc.bcbot == DIRICHLET:
            bot = bc.bot - offset
            a = a.at[ks - 1].set((8. / 3.) * bot - 2. * a[ks] + (1. / 3.) * a[ks + 1])
            a = a.at[ks - 2].set(8. * bot - 9. * a[ks] + 2. * a[ks + 1])
        elif bc.bcbot in (NEUMANN, FLUX):
            grad = _grad_from(bc.bcbot, bc.bot, visc)
            g4 = fd.grad4(z[ks - 2], z[ks - 1], z[ks], z[ks + 1])
            a = a.at[ks - 1].set(-1. * g4 * grad + a[ks])
            a = a.at[ks - 2].set(-3. * g4 * grad + a[ks + 1])
        # Top (reference calc_ghost_cells_top_4th).
        if bc.bctop == DIRICHLET:
            top = bc.top - offset
            a = a.at[ke].set((8. / 3.) * top - 2. * a[ke - 1] + (1. / 3.) * a[ke - 2])
            a = a.at[ke + 1].set(8. * top - 9. * a[ke - 1] + 2. * a[ke - 2])
        elif bc.bctop in (NEUMANN, FLUX):
            grad = _grad_from(bc.bctop, bc.top, visc)
            g4 = fd.grad4(z[ke - 2], z[ke - 1], z[ke], z[ke + 1])
            a = a.at[ke].set(1. * g4 * grad + a[ke - 1])
            a = a.at[ke + 1].set(3. * g4 * grad + a[ke - 2])
    return a


def set_ghost_cells_w(ctx, w, conservation=False):
    """4th-order w ghost levels (reference boundary.cxx:843-915); 2nd order
    needs none."""
    if ctx.spatial_order == 2:
        return w
    ks, ke = ctx.ks, ctx.ke
    if conservation:
        w = w.at[ks - 1].set(-w[ks + 1])
        w = w.at[ks - 2].set(-w[ks + 2])
        w = w.at[ke + 1].set(-w[ke - 1])
        w = w.at[ke + 2].set(-w[ke - 2])
    else:
        w = w.at[ks - 1].set(-6. * w[ks + 1] + 4. * w[ks + 2] - w[ks + 3])
        w = w.at[ke + 1].set(-6. * w[ke - 1] + 4. * w[ke - 2] - w[ke - 3])
    return w


class DefaultBoundary:
    """swboundary=default: static BCs from the ini file."""

    def __init__(self, ini, fields, grid):
        self.bcs = make_bcs(ini, fields)
        self.viscs = {"u": fields.visc, "v": fields.visc}
        for name, f in fields.sp.items():
            self.viscs[name] = f.visc
        self.offsets = {"u": grid.utrans, "v": grid.vtrans}

    def set_ghost_cells(self, ctx, s, sfc=None):
        out = dict(s)
        for name, bc in self.bcs.items():
            out[name] = set_ghost_cells_field(
                ctx, s[name], bc, self.viscs[name], self.offsets.get(name, 0.))
        out["w"] = set_ghost_cells_w(ctx, s["w"], conservation=False)
        return out

    def exec(self, ctx, s, sfc, aux):
        """Surface-model hook (MOST etc.); default scheme does nothing."""
        return sfc
