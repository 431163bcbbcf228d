"""Bulk-transfer-coefficient surface boundary (reference
``src/boundary_surface_bulk.cxx``).

Prescribed drag coefficient ``bulk_cm`` for momentum and per-scalar
``bulk_cs``: fluxes are ``-C * |du| * (a - a_bot)``; ustar = sqrt(Cm)*|du|,
Obukhov length diagnosed from the resulting buoyancy flux; MO gradients for
the SGS model computed like the MOST scheme.
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from . import most
from .boundary_surface import BoundarySurface
from .boundary import DIRICHLET, FLUX, make_bcs
from .stencil import im, ip, jm, jp


class BoundarySurfaceBulk(BoundarySurface):
    is_surface = True

    def __init__(self, ini, fields, grid):
        # Reuse the MOST scheme's state layout and ghost-cell logic; only
        # the flux computation differs.
        self.grid = grid
        self.fields = fields
        self.bcs = make_bcs(ini, fields)
        self.viscs = {"u": fields.visc, "v": fields.visc}
        for name, f in fields.sp.items():
            self.viscs[name] = f.visc
        self.offsets = {"u": grid.utrans, "v": grid.vtrans}
        self.mbcbot = self.bcs["u"].bcbot
        self.z0m = 0.
        self.z0h = 0.
        self.bulk_cm = ini.get_float("boundary", "bulk_cm")
        self.bulk_cs = {name: ini.get_float("boundary", "bulk_cs", subitem=name)
                        for name in fields.sp}
        self.thermo = None
        self._lut = None
        self.use_lut = False
        self.sw_constant_z0 = True

    def exec(self, ctx, s, sfc, aux):
        g = self.grid
        ks = ctx.ks
        zsl = float(g.z[ks])
        sfc = dict(sfc)

        dutot = self._calc_dutot(ctx, s, sfc)

        u, v = s["u"][ks], s["v"][ks]
        ubot, vbot = sfc["u_bot"], sfc["v_bot"]
        Cm = self.bulk_cm
        sfc["u_fluxbot"] = -Cm * dutot * (u - ubot)
        sfc["v_fluxbot"] = -Cm * dutot * (v - vbot)
        sfc["u_gradbot"] = (u - ubot) / zsl
        sfc["v_gradbot"] = (v - vbot) / zsl

        for name in self.fields.sp:
            Cs = self.bulk_cs[name]
            var = s[name][ks]
            varbot = sfc[name + "_bot"]
            sfc[name + "_fluxbot"] = -Cs * dutot * (var - varbot)
            sfc[name + "_gradbot"] = (var - varbot) / zsl

        thermo_on = self.thermo is not None and getattr(self.thermo, "scalars", ())
        ustar = np.sqrt(Cm) * dutot
        sfc["ustar"] = ustar
        if thermo_on:
            bfluxbot = self.thermo.get_buoyancy_fluxbot(ctx, s, sfc)
            sfc["obuk"] = -(ustar ** 3) / (cst.kappa * bfluxbot)
        else:
            sfc["obuk"] = jnp.full_like(ustar, -cst.dbig)
        obuk = sfc["obuk"]

        # MO gradients for the SGS model (same as the MOST scheme).
        du_c = 0.5 * ((u - ubot) + (ip(u) - ip(ubot)))
        dv_c = 0.5 * ((v - vbot) + (jp(v) - jp(vbot)))
        fac = most.phim(zsl / obuk) / (cst.kappa * zsl * ustar)
        sfc["dudz_mo"] = du_c * Cm * dutot * fac
        sfc["dvdz_mo"] = dv_c * Cm * dutot * fac
        if thermo_on:
            bfluxbot = self.thermo.get_buoyancy_fluxbot(ctx, s, sfc)
            sfc["dbdz_mo"] = -bfluxbot / (cst.kappa * zsl * ustar) * most.phih(zsl / obuk)
        return sfc

    def init_surface_state(self, dtype=np.float64):
        sfc = BoundarySurface.init_surface_state(self, dtype=dtype)
        return sfc
