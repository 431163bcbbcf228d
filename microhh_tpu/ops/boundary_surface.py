"""Monin-Obukhov (MOST) surface boundary (reference ``src/boundary_surface.cxx``).

TPU-first re-design notes:

* All surface planes (ustar, obuk, fluxes, gradients) live in the carried
  ``sfc`` dict of 2-D (jtot, itot) arrays and are updated functionally each
  substep, mirroring the reference's ``Boundary_surface::exec``
  (boundary_surface.cxx:830-975).
* The Obukhov length comes from the reference's z/L lookup table, evaluated
  with one vectorized ``searchsorted`` over the whole surface plane (see
  most.py) instead of a per-point warm-started linear search or Newton loop —
  branch-free, no data-dependent iteration under jit.
* z0 may be constant (``swconstantz0=true``, default), a 2-D map loaded from
  ``z0m.0000000``/``z0h.0000000``, or Charnock sea-surface roughness updated
  from the previous substep's ustar (``swcharnock=true``).
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from . import most
from .boundary import (BC, make_bcs, set_ghost_cells_field, set_ghost_cells_w,
                       DIRICHLET, NEUMANN, FLUX, USTAR)
from .stencil import im, ip, jm, jp, i2


class BoundarySurface:
    is_surface = True

    def __init__(self, ini, fields, grid):
        self.grid = grid
        self.fields = fields
        self.bcs = make_bcs(ini, fields)
        self.viscs = {"u": fields.visc, "v": fields.visc}
        for name, f in fields.sp.items():
            self.viscs[name] = f.visc
        self.offsets = {"u": grid.utrans, "v": grid.vtrans}

        self.sw_constant_z0 = ini.get_bool("boundary", "swconstantz0", default=True)
        self.sw_charnock = ini.get_bool("boundary", "swcharnock", default=False)
        if self.sw_charnock and self.sw_constant_z0:
            raise ValueError("swcharnock=true requires swconstantz0=false")
        if self.sw_charnock:
            self.alpha_m = ini.get_float("boundary", "alpha_m")
            self.alpha_ch = ini.get_float("boundary", "alpha_ch")
            self.alpha_h = ini.get_float("boundary", "alpha_h")
        if self.sw_constant_z0:
            self.z0m = ini.get_float("boundary", "z0m")
            self.z0h = ini.get_float("boundary", "z0h")
        else:
            # heterogeneous z0: maps come from z0m/z0h.0000000 (or Charnock
            # each substep); scalar ini values only seed the first step.
            self.z0m = ini.get_float("boundary", "z0m", default=0.1)
            self.z0h = ini.get_float("boundary", "z0h", default=0.01)
        self._z0m_2d = None   # set by load_z0() for heterogeneous z0
        self._z0h_2d = None

        mbcbot = self.bcs["u"].bcbot
        if mbcbot == NEUMANN:
            raise ValueError("Neumann bc is not supported in surface model")
        self.mbcbot = mbcbot
        if mbcbot == USTAR:
            self.ustarin = ini.get_float("boundary", "ustar")
        for name in fields.sp:
            if self.bcs[name].bcbot == NEUMANN:
                raise ValueError("Fixed gradient bc is not supported in surface model")
            if self.bcs[name].bcbot == DIRICHLET and mbcbot == USTAR:
                raise ValueError("Fixed ustar + Dirichlet scalar bc not supported")

        self.thermo = None  # set by Model after construction

        self._lut = None
        # The z/L lookup table maps to slow gathers on TPU; the vectorized
        # warm-started Newton solve is the default (MICROHH_MOST_LUT=1 to
        # force the reference's LUT interpolation).
        import os
        self.use_lut = os.environ.get("MICROHH_MOST_LUT", "0") == "1"

    def _thermobc(self):
        if self.thermo is None or not getattr(self.thermo, "scalars", ()):
            return FLUX
        return self.bcs[self.thermo.scalars[0]].bcbot

    def _get_lut(self):
        # Cache NUMPY arrays only — caching device arrays created inside a
        # trace leaks tracers (jnp.asarray of numpy at use-site is a cheap
        # compile-time constant).
        if self._lut is None:
            zsl = self.grid.z[self.grid.kstart]
            thermobc = self._thermobc()
            self._lut = most.prepare_lut(self.z0m, self.z0h, zsl,
                                         mbcbot_dirichlet=(self.mbcbot == DIRICHLET),
                                         thermobc_flux=(thermobc == FLUX))
        zL, f = self._lut
        return jnp.asarray(zL), jnp.asarray(f)

    def load_z0(self, workdir="."):
        """2-D roughness maps z0m.0000000/z0h.0000000 (boundary_surface.cxx
        load(): constant-z0 runs skip this; Charnock starts from the scalar
        ini values until the first ustar is available)."""
        import os
        g = self.grid
        for attr, name in (("_z0m_2d", "z0m"), ("_z0h_2d", "z0h")):
            path = os.path.join(workdir, "%s.%07d" % (name, 0))
            if os.path.exists(path):
                setattr(self, attr, np.fromfile(path, dtype=np.float64)
                        .reshape(g.jtot, g.itot))

    # ------------------------------------------------------------------
    def init_surface_state(self, dtype=np.float64):
        """Initial sfc dict (reference init_surface: obuk=-dbig etc.)."""
        g = self.grid
        shape = (g.jtot, g.itot)
        z = lambda: np.zeros(shape, dtype=dtype)
        sfc = {"ustar": np.full(shape, 0.1, dtype=dtype),
               "obuk": np.full(shape, -cst.dbig, dtype=dtype),
               "dudz_mo": z(), "dvdz_mo": z(), "dbdz_mo": z()}
        if self.mbcbot == USTAR:
            sfc["ustar"][:] = self.ustarin
        if not self.sw_constant_z0:
            sfc["z0m"] = (self._z0m_2d.astype(dtype) if self._z0m_2d is not None
                          else np.full(shape, self.z0m, dtype=dtype))
            sfc["z0h"] = (self._z0h_2d.astype(dtype) if self._z0h_2d is not None
                          else np.full(shape, self.z0h, dtype=dtype))
        for name in ("u", "v"):
            bc = self.bcs[name]
            sfc[name + "_bot"] = np.full(shape, bc.bot - self.offsets[name], dtype=dtype)
            sfc[name + "_fluxbot"] = z()
            sfc[name + "_gradbot"] = z()
        for name in self.fields.sp:
            bc = self.bcs[name]
            sfc[name + "_bot"] = z()
            sfc[name + "_fluxbot"] = z()
            sfc[name + "_gradbot"] = z()
            if bc.bcbot == DIRICHLET:
                sfc[name + "_bot"][:] = bc.bot
            elif bc.bcbot == FLUX:
                sfc[name + "_fluxbot"][:] = bc.bot
        return sfc

    # ------------------------------------------------------------------
    def _calc_dutot(self, ctx, s, sfc):
        """Filtered wind-speed difference (boundary_surface_kernels.h:136-183)."""
        ks = ctx.ks
        u = s["u"][ks]
        v = s["v"][ks]

        def filt_u(a):
            row = 0.5 * im(a) + a + ip(a) + 0.5 * ip(a, 2)
            return (jm(row) + row + jp(row)) / 9.

        def filt_v(a):
            col = 0.5 * jm(a) + a + jp(a) + 0.5 * jp(a, 2)
            return (im(col) + col + ip(col)) / 9.

        ubot, vbot = sfc["u_bot"], sfc["v_bot"]
        du = filt_u(u) - 0.5 * (ubot + ip(ubot))
        dv = filt_v(v) - 0.5 * (vbot + jp(vbot))
        return jnp.maximum(jnp.sqrt(du * du + dv * dv), 0.1)

    def exec(self, ctx, s, sfc, aux):
        """Stability + surface fluxes/gradients; returns the new sfc."""
        g = self.grid
        ks = ctx.ks
        zsl = float(g.z[ks])
        sfc = dict(sfc)

        if self.sw_constant_z0:
            z0m, z0h = self.z0m, self.z0h
        else:
            z0m, z0h = sfc["z0m"], sfc["z0h"]
            if self.sw_charnock:
                # IFS-style sea-surface roughness from the previous ustar
                # (boundary_surface.cxx:342-368).
                visc_a, gi = 1.5e-5, 1. / cst.grav
                us = jnp.maximum(sfc["ustar"], 1e-8)
                z0m = self.alpha_m * visc_a / us + self.alpha_ch * us ** 2 * gi
                z0h = self.alpha_h * visc_a / us
                sfc["z0m"], sfc["z0h"] = z0m, z0h

        dutot = self._calc_dutot(ctx, s, sfc)

        thermo_on = self.thermo is not None and getattr(self.thermo, "scalars", ())
        if not thermo_on:
            # stability_neutral (boundary_surface.cxx:141-186)
            obuk = jnp.full_like(dutot, -cst.dbig)
            if self.mbcbot == USTAR:
                ustar = sfc["ustar"]
            else:
                ustar = dutot * most.fm(zsl, z0m, obuk)
        else:
            bfluxbot = self.thermo.get_buoyancy_fluxbot(ctx, s, sfc)
            thermobc = self._thermobc()
            if self.mbcbot == USTAR and thermobc == FLUX:
                ustar = sfc["ustar"]
                obuk = -(ustar ** 3) / (cst.kappa * bfluxbot)
            elif self.mbcbot == DIRICHLET and thermobc == FLUX:
                Ri = -cst.kappa * bfluxbot * zsl / dutot ** 3
                if self.use_lut and self.sw_constant_z0:
                    zL_lut, f_lut = self._get_lut()
                    zL = most.lookup_zL(zL_lut, f_lut, Ri).astype(ctx.dtype)
                else:
                    zL = most.solve_zL_flux(Ri, zsl / sfc["obuk"], zsl, z0m)
                obuk = zsl / zL
                ustar = dutot * most.fm(zsl, z0m, obuk)
            elif self.mbcbot == DIRICHLET and thermobc == DIRICHLET:
                b, bbot = self.thermo.get_buoyancy_surf(ctx, s, sfc)
                db = b - bbot + self.thermo.get_db_ref()
                Ri = cst.kappa * db * zsl / dutot ** 2
                if self.use_lut and self.sw_constant_z0:
                    zL_lut, f_lut = self._get_lut()
                    zL = most.lookup_zL(zL_lut, f_lut, Ri).astype(ctx.dtype)
                else:
                    zL = most.solve_zL_dirichlet(Ri, zsl / sfc["obuk"], zsl,
                                                 z0m, z0h)
                obuk = zsl / zL
                ustar = dutot * most.fm(zsl, z0m, obuk)
            else:
                raise ValueError("unsupported mbcbot/thermobc combination")

        sfc["ustar"] = ustar
        sfc["obuk"] = obuk

        # surfm (boundary_surface.cxx:188-320)
        u, v = s["u"][ks], s["v"][ks]
        ubot, vbot = sfc["u_bot"], sfc["v_bot"]
        ufm = ustar * most.fm(zsl, z0m, obuk)
        if self.mbcbot == DIRICHLET:
            sfc["u_fluxbot"] = -(u - ubot) * 0.5 * (im(ufm) + ufm)
            sfc["v_fluxbot"] = -(v - vbot) * 0.5 * (jm(ufm) + ufm)
        elif self.mbcbot == USTAR:
            minval = 1.e-2
            du, dv = u - ubot, v - vbot
            vonu2 = jnp.maximum(minval, 0.25 * (im(dv) ** 2 + im(jp(dv)) ** 2 + dv ** 2 + jp(dv) ** 2))
            uonv2 = jnp.maximum(minval, 0.25 * (jm(du) ** 2 + jm(ip(du)) ** 2 + du ** 2 + ip(du) ** 2))
            u2 = jnp.maximum(minval, du ** 2)
            v2 = jnp.maximum(minval, dv ** 2)
            ustaronu4 = 0.5 * (im(ustar) ** 4 + ustar ** 4)
            ustaronv4 = 0.5 * (jm(ustar) ** 4 + ustar ** 4)
            sfc["u_fluxbot"] = -jnp.sign(du) * jnp.sqrt(ustaronu4 / (1. + vonu2 / u2))
            sfc["v_fluxbot"] = -jnp.sign(dv) * jnp.sqrt(ustaronv4 / (1. + uonv2 / v2))
        sfc["u_gradbot"] = (u - ubot) / zsl
        sfc["v_gradbot"] = (v - vbot) / zsl

        # surfs per scalar (boundary_surface.cxx:322-380)
        fh2d = ustar * most.fh(zsl, z0h, obuk)
        for name in self.fields.sp:
            bc = self.bcs[name]
            var = s[name][ks]
            if bc.bcbot == DIRICHLET:
                varbot = sfc[name + "_bot"]
                sfc[name + "_fluxbot"] = -(var - varbot) * fh2d
                sfc[name + "_gradbot"] = (var - varbot) / zsl
            elif bc.bcbot == FLUX:
                fluxbot = sfc[name + "_fluxbot"]
                varbot = fluxbot / fh2d + var
                sfc[name + "_bot"] = varbot
                sfc[name + "_gradbot"] = (var - varbot) / zsl

        # MO gradients for the SGS model (calc_duvdz_mo / calc_dbdz_mo)
        # dudz = -ufluxbot_c/(kappa*zsl*ustar)*phim with ufluxbot_c =
        # -du_c*ustar*fm -> dudz = du_c*fm*phim/(kappa*zsl).
        du_c = 0.5 * ((u - ubot) + (ip(u) - ip(ubot)))
        dv_c = 0.5 * ((v - vbot) + (jp(v) - jp(vbot)))
        fac = most.fm(zsl, z0m, obuk) * most.phim(zsl / obuk) / (cst.kappa * zsl)
        sfc["dudz_mo"] = du_c * fac
        sfc["dvdz_mo"] = dv_c * fac
        if thermo_on:
            bfluxbot = self.thermo.get_buoyancy_fluxbot(ctx, s, sfc)
            sfc["dbdz_mo"] = -bfluxbot / (cst.kappa * zsl * ustar) * most.phih(zsl / obuk)
        return sfc

    # ------------------------------------------------------------------
    def restart_fields(self):
        """Surface planes that must survive a restart bitwise (reference
        boundary_surface.cxx:638-685): the MO gradients feed the next
        step's eddy viscosity, the flux-BC gradbots feed set_ghost_cells,
        and obuk warm-starts the Obukhov solve."""
        names = ["dudz_mo", "dvdz_mo", "dbdz_mo", "obuk", "ustar"]
        from .boundary import FLUX
        for n, bc in self.bcs.items():
            if n not in ("u", "v") and bc.bcbot == FLUX:
                names.append(n + "_gradbot")
        return names

    def save(self, sfc, iotime, path="."):
        from ..utils import fastio
        for name in self.restart_fields():
            if name in sfc:
                fastio.write_array("%s/%s.%07d" % (path, name, iotime),
                                   np.asarray(sfc[name]))

    def load(self, sfc, iotime, path=".", dtype=np.float64):
        import os
        from ..utils import fastio
        fastio.flush()
        g = self.grid
        sfc = dict(sfc)
        for name in self.restart_fields():
            fn = "%s/%s.%07d" % (path, name, iotime)
            if os.path.exists(fn):
                sfc[name] = np.fromfile(fn, dtype=dtype).reshape(g.jtot,
                                                                 g.itot)
        return sfc

    def flux_ghost_names(self):
        """Fields whose ghost planes depend on the surface-model output
        (what the post-boundary-exec refill must update): scalars always
        (gradbot from MOST), u/v only under the ustar BC."""
        names = list(self.fields.sp.keys())
        if self.mbcbot == USTAR:
            names = ["u", "v"] + names
        return tuple(names)

    def set_ghost_cells(self, ctx, s, sfc, names=None):
        """Ghost fill using the surface model's 2-D bot/grad planes.
        ``names`` restricts the fill to a subset (the second per-substep
        refill after boundary exec only touches flux-dependent fields,
        saving full-array rewrites of the rest)."""
        from .boundary import _bot_ghost_2nd, _top_ghost_2nd, _assemble_ghosts
        out = dict(s)
        ks, ke = ctx.ks, ctx.ke
        todo = (["u", "v"] + list(self.fields.sp.keys())
                if names is None else list(names))
        for name in todo:
            a = s[name]
            bc = self.bcs[name]
            # Bottom: Dirichlet from <f>_bot or Neumann from <f>_gradbot.
            if self.mbcbot == USTAR and name in ("u", "v"):
                # ustar bc: Neumann with MO gradient
                bot = -sfc[name + "_gradbot"] * ctx.dzh[ks] + a[ks]
            elif name in ("u", "v"):
                bot = 2. * sfc[name + "_bot"] - a[ks]
            else:
                # scalars: both Dirichlet and Flux reduce to a gradient fill
                bot = -sfc[name + "_gradbot"] * ctx.dzh[ks] + a[ks]
            if ctx.spatial_order == 2:
                # Top: static BC from ini (same as default boundary); one
                # fused concatenate instead of per-plane scatters.
                top = _top_ghost_2nd(ctx, a, bc.bctop, bc.top,
                                     self.viscs[name],
                                     self.offsets.get(name, 0.))
                out[name] = _assemble_ghosts(ctx, a, bot, top)
            else:
                a = a.at[ks - 1].set(bot)
                out[name] = set_ghost_cells_field(
                    ctx, a, BC("off", 0., bc.bctop, bc.top),
                    self.viscs[name], self.offsets.get(name, 0.))
        if names is None:
            out["w"] = set_ghost_cells_w(ctx, s["w"], conservation=False)
        return out
