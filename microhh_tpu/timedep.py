"""Time-dependent boundary/forcing data (reference ``src/timedep.cxx``).

Reads series from the input NetCDF ``timedep`` group (variable ``<name>``
over dimension ``time_surface``/``time_ls``; profiles carry a z dimension)
and interpolates at the current integer time with the reference's
interpolation-factor logic (``timeloop.cxx get_interpolation_factors``).
Interpolation happens on the HOST each iteration — results enter the jitted
step as updated surface-plane entries or profile arguments, never as
recompile-triggering constants.
"""

import numpy as np

from .timeloop import IFACTOR


class Timedep:
    def __init__(self, input_nc, name, dim="time_surface"):
        self.name = name
        group = input_nc.groups.get("timedep") if input_nc is not None else None
        if group is None or name not in group.variables:
            raise KeyError("timedep variable %s not found" % name)
        self.time = np.asarray(group.variables[dim][:], dtype=np.float64)
        self.data = np.asarray(group.variables[name][:], dtype=np.float64)
        self.itime = (self.time * IFACTOR + 0.5).astype(np.uint64)

    def interpolate(self, itime):
        """Linear interpolation at integer time (timeloop.cxx:603-642)."""
        it = np.asarray(self.itime, dtype=np.float64)
        t = float(itime)
        if t < it[0] or t > it[-1]:
            raise ValueError("Interpolation time out of range for %s" % self.name)
        i1 = int(np.searchsorted(it, t, side="right"))
        if i1 >= len(it):
            i1 = len(it) - 1
        i0 = i1 - 1
        fac0 = (it[i1] - t) / (it[i1] - it[i0])
        fac1 = (t - it[i0]) / (it[i1] - it[i0])
        return fac0 * self.data[i0] + fac1 * self.data[i1]


class Sbot2D:
    """[boundary] sbot_2d_list: spatially-varying surface BCs from binary
    2-D maps ``<scalar>_bot_in.<iotime>`` (reference boundary.cxx:269,
    :625-660 static, :349-540 time-dependent).  Static maps load once at run
    start; with ``swtimedep_sbot_2d`` a prev/next window of maps spaced
    ``sbot_2d_loadtime`` seconds apart is linearly interpolated on the HOST
    each iteration — the interpolated plane enters the jitted step through
    the sfc dict, never as a recompiling constant."""

    def __init__(self, ini, fields):
        self.list = ini.get_list(str, "boundary", "sbot_2d_list", default=[])
        self.swtimedep = ini.get_bool("boundary", "swtimedep_sbot_2d",
                                      default=False)
        self.loadtime = (ini.get_float("boundary", "sbot_2d_loadtime")
                         if self.swtimedep else None)
        self._window = None   # (itime_prev, itime_next, {fld: (prev, next)})

    @staticmethod
    def _bc_key(boundary, scalar):
        bc = boundary.bcs[scalar].bcbot
        suffix = {"dirichlet": "_bot", "neumann": "_gradbot",
                  "flux": "_fluxbot"}[bc]
        return scalar + suffix

    def _read(self, model, fld, itime):
        iotime = int(itime // model.timeloop.iiotimeprec)
        path = "%s/%s_bot_in.%07d" % (model.workdir, fld, iotime)
        g = model.grid
        return np.fromfile(path, dtype=model.dtype).reshape(g.jtot, g.itot)

    def apply_static(self, model, sfc):
        """Load <s>_bot_in.0000000 into the matching BC plane (the
        reference does this once in set_values, boundary.cxx:636-660)."""
        if not self.list or self.swtimedep:
            return sfc
        import jax.numpy as jnp
        sfc = dict(sfc)
        for fld in self.list:
            key = self._bc_key(model.boundary, fld)
            if key not in sfc:
                raise NotImplementedError(
                    "sbot_2d_list requires a surface boundary scheme")
            sfc[key] = jnp.asarray(self._read(model, fld, 0))
        return sfc

    def update(self, model, sfc, itime):
        """Advance the prev/next map window and interpolate (boundary.cxx
        update_time_dependent, :482-540)."""
        if not self.swtimedep or not self.list:
            return sfc
        import jax.numpy as jnp
        ildt = int(self.loadtime * IFACTOR + 0.5)
        if self._window is None:
            it_prev = (int(itime) // ildt) * ildt
            maps = {fld: (self._read(model, fld, it_prev),
                          self._read(model, fld, it_prev + ildt))
                    for fld in self.list}
            self._window = (it_prev, it_prev + ildt, maps)
        it_prev, it_next, maps = self._window
        # advance only when itime passes the window end (boundary.cxx:487),
        # so the final step at exactly it_next reuses the loaded maps
        while int(itime) > it_next:
            it_prev, it_next = it_next, it_next + ildt
            maps = {fld: (maps[fld][1], self._read(model, fld, it_next))
                    for fld in self.list}
        self._window = (it_prev, it_next, maps)
        fac1 = (float(itime) - it_prev) / (it_next - it_prev)
        sfc = dict(sfc)
        for fld in self.list:
            prev, nxt = self._window[2][fld]
            key = self._bc_key(model.boundary, fld)
            if key not in sfc:
                raise NotImplementedError(
                    "swtimedep_sbot_2d requires a surface boundary scheme")
            sfc[key] = jnp.asarray((1. - fac1) * prev + fac1 * nxt,
                                   dtype=model.dtype)
        return sfc


class BoundaryTimedep:
    """[boundary] swtimedep + timedeplist: entries named ``<scalar>_sbot``
    update the surface BC value each iteration (reference
    boundary.cxx:269-360)."""

    def __init__(self, ini, fields, input_nc):
        self.sw = ini.get_bool("boundary", "swtimedep", default=False)
        self.items = {}
        if not self.sw:
            return
        names = ini.get_list(str, "boundary", "timedeplist", default=[])
        for entry in names:
            if not entry.endswith("_sbot"):
                continue
            scalar = entry[:-5]
            self.items[scalar] = Timedep(input_nc, entry, "time_surface")

    def update(self, model, sfc, itime):
        """Return sfc with the interpolated BC values applied according to
        each scalar's BC type."""
        if not self.items:
            return sfc
        import jax.numpy as jnp
        bnd = model.boundary
        sfc = dict(sfc)
        for scalar, td in self.items.items():
            val = float(td.interpolate(itime))
            bc = bnd.bcs[scalar]
            if bc.bcbot == "dirichlet":
                key = scalar + "_bot"
            elif bc.bcbot == "flux":
                key = scalar + "_fluxbot"
            else:
                key = scalar + "_gradbot"
            if key not in sfc:
                raise NotImplementedError(
                    "swtimedep currently requires a surface boundary scheme "
                    "(the default scheme bakes BC values into the jit)")
            sfc[key] = jnp.full_like(sfc[key], val)
        return sfc
