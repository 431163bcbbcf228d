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
