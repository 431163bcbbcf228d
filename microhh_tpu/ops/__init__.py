"""Physics-operator factories (mirror the reference's scheme factories)."""


class DisabledOp:
    """Shared no-op scheme (advec/diff/pres/thermo *_disabled.cxx)."""

    def __init__(self, *a, **k):
        pass

    def exec(self, ctx, s, t, aux, *a, **k):
        return t

    def exec_viscosity(self, ctx, s, sfc, aux):
        return aux

    def cfl_max(self, ctx, s):
        return None

    def get_dn(self, ctx, s, aux):
        return None


class PresDisabled(DisabledOp):
    def set_values(self):
        pass

    def device_params(self):
        return {}

    def exec(self, ctx, s, t, aux, subdt, pp=None):
        return t, aux

    def divergence_max(self, ctx, s):
        import jax.numpy as jnp
        return jnp.zeros((), dtype=ctx.dtype)


def make_advec(ini, grid, fields):
    sw = ini.get_str("advec", "swadvec", default=str(grid.spatial_order))
    if sw == "0":
        return DisabledOp()
    if sw == "2":
        from .advec_2 import Advec2
        return Advec2(ini, grid)
    if sw == "2i4":
        from .advec_interp import Advec2i4
        return Advec2i4(ini, grid)
    if sw == "2i5":
        from .advec_interp import Advec2i5
        return Advec2i5(ini, grid)
    if sw == "2i62":
        from .advec_interp import Advec2i62
        return Advec2i62(ini, grid)
    if sw == "2i53":
        from .advec_interp import Advec2i53
        return Advec2i53(ini, grid)
    if sw == "4":
        from .advec_4 import Advec4
        return Advec4(ini, grid)
    if sw == "4m":
        from .advec_4m import Advec4m
        return Advec4m(ini, grid)
    raise ValueError("%s is an illegal value for swadvec" % sw)


def make_diff(ini, grid, fields, boundary):
    sw = ini.get_str("diff", "swdiff", default=str(grid.spatial_order))
    if sw == "0":
        return DisabledOp()
    if sw == "2":
        from .diff_2 import Diff2
        return Diff2(ini, grid, fields)
    if sw == "4":
        from .diff_4 import Diff4
        return Diff4(ini, grid, fields)
    if sw == "smag2":
        from .diff_smag2 import DiffSmag2
        return DiffSmag2(ini, grid, fields, boundary)
    if sw in ("dnn_local", "dnn_global", "dnn_stats"):
        from .diff_dnn import DiffDNN
        return DiffDNN(ini, grid, fields, boundary, variant=sw)
    raise ValueError("%s is an illegal value for swdiff" % sw)


def make_pres(ini, grid, fields, dtype):
    sw = ini.get_str("pres", "swpres", default=str(grid.spatial_order))
    if sw == "0":
        return PresDisabled()
    if sw == "2":
        from .pres_2 import Pres2
        return Pres2(ini, grid, fields, dtype)
    if sw == "4":
        from .pres_4 import Pres4
        return Pres4(ini, grid, fields, dtype)
    raise ValueError("%s is an illegal value for swpres" % sw)


def make_thermo(ini, grid, fields):
    sw = ini.get_str("thermo", "swthermo", default="0")
    if sw == "0":
        from .thermo import ThermoDisabled
        return ThermoDisabled()
    if sw == "dry":
        from .thermo_dry import ThermoDry
        return ThermoDry(ini, grid, fields)
    if sw == "buoy":
        from .thermo_buoy import ThermoBuoy
        return ThermoBuoy(ini, grid, fields)
    if sw == "moist":
        from .thermo_moist import ThermoMoist
        return ThermoMoist(ini, grid, fields)
    if sw == "vapor":
        from .thermo_vapor import ThermoVapor
        return ThermoVapor(ini, grid, fields)
    raise ValueError("%s is an illegal value for swthermo" % sw)


def make_boundary(ini, fields, grid):
    sw = ini.get_str("boundary", "swboundary", default="default")
    if sw == "default":
        from .boundary import DefaultBoundary
        return DefaultBoundary(ini, fields, grid)
    if sw == "surface":
        from .boundary_surface import BoundarySurface
        return BoundarySurface(ini, fields, grid)
    if sw == "surface_bulk":
        from .boundary_surface_bulk import BoundarySurfaceBulk
        return BoundarySurfaceBulk(ini, fields, grid)
    if sw == "surface_lsm":
        # Interactive land surface needs the sub-surface soil grid
        # (reference src/boundary.cxx:1149-1157 + soil_grid.cxx).  The
        # SoilGrid rides on the returned object so Model can reuse it.
        from ..soil import SoilGrid
        from .boundary_surface_lsm import BoundarySurfaceLSM
        soil_grid = SoilGrid(ini)
        fields.soil_ktot = soil_grid.ktot
        b = BoundarySurfaceLSM(ini, fields, grid, soil_grid)
        b.soil_grid = soil_grid
        return b
    raise ValueError("%s is an illegal value for swboundary" % sw)
