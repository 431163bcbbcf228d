"""Buoyancy-as-prognostic thermodynamics (reference ``src/thermo_buoy.cxx``).

Used by the SBL (stable boundary layer) DNN cases.  Supports the tilted-slope
variant (alpha, background N2) where buoyancy feeds both u and w tendencies
and the flow tilts the stratification into bt (thermo_buoy.cxx:110-165).
"""

import numpy as np
import jax.numpy as jnp

from .. import fd
from .stencil import i2, im, ip


class ThermoBuoy:
    def __init__(self, ini, grid, fields):
        self.grid = grid
        fields.init_prognostic_field("b", "Buoyancy", "m s-2", "thermo")
        self.alpha = ini.get_float("thermo", "alpha", default=0.)
        self.n2 = ini.get_float("thermo", "N2", default=0.)
        fields.sp["b"].visc = ini.get_float("fields", "svisc", subitem="th")
        self.has_slope = abs(self.alpha) > 0.
        self.has_n2 = abs(self.n2) > 0.
        self.swbaroclinic = ini.get_bool("thermo", "swbaroclinic", default=False)
        if self.swbaroclinic:
            self.dbdy_ls = ini.get_float("thermo", "dbdy_ls")

    @property
    def scalars(self):
        return ("b",)

    def create_basestate(self, input_nc):
        pass

    def _interp_z(self, ctx, b):
        """b interpolated to half levels ks+1..ke-1."""
        ks, ke = ctx.ks, ctx.ke
        if ctx.spatial_order == 2:
            return i2(b[ks:ke - 1], b[ks + 1:ke])
        return (fd.ci0 * b[ks - 1:ke - 2] + fd.ci1 * b[ks:ke - 1]
                + fd.ci2 * b[ks + 1:ke] + fd.ci3 * b[ks + 2:ke + 1])

    def exec(self, ctx, s, t, aux):
        ks, ke = ctx.ks, ctx.ke
        b = s["b"]
        t = dict(t)
        if self.has_slope or self.has_n2:
            sina, cosa = np.sin(self.alpha), np.cos(self.alpha)
            if ctx.spatial_order == 2:
                b_at_u = i2(im(b), b)[ks:ke]
                u_at_c = i2(s["u"], ip(s["u"]))[ks:ke]
            else:
                b_at_u = (fd.ci0 * im(b, 2) + fd.ci1 * im(b) + fd.ci2 * b + fd.ci3 * ip(b))[ks:ke]
                u_at_c = (fd.ci0 * im(s["u"]) + fd.ci1 * s["u"] + fd.ci2 * ip(s["u"]) + fd.ci3 * ip(s["u"], 2))[ks:ke]
            w_at_c = i2(s["w"][ks:ke], s["w"][ks + 1:ke + 1])
            t["u"] = t["u"].at[ks:ke].add(sina * b_at_u)
            t["w"] = t["w"].at[ks + 1:ke].add(cosa * self._interp_z(ctx, b))
            t["b"] = t["b"].at[ks:ke].add(-self.n2 * (sina * (u_at_c + ctx.utrans) + cosa * w_at_c))
        else:
            t["w"] = t["w"].at[ks + 1:ke].add(self._interp_z(ctx, b))
        if self.swbaroclinic:
            from .stencil import jp
            v_c = i2(s["v"], jp(s["v"]))[ks:ke]
            t["b"] = t["b"].at[ks:ke].add(-self.dbdy_ls * v_c)
        return t

    def get_buoyancy(self, ctx, s):
        return s["b"]

    def get_n2(self, ctx, s):
        ks, ke = ctx.ks, ctx.ke
        b = s["b"]
        return (0.5 * (b[ks + 1:ke + 1] - b[ks - 1:ke - 1]) * ctx.dzi[ks:ke][:, None, None]
                + self.n2)

    def get_buoyancy_fluxbot(self, ctx, s, sfc):
        return sfc["b_fluxbot"]

    def get_buoyancy_surf(self, ctx, s, sfc):
        return s["b"][ctx.ks], sfc["b_bot"]

    def get_db_ref(self):
        return 0.

    def get_time_limit_rate(self, ctx, s):
        return None
