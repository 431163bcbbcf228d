"""Water-vapor thermodynamics without condensation (reference
``src/thermo_vapor.cxx``).

Same thl+qt prognostics and virtual-temperature buoyancy as thermo_moist,
but no saturation adjustment anywhere (ql = qi = 0 identically)."""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from .stencil import i2
from .thermo_moist import (ThermoMoist, exner, virtual_temperature_no_ql,
                           buoyancy_no_ql, buoyancy_flux_no_ql)


class ThermoVapor(ThermoMoist):
    # per-substep basestate update is also condensate-free
    # (thermo_vapor.cxx:539 calc_base_state_no_ql)
    _basestate_no_ql = True

    def create_basestate(self, input_nc):
        """No-ql hydrostatic base state (thermo_moist_functions.h
        calc_base_state_no_ql)."""
        self._make_tdep_pbot(input_nc)
        g = self.grid
        kc, ks, ke = g.kcells, g.kstart, g.kend
        thvref = np.zeros(kc)
        thvrefh = np.zeros(kc)
        pref = np.zeros(kc)
        prefh = np.zeros(kc)

        if self.swbasestate == "boussinesq":
            return ThermoMoist.create_basestate(self, input_nc)

        init = input_nc.groups["init"]
        thl = np.zeros(kc)
        qt = np.zeros(kc)
        thl[ks:ke] = np.asarray(init.variables["thl"][:g.ktot], dtype=np.float64)
        qt[ks:ke] = np.asarray(init.variables["qt"][:g.ktot], dtype=np.float64)
        thl[ks - 1] = thl[ks]
        qt[ks - 1] = qt[ks]

        rho = np.ones(kc)
        rhoh = np.ones(kc)
        thlsurf = 0.5 * (thl[ks - 1] + thl[ks])
        qtsurf = 0.5 * (qt[ks - 1] + qt[ks])
        prefh[ks] = self.pbot
        exh = exner(prefh[ks])
        thvrefh[ks] = virtual_temperature_no_ql(thlsurf, qtsurf)
        rhoh[ks] = self.pbot / (cst.Rd * exh * thvrefh[ks])
        pref[ks] = prefh[ks] * np.exp(-cst.grav * g.z[ks] / (cst.Rd * exh * thvrefh[ks]))
        for k in range(ks + 1, ke + 1):
            ex = exner(pref[k - 1])
            thvref[k - 1] = virtual_temperature_no_ql(thl[k - 1], qt[k - 1])
            rho[k - 1] = pref[k - 1] / (cst.Rd * ex * thvref[k - 1])
            prefh[k] = prefh[k - 1] * np.exp(-cst.grav * g.dz[k - 1] / (cst.Rd * ex * thvref[k - 1]))
            exh = exner(prefh[k])
            thli = 0.5 * (thl[k - 1] + thl[k]) if k < ke else thl[k - 1]
            qti = 0.5 * (qt[k - 1] + qt[k]) if k < ke else qt[k - 1]
            thvrefh[k] = virtual_temperature_no_ql(thli, qti)
            rhoh[k] = prefh[k] / (cst.Rd * exh * thvrefh[k])
            pref[k] = pref[k - 1] * np.exp(-cst.grav * g.dzh[k] / (cst.Rd * exh * thvrefh[k]))
        pref[ks - 1] = 2. * prefh[ks] - pref[ks]
        self.fields.rhoref = rho
        self.fields.rhorefh = rhoh

        self.thvref = thvref
        self.thvrefh = thvrefh
        self.pref = pref
        self.prefh = prefh
        self.exnref = exner(np.where(pref > 0., pref, cst.p0))
        self.exnrefh = exner(np.where(prefh > 0., prefh, cst.p0))

    def exec(self, ctx, s, t, aux):
        """wt += buoyancy_no_ql at half levels (thermo_vapor.cxx:85-105)."""
        ks, ke = ctx.ks, ctx.ke
        thl, qt = s["thl"], s["qt"]
        thlh = i2(thl[ks:ke - 1], thl[ks + 1:ke])
        qth = i2(qt[ks:ke - 1], qt[ks + 1:ke])
        thvrefh = jnp.asarray(self.thvrefh, dtype=ctx.dtype)[ks + 1:ke][:, None, None]
        t = dict(t)
        t["w"] = t["w"].at[ks + 1:ke].add(buoyancy_no_ql(thlh, qth, thvrefh))
        return t

    def get_buoyancy(self, ctx, s):
        thvref = jnp.asarray(self.thvref, dtype=ctx.dtype)[:, None, None]
        return buoyancy_no_ql(s["thl"], s["qt"], thvref)

    def get_ql(self, ctx, s):
        ks, ke = ctx.ks, ctx.ke
        return jnp.zeros_like(s["thl"][ks:ke])
