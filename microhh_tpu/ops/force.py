"""Large-scale forcings (reference ``src/force.cxx``).

Implemented: swlspres in {0/disabled, uflux, dpdx, geo(+coriolis)}, large-scale
source terms (swls + lslist), subsidence (swwls=mean/local), nudging (swnudge).
Profiles come from the input NetCDF ``init`` group; each family supports the
reference's time dependence (swtimedep_ls/_geo/_wls/_nudge over the
``timedep`` group's ``time_ls`` axis, force.cxx:354-415,744-756) via
host-side interpolation into the carried surface state — no recompiles.
"""

import numpy as np
import jax.numpy as jnp

from .stencil import i2, im, ip, jm, jp


def _prof(input_nc, name, ktot):
    init = input_nc.groups["init"]
    return np.asarray(init.variables[name][:ktot], dtype=np.float64)


class Force:
    def __init__(self, ini, grid, fields, input_nc):
        self.grid = grid
        self.tdep_geo = {}
        self.tdep_wls = None
        self.tdep_nudge = {}
        self.swlspres = ini.get_str("force", "swlspres", default="0")
        if self.swlspres in ("0", "false"):
            self.swlspres = "0"
        self.swls = ini.get_str("force", "swls", default="0")
        self.swwls = ini.get_str("force", "swwls", default="0")
        self.swnudge = ini.get_str("force", "swnudge", default="0")

        ks, ke, kt = grid.kstart, grid.kend, grid.ktot

        if self.swlspres == "uflux":
            self.uflux = ini.get_float("force", "uflux")
        elif self.swlspres == "dpdx":
            self.dpdx = ini.get_float("force", "dpdx")
        elif self.swlspres == "geo":
            self.fc = ini.get_float("force", "fc")
            ug = _prof(input_nc, "u_geo", kt)
            vg = _prof(input_nc, "v_geo", kt)
            self.ug = ug[:, None, None]
            self.vg = vg[:, None, None]
            if ini.get_bool("force", "swtimedep_geo", default=False):
                from ..timedep import Timedep
                self.tdep_geo = {"u": Timedep(input_nc, "u_geo", "time_ls"),
                                 "v": Timedep(input_nc, "v_geo", "time_ls")}
        elif self.swlspres != "0":
            raise ValueError("%s is an illegal value for swlspres" % self.swlspres)

        if self.swls == "1":
            self.lslist = ini.get_list(str, "force", "lslist", default=[])
            # time-dependent LS profiles (force.cxx swtimedep_ls): entries in
            # timedeplist_ls come from the `timedep` group and are
            # interpolated host-side each iteration (carried via sfc).
            self.swtimedep_ls = ini.get_bool("force", "swtimedep_ls", default=False)
            self.tdep_ls = {}
            if self.swtimedep_ls:
                from ..timedep import Timedep
                for n in ini.get_list(str, "force", "timedeplist_ls", default=[]):
                    self.tdep_ls[n] = Timedep(input_nc, n + "_ls", "time_ls")
            self.ls_profs = {n: (np.zeros((kt, 1, 1)) if n in self.tdep_ls
                                 else _prof(input_nc, n + "_ls", kt)[:, None, None])
                             for n in self.lslist}
        if self.swwls == "1":
            self.swwls = "mean"  # legacy alias
        if self.swwls in ("mean", "local"):
            self.swwls_mom = ini.get_bool("force", "swwls_mom", default=False)
            self.wls = _prof(input_nc, "w_ls", kt)
            if ini.get_bool("force", "swtimedep_wls", default=False):
                from ..timedep import Timedep
                self.tdep_wls = Timedep(input_nc, "w_ls", "time_ls")
        elif self.swwls != "0":
            raise ValueError("%s is an illegal value for swwls" % self.swwls)

        if self.swnudge == "1":
            self.nudgelist = ini.get_list(str, "force", "nudgelist", default=[])
            self.scalednudgelist = ini.get_list(str, "force", "scalednudgelist", default=[])
            self.nudge_fac = _prof(input_nc, "nudgefac", kt)[:, None, None]
            # Galilean offset on momentum targets (force.cxx:529-559).
            self._nudge_off = {"u": -grid.utrans, "v": -grid.vtrans}
            self.nudge_profs = {
                n: (_prof(input_nc, n + "_nudge", kt)
                    + self._nudge_off.get(n, 0.))[:, None, None]
                for n in self.nudgelist}
            if ini.get_bool("force", "swtimedep_nudge", default=False):
                from ..timedep import Timedep
                for n in ini.get_list(str, "force", "timedeplist_nudge",
                                      default=[]):
                    self.tdep_nudge[n] = Timedep(input_nc, n + "_nudge",
                                                 "time_ls")

    @property
    def has_timedep(self):
        return bool(getattr(self, "tdep_ls", None) or self.tdep_geo
                    or self.tdep_wls is not None or self.tdep_nudge)

    def update_timedep(self, sfc, itime):
        """Host-side per-iteration interpolation of the time-dependent LS /
        geo / subsidence / nudge profiles into the carried surface state
        (no recompiles).  Profiles are truncated to the model's ktot (input
        files may carry more levels than a reduced-grid run uses)."""
        if not self.has_timedep:
            return sfc
        import jax.numpy as jnp
        kt = self.grid.ktot
        sfc = dict(sfc)
        for n, td in getattr(self, "tdep_ls", {}).items():
            sfc["__ls_" + n] = jnp.asarray(td.interpolate(itime)[:kt])
        for n, td in self.tdep_geo.items():
            sfc["__geo_" + n] = jnp.asarray(td.interpolate(itime)[:kt])
        if self.tdep_wls is not None:
            sfc["__wls"] = jnp.asarray(self.tdep_wls.interpolate(itime)[:kt])
        for n, td in self.tdep_nudge.items():
            sfc["__nudge_" + n] = jnp.asarray(
                td.interpolate(itime)[:kt] + self._nudge_off.get(n, 0.))
        return sfc

    def __call__(self, ctx, s, t, aux, sfc=None):
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)

        if self.swlspres == "uflux":
            # Fix the domain-mean u flux (force.cxx flux kernels): uniform
            # correction so that mean(u + dt*ut) == uflux.  The reference
            # computes it with the current tendencies; dt enters via aux.
            dzc = ctx.dz[ks:ke][:, None, None]
            um = jnp.sum(s["u"][ks:ke] * dzc) / (ctx.itot * ctx.jtot * ctx.zsize)
            utm = jnp.sum(t["u"][ks:ke] * dzc) / (ctx.itot * ctx.jtot * ctx.zsize)
            subdt = aux["subdt"]
            fbody = (self.uflux - um - ctx.utrans) / subdt - utm
            t["u"] = t["u"].at[ks:ke].add(fbody)
        elif self.swlspres == "dpdx":
            t["u"] = t["u"].at[ks:ke].add(-self.dpdx)
        elif self.swlspres == "geo":
            fc = ctx.dtype(self.fc)
            if sfc is not None and "__geo_u" in sfc:
                ug = sfc["__geo_u"][:, None, None].astype(ctx.dtype)
                vg = sfc["__geo_v"][:, None, None].astype(ctx.dtype)
            else:
                ug = jnp.asarray(self.ug, dtype=ctx.dtype)
                vg = jnp.asarray(self.vg, dtype=ctx.dtype)
            u, v = s["u"], s["v"]
            if ctx.spatial_order == 2:
                # coriolis_2nd (force.cxx:78-140)
                v_at_u = 0.25 * (v + ip(v) + jm(v) + jm(ip(v)))[ks:ke]
                u_at_v = 0.25 * (u + im(u) + jp(u) + im(jp(u)))[ks:ke]
                t["u"] = t["u"].at[ks:ke].add(fc * (v_at_u + ctx.vtrans - vg))
                t["v"] = t["v"].at[ks:ke].add(-fc * (u_at_v + ctx.utrans - ug))
            else:
                from .. import fd
                ci0, ci1, ci2, ci3 = fd.ci0, fd.ci1, fd.ci2, fd.ci3
                vi = lambda a: (ci0 * im(a, 2) + ci1 * im(a, 1) + ci2 * a + ci3 * ip(a, 1))
                v_at_u = (ci0 * vi(jm(v, 1)) + ci1 * vi(v) + ci2 * vi(jp(v, 1)) + ci3 * vi(jp(v, 2)))[ks:ke]
                ui = lambda a: (ci0 * jm(a, 2) + ci1 * jm(a, 1) + ci2 * a + ci3 * jp(a, 1))
                u_at_v = (ci0 * ui(im(u, 1)) + ci1 * ui(u) + ci2 * ui(ip(u, 1)) + ci3 * ui(ip(u, 2)))[ks:ke]
                t["u"] = t["u"].at[ks:ke].add(fc * (v_at_u + ctx.vtrans - vg))
                t["v"] = t["v"].at[ks:ke].add(-fc * (u_at_v + ctx.utrans - ug))

        if self.swls == "1":
            for name in self.lslist:
                if sfc is not None and ("__ls_" + name) in sfc:
                    prof = sfc["__ls_" + name][:, None, None].astype(ctx.dtype)
                else:
                    prof = jnp.asarray(self.ls_profs[name], dtype=ctx.dtype)
                t[name] = t[name].at[ks:ke].add(prof)

        if self.swwls in ("mean", "local"):
            if sfc is not None and "__wls" in sfc:
                wls = sfc["__wls"][:, None, None].astype(ctx.dtype)
            else:
                wls = jnp.asarray(self.wls[:, None, None], dtype=ctx.dtype)
            names = list(ctx.scalar_names)
            if getattr(self, "swwls_mom", False):
                names += ["u", "v"]
            dzhi = ctx.dzhi
            for name in names:
                a = s[name]
                if self.swwls == "mean":
                    # advec_wls_2nd on the mean profile (force.cxx:324-335)
                    amean = jnp.mean(a, axis=(1, 2), keepdims=True)
                else:
                    amean = a
                # upwind-ish 2nd order: wls>0 uses lower difference
                ddz_dn = (amean[ks:ke] - amean[ks - 1:ke - 1]) * dzhi[ks:ke][:, None, None]
                ddz_up = (amean[ks + 1:ke + 1] - amean[ks:ke]) * dzhi[ks + 1:ke + 1][:, None, None]
                tend = jnp.where(wls > 0., -wls * ddz_dn, -wls * ddz_up)
                t[name] = t[name].at[ks:ke].add(tend)

        if self.swnudge == "1":
            fac = jnp.asarray(self.nudge_fac, dtype=ctx.dtype)
            for name in self.nudgelist:
                if sfc is not None and ("__nudge_" + name) in sfc:
                    prof = sfc["__nudge_" + name][:, None, None].astype(
                        ctx.dtype)
                else:
                    prof = jnp.asarray(self.nudge_profs[name], dtype=ctx.dtype)
                amean = jnp.mean(s[name][ks:ke], axis=(1, 2), keepdims=True)
                t[name] = t[name].at[ks:ke].add(-fac * (amean - prof))

        return t


class _NoForce:
    def __call__(self, ctx, s, t, aux, sfc=None):
        return t


def make_force(ini, grid, fields, input_nc):
    swlspres = ini.get_str("force", "swlspres", default="0")
    swls = ini.get_str("force", "swls", default="0")
    swwls = ini.get_str("force", "swwls", default="0")
    swnudge = ini.get_str("force", "swnudge", default="0")
    if swlspres in ("0", "false") and swls == "0" and swwls == "0" and swnudge == "0":
        return _NoForce()
    return Force(ini, grid, fields, input_nc)
