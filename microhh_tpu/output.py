"""Cross-sections, dumps and column output (reference ``src/cross.cxx``,
``src/dump.cxx``, ``src/column.cxx``).

Binary formats match the reference so its post-processing tools apply:
cross files ``<var>.<xz|yz|xy>.<idx>.<iotime>`` hold one raw slice; dump
files ``<var>.<iotime>`` hold the full interior field; column output is a
NetCDF time series of per-(x,y) profiles.
"""

import os

import numpy as np

from .timeloop import IFACTOR

# radiation flux cross variables (radiation_rrtmgp.cxx exec_all_stats)
_RAD_FLUX_NAMES = frozenset(
    b + sfx for b in ("lw_flux_up", "lw_flux_dn", "sw_flux_up",
                      "sw_flux_dn", "sw_flux_dn_dir")
    for sfx in ("", "_clear"))


class Cross:
    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("cross", "swcross", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("cross", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        self.crosslist = ini.get_list(str, "cross", "crosslist", default=[])
        g = model.grid
        self.model = model

        def nearest(vals, coords):
            return [int(np.abs(coords - v).argmin()) for v in vals]

        xz = ini.get_list(float, "cross", "xz", default=[])
        yz = ini.get_list(float, "cross", "yz", default=[])
        xy = ini.get_list(float, "cross", "xy", default=[])
        self.jxz = nearest(xz, g.y)
        self.jxzh = nearest(xz, g.yh)
        self.ixz = nearest(yz, g.x)
        self.ixzh = nearest(yz, g.xh)
        self.kxy = nearest(xy, g.z[g.kstart:g.kend])
        self.kxyh = nearest(xy, g.zh[g.kstart:g.kend + 1])
        # soil cross levels (cross.cxx:283,462-488): negative depths on the
        # soil grid for the LSM's t_soil/theta_soil planes
        xy_soil = ini.get_list(float, "cross", "xy_soil", default=[])
        self.kxy_soil = []
        if xy_soil:
            sg = getattr(model, "soil_grid", None)
            if sg is None:
                raise ValueError("[cross] xy_soil requires the land surface")
            self.kxy_soil = nearest(xy_soil, sg.z)

    def do_cross(self, itime):
        return self.sw and itime % self.isampletime == 0

    def _plane(self, data, name, iotime):
        """2-D xy plane, reference cross_plane naming <name>.xy.<iotime>
        (cross.cxx:639-652); written in the model precision."""
        fname = "%s.xy.%07d" % (name, iotime)
        np.asarray(data).astype(self.model.dtype).tofile(
            os.path.join(self.model.workdir, fname))

    def exec(self, s, aux, iotime, sfc=None):
        if not self.sw:
            return
        m = self.model
        g = m.grid
        ks, ke = g.kstart, g.kend

        def _interior(data):
            full = np.zeros((g.kcells, g.jtot, g.itot))
            full[ks:ke] = np.asarray(data)
            return full

        def field_of(base):
            """Prognostics plus the reference's diagnostic cross variables
            (thermo_moist.cxx:1860-1866: b, ql, qi, qlqi, qsat, T)."""
            if base in s:
                return np.asarray(s[base])
            if base == "p" and aux is not None and "p" in aux:
                return np.asarray(aux["p"])
            th = m.thermo
            if base == "ql" and hasattr(th, "get_ql"):
                return _interior(th.get_ql(m.ctx, s))
            if base in ("qi", "qlqi") and hasattr(th, "get_ql_qi"):
                ql, qi = th.get_ql_qi(m.ctx, s)
                return _interior(qi if base == "qi" else ql + qi)
            if base == "b" and hasattr(th, "get_buoyancy"):
                b = np.asarray(th.get_buoyancy(m.ctx, s))
                return b if b.shape[0] == g.kcells else _interior(b[ks:ke])
            if base in ("T", "qsat") and hasattr(th, "get_ql_qi"):
                from .ops.thermo_moist import sat_adjust
                pref_a, exnref_a, _, _ = th._p_profiles(m.ctx, None)
                pz = np.asarray(pref_a)[ks:ke][:, None, None]
                exn = np.asarray(exnref_a)[ks:ke][:, None, None]
                _, _, T, qs = sat_adjust(np.asarray(s["thl"])[ks:ke],
                                         np.asarray(s["qt"])[ks:ke], pz, exn)
                return _interior(T if base == "T" else qs)
            return None

        soil_kt = getattr(m.fields, "soil_ktot", 0)
        rad_cache = {}
        for name in self.crosslist:
            # radiation flux crosses: full 3-D half-level fields computed
            # on demand, once per clear/all-sky set (radiation_rrtmgp.cxx
            # exec_all_stats save_stats_and_cross)
            if name in _RAD_FLUX_NAMES:
                rad = getattr(m, "radiation", None)
                if rad is None or not hasattr(rad, "flux_fields"):
                    continue
                clear = name.endswith("_clear")
                if clear not in rad_cache:
                    rad_cache[clear] = {
                        k2: np.asarray(v) for k2, v in rad.flux_fields(
                            m.ctx, s, m.timeloop.time, m.thermo,
                            clear=clear).items()}
                fld = rad_cache[clear].get(name)
                if fld is not None:
                    self._slices(fld, name, (0, 0, 1), 0., iotime,
                                 interior=True)
                continue
            # gcss radiative flux crosses: full-level fields
            # (radiation_gcss.cxx get_radiation_field / create_cross)
            if name in ("sflx", "lflx"):
                rad = getattr(m, "radiation", None)
                if getattr(rad, "sw", None) != "gcss":
                    continue
                if "gcss" not in rad_cache:
                    rad_cache["gcss"] = {
                        k2: np.asarray(v) for k2, v in rad.flux_fields(
                            m.ctx, s, m.timeloop.time, m.thermo).items()}
                self._slices(rad_cache["gcss"][name], name, (0, 0, 0), 0.,
                             iotime, interior=True)
                continue
            # the filtered surface diffuse SW plane (radiation_rrtmgp.cxx
            # :1686-1689); rides sfc/aux from the last radiation update
            if name == "sw_flux_dn_diff_filtered":
                rad = getattr(m, "radiation", None)
                if not getattr(rad, "sw_diffuse_filter", False):
                    continue
                src = None
                if aux is not None and "sw_flux_dn_dif_sfc" in aux:
                    src = aux["sw_flux_dn_dif_sfc"]
                elif sfc is not None and "rad_sw_flux_dn_dif" in sfc:
                    src = sfc["rad_sw_flux_dn_dif"]
                if src is not None:
                    self._plane(src, name, iotime)
                continue
            # w at the first half level above 500 hPa
            # (thermo_moist.cxx:299 calc_w500hpa)
            if name == "w500hpa":
                th = m.thermo
                if not hasattr(th, "_p_profiles"):
                    continue
                _, _, prefh_a, _ = th._p_profiles(m.ctx, aux)
                ph = np.asarray(prefh_a)
                above = np.nonzero(ph[ks:ke + 1] <= 5.e4)[0]
                if above.size == 0 or above[0] in (0, ke - ks):
                    raise RuntimeError(
                        "w500hpa: no 500 hPa level inside the domain")
                self._plane(np.asarray(s["w"])[ks + above[0]], name, iotime)
                continue
            # soil fields: xy planes at the xy_soil levels
            # (<name>.xy.<k>.<iotime>, cross.cxx cross_soil); soil
            # prognostics are ghost-free (soil_ktot, jtot, itot) arrays
            soil_src = None
            if soil_kt:
                if name in s and getattr(s[name], "ndim", 0) == 3 \
                        and s[name].shape[0] == soil_kt:
                    soil_src = s[name]
                elif (sfc is not None and name in sfc
                      and getattr(sfc[name], "ndim", 0) == 3
                      and sfc[name].shape[0] == soil_kt):
                    soil_src = sfc[name]
            if soil_src is not None:
                for k in self.kxy_soil:
                    fname = "%s.xy.%05d.%07d" % (name, k, iotime)
                    np.asarray(soil_src[k]).astype(m.dtype).tofile(
                        os.path.join(m.workdir, fname))
                continue
            # 2-D planes: surface-state entries (<s>bot/<s>fluxbot, ustar,
            # obuk, z0m, rr_bot ...) and micro/LSM aux planes.
            if sfc is not None:
                key = None
                if name.endswith("bot") and not name.endswith("fluxbot") \
                        and (name[:-3] + "_bot") in sfc:
                    key = name[:-3] + "_bot"
                elif name.endswith("fluxbot") and (name[:-7] + "_fluxbot") in sfc:
                    key = name[:-7] + "_fluxbot"
                elif name in sfc:
                    key = name
                if key is not None:
                    self._plane(sfc[key], name, iotime)
                    continue
            if aux is not None and name in aux:
                self._plane(aux[name], name, iotime)
                continue
            # cloud base/top height maps (cross_height semantics; NaN
            # where the column is cloud-free)
            if name in ("qlbase", "qltop", "qlqibase", "qlqitop"):
                fld = "ql" if name in ("qlbase", "qltop") else "qlqi"
                q = field_of(fld)
                if q is None:
                    continue
                cloudy = q[ks:ke] > 0.
                zc = np.asarray(g.z)[ks:ke]
                kidx = np.arange(cloudy.shape[0])[:, None, None]
                anyc = cloudy.any(axis=0)
                if name.endswith("base"):
                    kk = np.where(cloudy, kidx, cloudy.shape[0]).min(axis=0)
                else:
                    kk = np.where(cloudy, kidx, -1).max(axis=0)
                h = np.where(anyc, zc[np.clip(kk, 0, len(zc) - 1)], np.nan)
                self._plane(h, name, iotime)
                continue
            # <s>path: density-weighted vertical integral (cross_path)
            if name.endswith("path"):
                base = field_of(name[:-4])
                if base is None:
                    continue
                rho = np.asarray(m.fields.rhoref)[ks:ke][:, None, None]
                dz = np.asarray(g.dz)[ks:ke][:, None, None]
                self._plane((rho * dz * base[ks:ke]).sum(axis=0), name, iotime)
                continue
            # <s>lngrad: log gradient magnitude (calc_lngrad_2nd)
            if name.endswith("lngrad"):
                base = field_of(name[:-6])
                if base is None:
                    continue
                a = base
                gx = 0.5 * (np.roll(a, -1, -1) - np.roll(a, 1, -1)) * g.dxi
                gy = 0.5 * (np.roll(a, -1, -2) - np.roll(a, 1, -2)) * g.dyi
                dzi = np.asarray(g.dzi)[:, None, None]
                gz = np.zeros_like(a)
                gz[ks:ke] = 0.5 * (a[ks + 1:ke + 1] - a[ks - 1:ke - 1]) * dzi[ks:ke]
                data = np.log(1e-30 + gx ** 2 + gy ** 2 + gz ** 2).astype(
                    self.model.dtype)
                self._slices(data, name, (0, 0, 0), 0., iotime)
                continue
            data = field_of(name)
            if data is None:
                continue
            loc = m.fields.mp[name].loc if name in m.fields.mp else (0, 0, 0)
            offset = g.utrans if name == "u" else (g.vtrans if name == "v" else 0.)
            self._slices(data, name, loc, offset, iotime)

    def _slices(self, data, name, loc, offset, iotime, interior=False):
        """``interior=True`` for ghost-free arrays (radiation fluxes)."""
        m = self.model
        g = m.grid
        ks, ke = g.kstart, g.kend
        if interior:
            interior = data + offset
        else:
            interior = data[ks:ke + (1 if loc[2] else 0)] + offset

        jlist = self.jxzh if loc[1] else self.jxz
        for j in jlist:
            fname = "%s.xz.%05d.%07d" % (name, j, iotime)
            interior[:, j, :].astype(data.dtype).tofile(
                os.path.join(m.workdir, fname))
        ilist = self.ixzh if loc[0] else self.ixz
        for i in ilist:
            fname = "%s.yz.%05d.%07d" % (name, i, iotime)
            interior[:, :, i].astype(data.dtype).tofile(
                os.path.join(m.workdir, fname))
        klist = self.kxyh if loc[2] else self.kxy
        for k in klist:
            fname = "%s.xy.%05d.%07d" % (name, k, iotime)
            interior[k, :, :].astype(data.dtype).tofile(
                os.path.join(m.workdir, fname))


class Dump:
    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("dump", "swdump", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("dump", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        self.dumplist = ini.get_list(str, "dump", "dumplist", default=[])
        self.model = model

    def do_dump(self, itime):
        return self.sw and itime % self.isampletime == 0

    def exec(self, s, aux, iotime):
        if not self.sw:
            return
        m = self.model
        g = m.grid
        for name in self.dumplist:
            if name in s:
                data = np.asarray(s[name])
            elif name == "p" and aux is not None and "p" in aux:
                data = np.asarray(aux["p"])
            else:
                continue
            fname = os.path.join(m.workdir, "%s.%07d" % (name, iotime))
            data[g.kstart:g.kend].tofile(fname)


class Column:
    """Single-column profile time series (reference ``src/column.cxx``)."""

    @staticmethod
    def consume_options(ini):
        """Option reads only (init mode; see Stats.consume_options)."""
        if ini.get_str("column", "swcolumn", default="0") in ("0", "false"):
            return
        ini.get_float("column", "sampletime")
        ini.get_list(float, "column", "coordinates", subitem="x", default=[])
        ini.get_list(float, "column", "coordinates", subitem="y", default=[])

    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("column", "swcolumn", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("column", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        cx = ini.get_list(float, "column", "coordinates", subitem="x", default=[])
        cy = ini.get_list(float, "column", "coordinates", subitem="y", default=[])
        g = model.grid
        self.cols = [(int(np.abs(g.x - x).argmin()), int(np.abs(g.y - y).argmin()))
                     for x, y in zip(cx, cy)]
        self.model = model

        from .utils import nc
        tl = model.timeloop
        path = os.path.join(model.workdir, "%s.column.%07d.nc"
                            % (model.casename or "run", tl.iotime))
        f = nc.Dataset(path, "w")
        f.createDimension("z", g.ktot)
        f.createDimension("zh", g.ktot + 1)
        f.createDimension("col", max(len(self.cols), 1))
        f.createDimension("time", None)
        f.createVariable("z", "f8", ("z",))[:] = g.z[g.kstart:g.kend]
        f.createVariable("zh", "f8", ("zh",))[:] = g.zh[g.kstart:g.kend + 1]
        self.v_time = f.createVariable("time", "f8", ("time",))
        self.vars = {}
        for name in model.fields.prognostic_names:
            zdim = "zh" if name == "w" else "z"
            self.vars[name] = f.createVariable(name, "f8", ("time", "col", zdim))
        # LSM surface time series at the column points, optionally per tile
        # (swtilestats_column, boundary_surface_lsm.cxx:270,1640-1668)
        self.series = []
        if getattr(model.boundary, "is_lsm", False):
            self.series = ["H", "LE", "G", "obuk", "ustar"]
            if ini.get_bool("land_surface", "swtilestats_column",
                            default=False):
                for tile in ("veg", "soil", "wet"):
                    self.series += ["%s_%s" % (p, tile) for p in
                                    ("c", "obuk", "thl_bot", "qt_bot",
                                     "H", "LE", "G")]
        self.svars = {n: f.createVariable(n, "f8", ("time", "col"))
                      for n in self.series}
        # radiation flux profiles at the column points
        # (radiation_rrtmgp.cxx exec_all_stats calls column.calc_column
        # for every enabled flux field)
        rad = getattr(model, "radiation", None)
        self.rad_names = []
        rad_dim = "zh"
        if getattr(rad, "sw", None) == "rrtmgp":
            for sfx in [""] + (["_clear"] if rad.sw_clear_sky_stats else []):
                if rad.sw_longwave:
                    self.rad_names += ["lw_flux_up" + sfx, "lw_flux_dn" + sfx]
                if rad.sw_shortwave:
                    self.rad_names += ["sw_flux_up" + sfx, "sw_flux_dn" + sfx,
                                       "sw_flux_dn_dir" + sfx]
        elif getattr(rad, "sw", None) == "gcss":
            # radiation_gcss.cxx:457-458 (full-level fluxes)
            self.rad_names = ["sflx", "lflx"]
            rad_dim = "z"
        self.rad_vars = {n: f.createVariable(n, "f8", ("time", "col", rad_dim))
                         for n in self.rad_names}
        self.file = f
        self._idx = 0

    def do_column(self, itime):
        return self.sw and itime % self.isampletime == 0

    def exec(self, s, time, sfc=None):
        if not self.sw or not self.cols:
            return
        m = self.model
        g = m.grid
        ks, ke = g.kstart, g.kend
        i = self._idx
        self.v_time[i] = time
        if sfc is not None:
            for name in self.series:
                if name in sfc:
                    plane = np.asarray(sfc[name])
                    for c, (ix, jy) in enumerate(self.cols):
                        self.svars[name][i, c] = plane[jy, ix]
        for name, var in self.vars.items():
            data = np.asarray(s[name])
            hi = ke + 1 if name == "w" else ke
            for c, (ix, jy) in enumerate(self.cols):
                var[i, c] = data[ks:hi, jy, ix]
        if self.rad_names:
            rad = m.radiation
            ff = {k: np.asarray(v) for k, v in rad.flux_fields(
                m.ctx, s, time, m.thermo).items()}
            if getattr(rad, "sw_clear_sky_stats", False):
                ff.update({k: np.asarray(v) for k, v in rad.flux_fields(
                    m.ctx, s, time, m.thermo, clear=True).items()})
            for name in self.rad_names:
                if name not in ff:
                    continue
                for c, (ix, jy) in enumerate(self.cols):
                    self.rad_vars[name][i, c] = ff[name][:, jy, ix]
        self._idx += 1
        self.file.sync()

    def close(self):
        if self.sw:
            self.file.close()
