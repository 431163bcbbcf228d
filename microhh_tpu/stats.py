"""Statistics engine: horizontally-averaged profiles and time series to
NetCDF (reference ``src/stats.cxx``).

Output layout mirrors the reference: one file ``<sim>.<mask>.<starttime>.nc``
per mask with dims z/zh/time, variables ``time``/``iter`` at root, profile
variables inside per-component groups ("default", "thermo", ...), and
``area``/``areah`` mask-fraction profiles (stats.cxx:627-694).

Round-1 scope: the unconditional "default" mask; profile operations mean /
moments 2-4 / resolved w-flux / gradient / diffusive flux / total flux
(stats.cxx:865-905 suffix semantics); surface time series (ustar, obuk,
*_bot); boundary-layer depth zi.  All reductions run on device in one jitted
pass, then one small host transfer writes the NetCDF row.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from .timeloop import IFACTOR
from .ops.stencil import i2, im, ip, jm, jp


class Stats:
    @staticmethod
    def consume_options(ini):
        """Read the [stats]/[budget] options without building the writer.
        The reference constructs Stats in every sim mode (its ctor does the
        option reads); init mode calls this so the same options are
        consumed and never flagged as unused."""
        ini.flag_as_used("stats", "swstats")
        if not ini.get_int("stats", "swstats", default=0):
            return
        ini.get_float("stats", "sampletime")
        ini.get_bool("stats", "swtendency", default=False)
        ini.get_list(str, "stats", "whitelist", default=[])
        ini.get_list(str, "stats", "blacklist", default=[])
        ini.get_list(str, "stats", "masklist", default=[])
        ini.get_list(str, "stats", "xymasklist", default=[])
        ini.get_str("budget", "swbudget", default="0")

    def __init__(self, model):
        ini = model.ini
        self.model = model
        self.sampletime = ini.get_float("stats", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        ini.flag_as_used("stats", "swstats")
        self.swtendency = ini.get_bool("stats", "swtendency", default=False)

        g = model.grid
        tl = model.timeloop
        from .utils import nc
        fname = os.path.join(model.workdir, "%s.default.%07d.nc"
                             % (model.casename or "run", tl.iotime))
        f = nc.Dataset(fname, "w")
        f.createDimension("z", g.ktot)
        f.createDimension("zh", g.ktot + 1)
        f.createDimension("time", None)
        vz = f.createVariable("z", "f8", ("z",))
        vz[:] = g.z[g.kstart:g.kend]
        vzh = f.createVariable("zh", "f8", ("zh",))
        vzh[:] = g.zh[g.kstart:g.kend + 1]
        self.v_time = f.createVariable("time", "f8", ("time",))
        self.v_iter = f.createVariable("iter", "i4", ("time",))

        self.file = f
        self.groups = {}
        self.vars = {}
        self._idx = 0
        self._diag = None
        self._tend_diag = None
        self._rad_diag = None

        self._whitelist = ini.get_list(str, "stats", "whitelist", default=[])
        self._blacklist = ini.get_list(str, "stats", "blacklist", default=[])

        from .budget import Budget
        self.budget = Budget(model)
        self._register(model)
        self.budget.register(self)

        masklist = ini.get_list(str, "stats", "masklist", default=[])
        # user-supplied surface (XY) masks: names whose <name>.0000000
        # binary holds a (jtot, itot) plane, applied at every level
        # (stats.cxx:554-555, fields.cxx:326-327,607-628,1147-1162)
        xymasklist = ini.get_list(str, "stats", "xymasklist", default=[])
        masklist = masklist + xymasklist
        self.maskstats = (MaskStats(model, masklist, xymasklist)
                          if masklist else None)

    def _group(self, name):
        if name not in self.groups:
            self.groups[name] = self.file.createGroup(name)
        return self.groups[name]

    def _allowed(self, name):
        """[stats] whitelist/blacklist regex filters (stats.cxx:558,
        include/stats.h:90,178-185): whitelist (if set) must match; any
        blacklist match drops the variable."""
        import re
        if self._whitelist and not any(re.fullmatch(w, name)
                                       for w in self._whitelist):
            return False
        if any(re.fullmatch(b, name) for b in self._blacklist):
            return False
        return True

    def add_prof(self, name, longname, unit, zdim, group="default"):
        if not self._allowed(name):
            return
        g = self._group(group)
        v = g.createVariable(name, "f8", ("time", zdim))
        v.setncattr("units", unit)
        v.setncattr("long_name", longname)
        self.vars[name] = v

    def add_time_series(self, name, longname, unit, group="default"):
        if not self._allowed(name):
            return
        g = self._group(group)
        v = g.createVariable(name, "f8", ("time",))
        v.setncattr("units", unit)
        v.setncattr("long_name", longname)
        self.vars[name] = v

    def _register(self, model):
        fields = model.fields
        names = [n for n in fields.prognostic_names if n != "w"]
        for name in names:
            zdim = "z"
            self.add_prof(name, name, "-", zdim)
            for mom in ("2", "3", "4"):
                self.add_prof(name + "_" + mom, "moment %s of %s" % (mom, name), "-", zdim)
            self.add_prof(name + "_w", "Resolved flux of %s" % name, "-", "zh")
            self.add_prof(name + "_grad", "Gradient of %s" % name, "-", "zh")
            self.add_prof(name + "_diff", "Diffusive flux of %s" % name, "-", "zh")
            self.add_prof(name + "_flux", "Total flux of %s" % name, "-", "zh")
        self.add_prof("w", "w", "m s-1", "zh")
        for mom in ("2", "3", "4"):
            self.add_prof("w_" + mom, "moment %s of w" % mom, "-", "zh")
        self.add_prof("p", "Pressure", "Pa", "z")
        if getattr(model.diff, "cs", None) is not None:
            self.add_prof("evisc", "Eddy viscosity", "m2 s-1", "z")
        self.add_prof("area", "Fractional area contained in mask", "-", "z")
        self.add_prof("areah", "Fractional area contained in mask", "-", "zh")
        if getattr(model.boundary, "is_surface", False):
            self.add_time_series("ustar", "Surface friction velocity", "m s-1")
            self.add_time_series("obuk", "Obukhov length", "m")
        if getattr(model.boundary, "sw_charnock", False):
            self.add_time_series("z0m", "Roughness length momentum", "m")
            self.add_time_series("z0h", "Roughness length heat", "m")
        if getattr(model.boundary, "is_lsm", False):
            for name, ln, unit in (("H", "Sensible heat flux", "W m-2"),
                                   ("LE", "Latent heat flux", "W m-2"),
                                   ("G", "Soil heat flux", "W m-2"),
                                   ("wl", "Liquid water reservoir", "m")):
                self.add_time_series(name, ln, unit, "land_surface")
            if getattr(model.boundary, "sw_tile_stats", False):
                for tile in ("veg", "soil", "wet"):
                    for pre, unit in (("H", "W m-2"), ("LE", "W m-2"),
                                      ("G", "W m-2"), ("c", "-")):
                        self.add_time_series("%s_%s" % (pre, tile),
                                             "%s of %s tile" % (pre, tile),
                                             unit, "land_surface_tiles")
        for name, ln in (("rr", "Mean surface rain rate"),
                         ("rs", "Mean surface snow rate"),
                         ("rg", "Mean surface graupel rate")):
            if getattr(model.micro, "sw", None) == "nsw6" or \
               (name == "rr" and getattr(model.micro, "sw", None) == "2mom_warm"):
                self.add_time_series(name, ln, "kg m-2 s-1", "thermo")
        for name in fields.sp:
            self.add_time_series(name + "_bot", "Surface " + name, "-")
        if getattr(model.thermo, "scalars", ()):
            self.add_time_series("zi", "Boundary Layer Depth", "m", "thermo")
        # cloud diagnostics (thermo_moist.cxx:1791-1805 registers ql/qi/qlqi
        # with {"mean", "frac", "path", "cover"})
        if hasattr(model.thermo, "get_ql_qi"):
            # moist diagnostic profiles (thermo_moist.cxx:1777-1819)
            self.add_prof("thv", "Virtual potential temperature", "K",
                          "z", "thermo")
            self.add_prof("thv_2", "Variance of thv", "K2", "z", "thermo")
            self.add_prof("T", "Absolute temperature", "K", "z", "thermo")
            self.add_prof("T_2", "Variance of T", "K2", "z", "thermo")
            self.add_prof("rh", "Relative humidity", "-", "z", "thermo")
            self.add_prof("qsat", "Saturation specific humidity", "kg kg-1",
                          "z", "thermo")
        if hasattr(model.thermo, "get_ql"):
            bases = ["ql"]
            if hasattr(model.thermo, "get_ql_qi"):
                bases += ["qi", "qlqi"]
            for base in bases:
                self.add_prof(base, "%s mixing ratio" % base, "kg kg-1",
                              "z", "thermo")
                self.add_prof(base + "_frac", "%s cloud fraction" % base,
                              "-", "z", "thermo")
                self.add_time_series(base + "_path", "%s water path" % base,
                                     "kg m-2", "thermo")
                self.add_time_series(base + "_cover", "%s projected cover" % base,
                                     "-", "thermo")
        # radiation flux profiles (+ clear-sky companions, swclearskystats;
        # radiation_rrtmgp.cxx:620-642)
        rad = model.radiation
        if getattr(rad, "sw", None) == "rrtmgp":
            sfxs = [""] + (["_clear"] if rad.sw_clear_sky_stats else [])
            for sfx in sfxs:
                if rad.sw_longwave:
                    for d in ("up", "dn"):
                        self.add_prof("lw_flux_%s%s" % (d, sfx),
                                      "Longwave %swelling flux" % d,
                                      "W m-2", "zh", "radiation")
                if rad.sw_shortwave:
                    for d in ("up", "dn", "dn_dir"):
                        self.add_prof("sw_flux_%s%s" % (d, sfx),
                                      "Shortwave %s flux" % d,
                                      "W m-2", "zh", "radiation")
            if rad.sw_shortwave:
                # exec_all_stats tail (radiation_rrtmgp.cxx:1690-1692)
                self.add_time_series("sza", "Solar zenith angle", "rad",
                                     "radiation")
                self.add_time_series("sw_flux_dn_toa",
                                     "Shortwave downwelling TOA flux",
                                     "W m-2", "radiation")
        elif getattr(rad, "sw", None) == "gcss":
            # radiation_gcss.cxx:445-446
            self.add_prof("sflx", "Total shortwave radiative flux",
                          "W m-2", "z", "radiation")
            self.add_prof("lflx", "Total longwave radiative flux",
                          "W m-2", "z", "radiation")

        if self.swtendency:
            for fld in fields.prognostic_names:
                zdim = "zh" if fld == "w" else "z"
                for op in TEND_OPS:
                    name = "%s_%s" % (fld, op)
                    self.add_prof(name, "%s tendency of %s" % (op, fld),
                                  "-", "z", group="tend")

    # ------------------------------------------------------------------
    def _build_diag(self, model):
        ctx = model.ctx
        ks, ke = ctx.ks, ctx.ke
        fields = model.fields
        is_surface = getattr(model.boundary, "is_surface", False)
        has_smag = getattr(model.diff, "cs", None) is not None

        def hmean(a):
            return jnp.mean(a, axis=(1, 2))

        def diag(s, t, sfc, p):
            out = {}
            s = model.boundary.set_ghost_cells(ctx, s, sfc)
            aux = model.diff.exec_viscosity(ctx, s, sfc, {})

            scalars = [n for n in fields.prognostic_names if n != "w"]
            w = s["w"]
            for name in scalars:
                a = s[name]
                amean_full = jnp.mean(a, axis=(1, 2), keepdims=True)
                out[name] = hmean(a[ks:ke])
                for mom in (2, 3, 4):
                    out["%s_%d" % (name, mom)] = hmean(((a - amean_full) ** mom)[ks:ke])
                # resolved flux at half levels ks..ke
                if name == "u":
                    wloc = i2(im(w), w)
                elif name == "v":
                    wloc = i2(jm(w), w)
                else:
                    wloc = w
                flux = jnp.zeros(ke - ks + 1, dtype=ctx.dtype)
                res = hmean(wloc[ks + 1:ke] * i2(a[ks:ke - 1], a[ks + 1:ke]))
                flux = flux.at[1:-1].set(res)
                out[name + "_w"] = flux
                # gradient at half levels
                grad = jnp.zeros(ke - ks + 1, dtype=ctx.dtype)
                gin = hmean((a[ks + 1:ke] - a[ks:ke - 1])) * ctx.dzhi[ks + 1:ke]
                grad = grad.at[1:-1].set(gin)
                grad = grad.at[0].set(jnp.mean(a[ks] - a[ks - 1]) * ctx.dzhi[ks])
                grad = grad.at[-1].set(jnp.mean(a[ke] - a[ke - 1]) * ctx.dzhi[ke])
                out[name + "_grad"] = grad
                # diffusive flux
                dflux = jnp.zeros(ke - ks + 1, dtype=ctx.dtype)
                if has_smag:
                    evisc = aux["evisc"]
                    tPr = model.diff.tPr
                    if name in ("u", "v"):
                        evh = 0.25 * ((im(evisc) if name == "u" else jm(evisc))[ks + 1:ke]
                                      + evisc[ks + 1:ke]
                                      + (im(evisc) if name == "u" else jm(evisc))[ks:ke - 1]
                                      + evisc[ks:ke - 1]) + fields.visc
                    else:
                        evh = 0.5 * (evisc[ks + 1:ke] + evisc[ks:ke - 1]) / tPr + model.diff.viscs.get(name, fields.visc)
                    din = -hmean(evh * (a[ks + 1:ke] - a[ks:ke - 1])) * ctx.dzhi[ks + 1:ke]
                else:
                    visc = fields.visc if name in ("u", "v") else getattr(model.diff, "viscs", {}).get(name, fields.visc)
                    din = -visc * hmean(a[ks + 1:ke] - a[ks:ke - 1]) * ctx.dzhi[ks + 1:ke]
                dflux = dflux.at[1:-1].set(din)
                if is_surface:
                    dflux = dflux.at[0].set(jnp.mean(sfc[name + "_fluxbot"]) if name + "_fluxbot" in sfc else 0.)
                out[name + "_diff"] = dflux
                out[name + "_flux"] = out[name + "_w"] + dflux

            out["w"] = hmean(w[ks:ke + 1])
            wmean_full = jnp.mean(w, axis=(1, 2), keepdims=True)
            for mom in (2, 3, 4):
                out["w_%d" % mom] = hmean(((w - wmean_full) ** mom)[ks:ke + 1])

            if has_smag:
                out["evisc"] = hmean(aux["evisc"][ks:ke])
            out["area"] = jnp.ones(ke - ks, dtype=ctx.dtype)
            out["areah"] = jnp.ones(ke - ks + 1, dtype=ctx.dtype)

            if is_surface:
                out["ustar"] = jnp.mean(sfc["ustar"])
                out["obuk"] = jnp.mean(sfc["obuk"])
                for name in fields.sp:
                    out[name + "_bot"] = jnp.mean(sfc[name + "_bot"])
                if getattr(model.boundary, "sw_charnock", False):
                    out["z0m"] = jnp.mean(sfc["z0m"])
                    out["z0h"] = jnp.mean(sfc["z0h"])
                if getattr(model.boundary, "is_lsm", False):
                    for key in ("H", "LE", "G"):
                        out[key] = jnp.mean(sfc[key])
                    out["wl"] = jnp.mean(s["wl"])
                    if getattr(model.boundary, "sw_tile_stats", False):
                        for tile in ("veg", "soil", "wet"):
                            for pre in ("H", "LE", "G", "c"):
                                key = "%s_%s" % (pre, tile)
                                out[key] = jnp.mean(sfc[key])
            micro_sw = getattr(model.micro, "sw", None)
            if micro_sw in ("2mom_warm", "nsw6"):
                keys = ("rr",) if micro_sw == "2mom_warm" else ("rr", "rs", "rg")
                for key in keys:
                    out[key] = jnp.mean(aux.get(key + "_bot",
                                                jnp.zeros((), ctx.dtype)))
            else:
                for name in fields.sp:
                    out[name + "_bot"] = jnp.zeros((), dtype=ctx.dtype)

            # zi: height of the max gradient of the first thermo scalar
            # (thermo_dry.cxx calc_zi)
            tsc = getattr(model.thermo, "scalars", ())
            if tsc:
                prof = hmean(s[tsc[0]][ks:ke])
                grad = prof[1:] - prof[:-1]
                kinv = jnp.argmax(grad) + 1
                z_int = ctx.z[ks:ke]
                out["zi"] = z_int[kinv]

            # cloud water diagnostics: mean/frac profiles + path/cover series
            if hasattr(model.thermo, "get_ql"):
                rho = ctx.rhoref[ks:ke][:, None, None]
                dzc = ctx.dz[ks:ke][:, None, None]

                def cloud(base, q):
                    out[base] = hmean(q)
                    out[base + "_frac"] = jnp.mean((q > 0.).astype(ctx.dtype),
                                                   axis=(1, 2))
                    out[base + "_path"] = jnp.mean(jnp.sum(rho * q * dzc, axis=0))
                    out[base + "_cover"] = jnp.mean(
                        jnp.any(q > 0., axis=0).astype(ctx.dtype))

                if hasattr(model.thermo, "get_ql_qi"):
                    from .ops.thermo_moist import (sat_adjust, qsat,
                                                   virtual_temperature)
                    th = model.thermo
                    pref_a, exnref_a, _, _ = th._p_profiles(ctx, None)
                    pz = pref_a[ks:ke][:, None, None]
                    exn = exnref_a[ks:ke][:, None, None]
                    ql, qi, T, qs = sat_adjust(s["thl"][ks:ke],
                                               s["qt"][ks:ke], pz, exn)
                    cloud("ql", ql)
                    cloud("qi", qi)
                    cloud("qlqi", ql + qi)
                    thv = virtual_temperature(exn, s["thl"][ks:ke],
                                              s["qt"][ks:ke], ql, qi)
                    for nm, fld in (("thv", thv), ("T", T)):
                        mean = jnp.mean(fld, axis=(1, 2), keepdims=True)
                        out[nm] = mean[:, 0, 0]
                        out[nm + "_2"] = hmean((fld - mean) ** 2)
                    out["rh"] = hmean(jnp.minimum(1., s["qt"][ks:ke] / qs))
                    out["qsat"] = hmean(qs)
                else:
                    cloud("ql", model.thermo.get_ql(ctx, s))

            if self.budget.sw:
                aux_b = {"p": p} if p is not None else None
                out.update(self.budget.profiles(ctx, s, aux_b))
            return out

        return jax.jit(diag)

    # ------------------------------------------------------------------
    def do_statistics(self, itime):
        return itime % self.isampletime == 0

    def maybe_exec(self, model, s, t, sfc):
        tl = model.timeloop
        if not self.do_statistics(tl.itime):
            return
        if self._diag is None:
            self._diag = self._build_diag(model)
        aux = getattr(model, "_last_aux", None)
        p = aux.get("p") if aux else None
        out = {k: np.asarray(v) for k, v in self._diag(s, t, sfc, p).items()}
        if self.swtendency:
            if self._tend_diag is None:
                self._tend_diag = build_tendency_diag(model)
            tl_ = model.timeloop
            tvals = self._tend_diag(
                s, t, sfc, model.pres_params,
                jnp.asarray(tl_.dt, dtype=model.dtype),
                jnp.asarray(tl_.time, dtype=model.dtype))
            out.update({k: np.asarray(v) for k, v in tvals.items()})
        rad = model.radiation
        if getattr(rad, "sw", None) == "rrtmgp" and (rad.sw_longwave
                                                     or rad.sw_shortwave):
            if self._rad_diag is None:
                def rad_diag(s_, time_):
                    r = rad.flux_profiles(model.ctx, s_, time_, model.thermo)
                    if rad.sw_clear_sky_stats:
                        r.update(rad.flux_profiles(model.ctx, s_, time_,
                                                   model.thermo, clear=True))
                    return r
                self._rad_diag = jax.jit(rad_diag)
            rvals = self._rad_diag(s, jnp.asarray(tl.time, model.dtype))
            out.update({k: np.asarray(v) for k, v in rvals.items()})
            if rad.sw_shortwave:
                sza, toa = rad.solar_series(model.ctx, tl.time)
                out["sza"] = np.asarray(sza)
                out["sw_flux_dn_toa"] = np.asarray(toa)
        elif getattr(rad, "sw", None) == "gcss":
            if self._rad_diag is None:
                self._rad_diag = jax.jit(
                    lambda s_, time_: rad.flux_profiles(
                        model.ctx, s_, time_, model.thermo))
            rvals = self._rad_diag(s, jnp.asarray(tl.time, model.dtype))
            out.update({k: np.asarray(v) for k, v in rvals.items()})
        i = self._idx
        self.v_time[i] = tl.time
        self.v_iter[i] = tl.iteration
        for name, v in out.items():
            if name in self.vars:
                self.vars[name][i] = v
        if self.maskstats is not None:
            self.maskstats.exec(s, sfc, tl.time)
        self._idx += 1
        self.file.sync()

    def close(self):
        self.file.close()
        if self.maskstats is not None:
            self.maskstats.close()


def build_tendency_diag(model):
    """Per-op tendency profiles (the reference threads stats.calc_tend
    through every op's exec, stats.h:160).  Replays the op sequence of one
    RK substep on the given state and records the horizontal-mean tendency
    added by each op into the 'tend' group."""
    ctx = model.ctx
    ks, ke = ctx.ks, ctx.ke
    names = model.fields.prognostic_names
    is_surface = getattr(model.boundary, "is_surface", False)

    def hprof(a):
        return jnp.mean(a, axis=(1, 2))

    def diag(s, t0, sfc, pp, dt, time_s):
        out = {}
        t = {n: jnp.zeros_like(s[n]) for n in names}
        s = model.boundary.set_ghost_cells(ctx, s, sfc)
        aux = model.diff.exec_viscosity(ctx, s, sfc, {})
        aux["subdt"] = dt

        def record(op, t_new, t_old):
            for n in names:
                out["%s_%s" % (n, op)] = hprof((t_new[n] - t_old[n])[ks:ke])
            return t_new

        t = record("thermo", model.thermo.exec(ctx, s, dict(t), aux), t)
        t2, aux = model.micro.exec(ctx, s, dict(t), aux, dt)
        t = record("micro", t2, t)
        t_rad, _sfc_rad = model.radiation.exec(ctx, s, dict(t), sfc, aux,
                                               time_s, model.thermo)
        t = record("rad", t_rad, t)
        t = record("advec", model.advec.exec(ctx, s, dict(t), aux), t)
        t = record("diff", model.diff.exec(ctx, s, dict(t), aux, sfc), t)
        t = record("buffer", model.buffer(ctx, s, dict(t), aux), t)
        t = record("decay", model.decay(ctx, s, dict(t), aux), t)
        t = record("source", model.source(ctx, s, dict(t), aux), t)
        t = record("force", model.force(ctx, s, dict(t), aux), t)
        t3, aux = model.pres.exec(ctx, s, dict(t), aux, dt, pp)
        t = record("pres", t3, t)
        t = record("limiter", model.limiter(ctx, s, dict(t), aux, dt), t)
        for n in names:
            out["%s_total" % n] = hprof(t[n][ks:ke])
        return out

    return jax.jit(diag)


TEND_OPS = ("thermo", "micro", "rad", "advec", "diff", "buffer", "decay",
            "source", "force", "pres", "limiter", "total")


class MaskStats:
    """Conditional-sampling statistics (reference bit-flag masks,
    stats.cxx:65-230): one extra NetCDF file per mask with masked means,
    variances, resolved w-fluxes and the area/areah fraction profiles.

    Masks: wplus/wmin (updraft/downdraft, fields.cxx mask provider),
    ql/qlcore (cloud / buoyant cloud core, thermo_moist), ib (atmosphere
    above the immersed boundary, immersed_boundary.cxx calc_mask), couvreux
    (conditional sampling on the decaying couvreux tracer exceeding its
    per-level mean + nstd*std, decay.cxx:124-182)."""

    KNOWN = ("wplus", "wmin", "ql", "qlcore", "ib", "couvreux")

    def __init__(self, model, masklist, xymasklist=()):
        from .utils import nc
        self.model = model
        self.xymasks = {}
        for m in xymasklist:
            path = os.path.join(model.workdir, "%s.0000000" % m)
            g = model.grid
            self.xymasks[m] = np.fromfile(path, dtype=np.float64).reshape(
                g.jtot, g.itot)
        self.masks = [m for m in masklist
                      if m in self.KNOWN or m in self.xymasks]
        g = model.grid
        tl = model.timeloop
        self.files = {}
        self.vars = {}
        names = model.fields.prognostic_names
        for mask in self.masks:
            fname = os.path.join(model.workdir, "%s.%s.%07d.nc"
                                 % (model.casename or "run", mask, tl.iotime))
            f = nc.Dataset(fname, "w")
            f.createDimension("z", g.ktot)
            f.createDimension("zh", g.ktot + 1)
            f.createDimension("time", None)
            f.createVariable("z", "f8", ("z",))[:] = g.z[g.kstart:g.kend]
            f.createVariable("zh", "f8", ("zh",))[:] = g.zh[g.kstart:g.kend + 1]
            vt = f.createVariable("time", "f8", ("time",))
            grp = f.createGroup("default")
            vv = {"time": vt}
            vv["area"] = grp.createVariable("area", "f8", ("time", "z"))
            vv["areah"] = grp.createVariable("areah", "f8", ("time", "zh"))
            for n in names:
                zdim = "zh" if n == "w" else "z"
                vv[n] = grp.createVariable(n, "f8", ("time", zdim))
                vv[n + "_2"] = grp.createVariable(n + "_2", "f8", ("time", zdim))
                if n != "w":
                    vv[n + "_w"] = grp.createVariable(n + "_w", "f8", ("time", "zh"))
            self.files[mask] = f
            self.vars[mask] = vv
        self._idx = 0
        self._diag = None

    def _build_diag(self):
        model = self.model
        ctx = model.ctx
        ks, ke = ctx.ks, ctx.ke
        names = model.fields.prognostic_names

        def masked_mean(a, m):
            n = jnp.sum(m, axis=(1, 2))
            return jnp.sum(a * m, axis=(1, 2)) / jnp.maximum(n, 1.), n

        def diag(s, sfc):
            s = model.boundary.set_ghost_cells(ctx, s, sfc)
            w = s["w"]
            wc = i2(w[ks:ke], w[ks + 1:ke + 1])
            out = {}
            for mask in self.masks:
                if mask in self.xymasks:
                    # user XY mask: > 0.5 at every level (fields.cxx
                    # set_xy_mask, :607-628)
                    xym = (jnp.asarray(self.xymasks[mask], dtype=w.dtype)
                           > 0.5).astype(w.dtype)
                    kt = ke - ks
                    mc = jnp.broadcast_to(xym[None], (kt,) + xym.shape)
                    mh = jnp.broadcast_to(xym[None], (kt + 1,) + xym.shape)
                elif mask == "wplus":
                    mc = (wc > 0.).astype(w.dtype)
                    mh = (w[ks:ke + 1] > 0.).astype(w.dtype)
                elif mask == "wmin":
                    mc = (wc < 0.).astype(w.dtype)
                    mh = (w[ks:ke + 1] < 0.).astype(w.dtype)
                elif mask == "ib":
                    # static DEM mask: cell centers/half levels above terrain
                    dem = jnp.asarray(model.ib.dem, dtype=w.dtype)
                    zc = ctx.z[ks:ke][:, None, None]
                    zhc = ctx.zh[ks:ke + 1][:, None, None]
                    mc = (zc > dem[None]).astype(w.dtype)
                    mh = (zhc > dem[None]).astype(w.dtype)
                elif mask == "couvreux":
                    # Tracer anomaly > nstd*std per level (decay.cxx:142-178):
                    # mask where c - mean - nstd*std > 0; half-level via
                    # 2nd-order interpolation of the anomaly field.
                    if "couvreux" not in s:
                        raise ValueError(
                            "couvreux mask needs a 'couvreux' scalar")
                    nstd = self.model.ini.get_float(
                        "decay", "nstd_couvreux", default=1.)
                    c = s["couvreux"]
                    cm = jnp.mean(c[ks:ke], axis=(1, 2), keepdims=True)
                    cv = jnp.mean(c[ks:ke] ** 2, axis=(1, 2), keepdims=True)
                    std = jnp.sqrt(jnp.maximum(cv - cm * cm, 0.))
                    anom = jnp.zeros_like(c)
                    anom = anom.at[ks:ke].set(c[ks:ke] - cm - ctx.dtype(nstd) * std)
                    anomh = i2(anom[ks - 1:ke], anom[ks:ke + 1])
                    mc = (anom[ks:ke] > 0.).astype(w.dtype)
                    mh = (anomh > 0.).astype(w.dtype)
                elif mask in ("ql", "qlcore"):
                    ql = model.thermo.get_ql(ctx, s)
                    mc = (ql > 0.).astype(w.dtype)
                    if mask == "qlcore":
                        b = model.thermo.get_buoyancy(ctx, s)[ks:ke]
                        bm = jnp.mean(b, axis=(1, 2), keepdims=True)
                        mc = mc * (b > bm).astype(w.dtype)
                    # half-level mask: both adjacent centers in the mask
                    mh = jnp.concatenate([mc[:1], jnp.minimum(mc[:-1], mc[1:]),
                                          mc[-1:]], axis=0)
                o = {}
                npts = ctx.itot * ctx.jtot
                o["area"] = jnp.mean(mc, axis=(1, 2))
                o["areah"] = jnp.mean(mh, axis=(1, 2))
                for n in names:
                    if n == "w":
                        mean, _ = masked_mean(w[ks:ke + 1], mh)
                        var, _ = masked_mean(w[ks:ke + 1] ** 2, mh)
                    else:
                        a = s[n][ks:ke]
                        mean, _ = masked_mean(a, mc)
                        var, _ = masked_mean(a ** 2, mc)
                        wflux = jnp.zeros(ke - ks + 1, dtype=ctx.dtype)
                        ah = i2(a[:-1], a[1:])
                        fx, _ = masked_mean(w[ks + 1:ke] * ah, mh[1:-1])
                        o[n + "_w"] = wflux.at[1:-1].set(fx)
                    o[n] = mean
                    o[n + "_2"] = var - mean ** 2
                out[mask] = o
            return out

        return jax.jit(diag)

    def exec(self, s, sfc, time):
        if not self.masks:
            return
        if self._diag is None:
            self._diag = self._build_diag()
        out = self._diag(s, sfc)
        i = self._idx
        for mask in self.masks:
            vv = self.vars[mask]
            vv["time"][i] = time
            for name, val in out[mask].items():
                if name in vv:
                    vv[name][i] = np.asarray(val)
            self.files[mask].sync()
        self._idx += 1

    def close(self):
        for f in self.files.values():
            f.close()
