"""Radiation schemes: disabled, prescribed, GCSS parameterized LW/SW
(reference ``src/radiation.cxx`` factory, ``radiation_prescribed.cxx``,
``radiation_gcss.cxx``).  The full RTE+RRTMGP scheme lives in
``radiation_rrtmgp.py``; the solar-position helpers here serve all of them.

The GCSS (DYCOMS) scheme's per-column cumulative liquid-water-path loops
become ``cumsum`` scans over k — fully vectorized over the horizontal plane.
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst


class RadiationDisabled:
    sw = "0"

    def __init__(self, *a, **k):
        pass

    def exec(self, ctx, s, t, sfc, aux, time_s, thermo):
        return t, sfc


class RadiationPrescribed:
    """Constant (optionally time-dependent) surface radiative fluxes
    (radiation_prescribed.cxx): consumed by the land-surface scheme."""

    sw = "prescribed"

    def __init__(self, ini, grid):
        self.swtimedep = ini.get_bool("radiation", "swtimedep_prescribed", default=False)
        if not self.swtimedep:
            self.sw_flux_dn = ini.get_float("radiation", "sw_flux_dn")
            self.sw_flux_up = ini.get_float("radiation", "sw_flux_up")
            self.lw_flux_dn = ini.get_float("radiation", "lw_flux_dn")
            self.lw_flux_up = ini.get_float("radiation", "lw_flux_up")

    def exec(self, ctx, s, t, sfc, aux, time_s, thermo):
        return t, sfc

    def get_surface_radiation(self):
        return {"sw_flux_dn": self.sw_flux_dn, "sw_flux_up": self.sw_flux_up,
                "lw_flux_dn": self.lw_flux_dn, "lw_flux_up": self.lw_flux_up}


def utc_anchor(ini):
    """Calendar anchor from [time] datetime_utc for the solar position:
    (seconds-of-year at model time 0, year), or None when unset
    (timeloop.cxx:73-77; consumed at radiation_rrtmgp.cxx:1307-1310)."""
    txt = ini.get_str("time", "datetime_utc", default="")
    if not txt:
        return None
    import datetime as _dt
    d = _dt.datetime.strptime(txt, "%Y-%m-%d %H:%M:%S")
    soy = ((d.timetuple().tm_yday - 1) * 86400.
           + d.hour * 3600. + d.minute * 60. + d.second)
    return (soy, d.year)


def calc_cos_zenith_angle(lat, lon, day_of_year, seconds_since_midnight,
                          year):
    """Cosine of the solar zenith angle, Paltridge & Platt (1976)
    (radiation_rrtmgp_functions.h:41-88).  All-jnp so it traces; year is a
    static python int."""
    pi = np.pi
    leap = (year % 4 == 0) and ((year % 100 != 0) or (year % 400 == 0))
    days_per_year = 366 if leap else 365
    doy = day_of_year - 1.
    radlat = lat * pi / 180.
    radlon = lon * pi / 180.
    doy_pi = 2. * pi * doy / days_per_year
    decl = (0.006918 - 0.399912 * jnp.cos(doy_pi) + 0.070257 * jnp.sin(doy_pi)
            - 0.006758 * jnp.cos(2. * doy_pi) + 0.000907 * jnp.sin(2. * doy_pi)
            - 0.002697 * jnp.cos(3. * doy_pi) + 0.00148 * jnp.sin(3. * doy_pi))
    a1 = (1.00554 * doy - 6.28306) * pi / 180.
    a2 = (1.93946 * doy + 23.35089) * pi / 180.
    a3 = (7.67825 * jnp.sin(a1) + 10.09176 * jnp.sin(a2)) / 60.
    hour_solar = seconds_since_midnight / 3600. - a3 + radlon * (180. / pi / 15.)
    hour_angle = (hour_solar - 12.) * 15. * (pi / 180.)
    return (jnp.sin(radlat) * jnp.sin(decl)
            + jnp.cos(radlat) * jnp.cos(decl) * jnp.cos(hour_angle))


def utc_zenith(anchor, lat, lon, time_s):
    """mu0 at traced model time from a utc_anchor (year wraps are folded
    into day-of-year > 365, matching a run shorter than a year)."""
    soy, year = anchor
    tot = soy + time_s
    doy = jnp.floor(tot / 86400.) + 1.
    ssm = jnp.mod(tot, 86400.)
    return calc_cos_zenith_angle(lat, lon, doy, ssm, year)


def calc_zenith(lat, lon, day_of_year):
    """Cosine of the solar zenith angle (radiation_gcss.cxx:40-76)."""
    pi = np.pi
    z1, z2, z3, z4, z5, z6 = 279.934, 1.914827, 0.7952, 0.019938, 0.00162, 23.4439
    time2sec = day_of_year + 1 + lon / 360.
    day = jnp.floor(time2sec)
    lam = lat * pi / 180.
    d = 2. * pi * jnp.round(time2sec) / 365.
    sig = d + pi / 180. * (z1 + z2 * jnp.sin(d) - z3 * jnp.cos(d)
                           + z4 * jnp.sin(2. * d) - z5 * jnp.cos(2. * d))
    delta = jnp.arcsin(jnp.sin(z6 * pi / 180.) * jnp.sin(sig))
    h = 2. * pi * ((time2sec - day) - 0.5)
    return (jnp.sin(lam) * jnp.sin(delta)
            + jnp.cos(lam) * jnp.cos(delta) * jnp.cos(h))


class RadiationGcss:
    sw = "gcss"

    def __init__(self, ini, grid):
        self.grid = grid
        self.xka = ini.get_float("radiation", "xka")
        self.fr0 = ini.get_float("radiation", "fr0")
        self.fr1 = ini.get_float("radiation", "fr1")
        self.div = ini.get_float("radiation", "div")
        self.mu_min = ini.get_float("radiation", "mu_min", default=0.035)
        self.lat = grid.lat
        self.lon = grid.lon
        self._utc = utc_anchor(ini)

    def _layer_geom(self, ctx):
        """dz as used by the reference: z[k]-z[max(1,k-1)] in
        ghost-indexing."""
        ks, ke = ctx.ks, ctx.ke
        z = ctx.z
        zc = z[ks:ke]
        zm = jnp.concatenate([z[ks - 1:ks], z[ks:ke - 1]])
        return zc, (zc - zm)[:, None, None]

    def _lw_flux(self, ctx, s, thermo):
        """Full-level LW flux (calc_gcss_rad_LW flux part)."""
        ks, ke = ctx.ks, ctx.ke
        ql = thermo.get_ql(ctx, s)
        qt = s["qt"][ks:ke]
        rho = ctx.rhoref[ks:ke][:, None, None]
        zc, dlayer = self._layer_geom(ctx)
        dlwp = jnp.maximum(0., ql * rho * dlayer)
        lwp = jnp.cumsum(dlwp, axis=0)
        lwp_tot = lwp[-1]
        flx = (self.fr1 * jnp.exp(-self.xka * lwp)
               + self.fr0 * jnp.exp(-self.xka * lwp_tot)[None])
        cond = (ql > 0.01e-3) & (qt >= 0.008)
        kidx = jnp.arange(ql.shape[0])[:, None, None]
        ki = jnp.max(jnp.where(cond, kidx, -1), axis=0)
        has_pbl = ki >= 0
        ki_c = jnp.clip(ki, 0, ql.shape[0] - 1)
        z_int = jnp.asarray(zc)
        z_ki = z_int[ki_c]
        rho_ki = ctx.rhoref[ks:ke][ki_c]
        fact = self.div * cst.cp * rho_ki
        above = kidx > ki
        dz_above = jnp.maximum(z_int[:, None, None] - z_ki[None], 0.)
        cooling_top = fact[None] * (0.25 * dz_above ** (4. / 3.)
                                    + z_ki[None] * dz_above ** (1. / 3.))
        return flx + jnp.where(above & has_pbl[None] & (fact[None] > 0.),
                               cooling_top, 0.)

    def flux_fields(self, ctx, s, time_s, thermo):
        """Full 3-D lflx/sflx fields on full levels for stats, crosses and
        columns (radiation_gcss.cxx get_radiation_field; sflx is zero at
        night like the reference's daytime gate)."""
        if self._utc is not None:
            day_of_year = (self._utc[0] + time_s) / 86400. + 1.
        else:
            day_of_year = time_s / 86400.
        mu = calc_zenith(self.lat, self.lon, day_of_year)
        swn, _ = self._sw_flux(ctx, s, mu, thermo)
        lflx = self._lw_flux(ctx, s, thermo)
        return {"lflx": lflx,
                "sflx": jnp.where(mu > self.mu_min, swn,
                                  jnp.zeros_like(swn))}

    def flux_profiles(self, ctx, s, time_s, thermo):
        return {k: jnp.mean(v, axis=(1, 2)) for k, v in
                self.flux_fields(ctx, s, time_s, thermo).items()}

    def exec(self, ctx, s, t, sfc, aux, time_s, thermo):
        """LW always; SW gated on daytime zenith (exec_gcss_rad)."""
        ks, ke = ctx.ks, ctx.ke
        rho = ctx.rhoref[ks:ke][:, None, None]

        # ---- LW (calc_gcss_rad_LW); the fr0 term uses the FINAL (total)
        # lwp at every level — the per-level decrement is commented out in
        # the reference — mirror that behavior exactly (see _lw_flux) ----
        flx = self._lw_flux(ctx, s, thermo)

        # heating: tt -= d(flx)/dz / (rho cp), k from ks+1 (km1 clamped)
        dflx = flx[1:] - flx[:-1]
        dzi_c = ctx.dzi[ks + 1:ke][:, None, None]
        heat = -dflx * dzi_c / (rho[1:] * cst.cp)

        name = "thl" if "thl" in t else ("th" if "th" in t else None)
        if name is None:
            return t, sfc
        t = dict(t)
        t[name] = t[name].at[ks + 1:ke].add(heat)

        # ---- SW (sunray), gated on daytime ----
        # lat/lon may be time-dependent ([grid] swtimedep, grid.cxx:388-401)
        # and ride in the carried state; the fractional day of year comes
        # from the UTC anchor when [time] datetime_utc is set (the reference
        # requires it — radiation_gcss.cxx:363).
        lat = sfc["__lat"] if "__lat" in sfc else self.lat
        lon = sfc["__lon"] if "__lon" in sfc else self.lon
        if self._utc is not None:
            day_of_year = (self._utc[0] + time_s) / 86400. + 1.
        else:
            day_of_year = time_s / 86400.
        mu = calc_zenith(lat, lon, day_of_year)
        swn, _ = self._sw_flux(ctx, s, mu, thermo)
        dswn = swn[1:] - swn[:-1]
        heat_sw = dswn * dzi_c / (rho[1:] * cst.cp)
        do_sw = mu > self.mu_min
        t[name] = t[name].at[ks + 1:ke].add(jnp.where(do_sw, heat_sw, 0.))
        return t, sfc

    def _sw_flux(self, ctx, s, mu, thermo):
        """Full-level net SW flux (calc_gcss_rad_SW / sunray)."""
        ks, ke = ctx.ks, ctx.ke
        ql = thermo.get_ql(ctx, s)
        rho = ctx.rhoref[ks:ke][:, None, None]
        _, dlayer = self._layer_geom(ctx)
        reff, rho_l, sw0, gc_, alb = 1.e-5, 1000., 1100., 0.85, 0.05
        tau = jnp.where(ql > 1.e-5, jnp.maximum(0., 1.5 * ql * rho * dlayer / reff / rho_l), 0.)
        tauc = jnp.sum(tau, axis=0)
        mu_eff = jnp.maximum(mu, self.mu_min + 1e-12)
        omega = 1. - 1.e-3 * (0.9 + 2.75 * (mu_eff + 1.) * jnp.exp(-0.09 * tauc))
        ff = gc_ * gc_
        gcde = gc_ / (1. + gc_)
        taucde = (1. - omega * ff) * tauc
        taude = (1. - omega * ff) * tau
        omegade = (1. - ff) * omega / (1. - omega * ff)
        x1 = 1. - omegade * gcde
        x2 = 1. - omegade
        rk = jnp.sqrt(3. * x2 * x1)
        mu2 = mu_eff * mu_eff
        x3 = 4. * (1. - rk * rk * mu2)
        rp = jnp.sqrt(3. * x2 / x1)
        alpha = 3. * omegade * mu2 * (1. + gcde * x2) / x3
        beta = 3. * omegade * mu_eff * (1. + 3. * gcde * mu2 * x2) / x3
        rtt = 2. / 3.
        exmu0 = jnp.exp(-taucde / mu_eff)
        expk = jnp.exp(rk * taucde)
        exmk = 1. / expk
        xp23p = 1. + rtt * rp
        xm23p = 1. - rtt * rp
        ap23b = alpha + rtt * beta
        t1 = 1. - alb - rtt * (1. + alb) * rp
        t2 = 1. - alb + rtt * (1. + alb) * rp
        t3 = (1. - alb) * alpha - rtt * (1. + alb) * beta + alb * mu_eff
        c2 = (xp23p * t3 * exmu0 - t1 * ap23b * exmk) / (xp23p * t2 * expk - xm23p * t1 * exmk)
        c1 = (ap23b - c2 * xm23p) / xp23p
        # taupath accumulates from the top downward
        taupath = jnp.cumsum(taude[::-1], axis=0)[::-1]
        swn = (sw0 * (4. / 3.) * (rp * (c1 * jnp.exp(-rk * taupath)
                                        - c2 * jnp.exp(rk * taupath))
                                  - beta * jnp.exp(-taupath / mu_eff))
               + mu_eff * sw0 * jnp.exp(-taupath / mu_eff))
        return swn, mu_eff


def make_radiation(ini, grid):
    sw = ini.get_str("radiation", "swradiation", default="0")
    if sw in ("0", "false"):
        return RadiationDisabled()
    if sw == "prescribed":
        return RadiationPrescribed(ini, grid)
    if sw == "gcss":
        return RadiationGcss(ini, grid)
    if sw == "rrtmgp":
        from .radiation_rrtmgp import RadiationRrtmgp
        return RadiationRrtmgp(ini, grid)
    raise ValueError("%s is an illegal value for swradiation" % sw)
