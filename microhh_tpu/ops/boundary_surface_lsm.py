"""Interactive land surface: tiled surface energy balance + soil column.

Reference: ``src/boundary_surface_lsm.cxx``, ``include/land_surface_kernels.h``,
``include/soil_kernels.h``, ``src/soil_grid.cxx``.

Three surface tiles (vegetation / bare soil / wet skin) each solve a
linearized surface energy balance for a new skin temperature
(land_surface_kernels.h ``calc_fluxes``), with MOST stability per tile; the
tile-averaged fluxes drive the atmosphere.  Below, a prognostic soil column
carries temperature ``t_soil`` and volumetric water content ``theta_soil``
(explicit diffusion, van Genuchten hydrology, root water extraction), plus a
2-D liquid-water reservoir ``wl`` on the vegetation.

TPU re-design notes:

* Everything is one functional pass over whole 2-D planes / soil columns —
  tile loops become three vectorized plane computations; the per-point
  Obukhov iteration is the shared warm-started Newton solve in most.py.
* Soil properties are homogeneous-per-level (``swhomogeneous=true``), so all
  van Genuchten table lookups collapse to per-level column constants
  (no gathers on TPU).
* Prognostic soil/2-D state rides in the same state dict as the atmosphere
  (keys ``t_soil``, ``theta_soil``, ``wl``) and is advanced by the same RK
  scheme; skin states per tile live in the carried ``sfc`` dict.

Heterogeneous surfaces (``swhomogeneous=false``) read binary 2-D property
maps / 3-D soil maps named ``<name>.0000000`` (generate with
python/lsm_input.py); ``swwater=true`` adds an open-water mask with
prescribed water temperature.  Constant z0 is still required.
"""

import os

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from . import most
from .boundary_surface import BoundarySurface
from .boundary import DIRICHLET, FLUX
from .stencil import im, ip, jm, jp
from .thermo_moist import (sat_adjust, esat_liq, esat_ice, qsat, dqsatdT,
                           water_fraction, buoyancy_no_ql)

# soil physical constants (constants.h:50-54)
RHO_C_MATRIX = 1.6e6
RHO_C_WATER = 4.18e6
GAMMA_T_MATRIX = 3.4293695508945325   # pow(7.7,0.4)*pow(2,0.6)
GAMMA_T_WATER = 0.57
WLMAX = 0.0002

TILES = ("veg", "soil", "wet")


def _vg_diffusivity(vg_a, vg_l, vg_m, gamma_sat, theta_res, theta_sat, tn):
    """van Genuchten moisture diffusivity (soil_kernels.h:33-43)."""
    vg_mi = 1. / vg_m
    return ((1. - vg_m) * gamma_sat / (vg_a * vg_m * (theta_sat - theta_res))
            * tn ** (vg_l - vg_mi)
            * ((1. - tn ** vg_mi) ** -vg_m + (1. - tn ** vg_mi) ** vg_m - 2.))


def _L(a):
    """Broadcast a per-level (kt,) soil array to (kt,1,1); heterogeneous
    (kt,jtot,itot) arrays pass through unchanged."""
    return a[:, None, None] if getattr(a, "ndim", 0) == 1 else a


def seb_fluxes(T_a, qt1, T_b, T_soil_top, qsat_bot, dqsatdT_bot, ra, rs_lim,
               lam, cs_lim, sw_dn, sw_up, lw_dn, lw_up, rhoh, emis_sfc,
               subdt):
    """Linearised surface-energy-balance solve for one tile
    (land_surface_kernels.h calc_fluxes :294-381): solve the new skin
    temperature from the linearised budget, then diagnose H/LE/G/S with
    the linearised qsat so the SEB closes.  Returns
    (H, LE, G, S, T_new, qsat_new)."""
    fH = rhoh * cst.cp / ra
    fLE = rhoh * cst.Lv / (ra + rs_lim)
    Qnet = sw_dn - sw_up + lw_dn - lw_up
    num = (Qnet + lw_up + fH * T_a
           + fLE * (qt1 + dqsatdT_bot * T_b - qsat_bot)
           + lam * T_soil_top + 3. * emis_sfc * cst.sigma_b * T_b ** 4
           - (1. - emis_sfc) * lw_dn)
    den = (fH + fLE * dqsatdT_bot + lam
           + 4. * emis_sfc * cst.sigma_b * T_b ** 3)
    T_new = (num + cs_lim / subdt * T_b) / (den + cs_lim / subdt)
    qsat_new = qsat_bot + dqsatdT_bot * (T_new - T_b)
    H = fH * (T_new - T_a)
    LE = fLE * (qsat_new - qt1)
    G = lam * (T_new - T_soil_top)
    S = cs_lim * (T_new - T_b) / subdt
    return H, LE, G, S, T_new, qsat_new


def liquid_water_reservoir(wl, wl_t0, frac, LE_t, rain, c_veg, lai, subdt):
    """Interception-reservoir tendency, throughfall and interception
    (land_surface_kernels.h calc_liquid_water_reservoir :89-155).
    Returns (wl_tend_lim, throughfall, interception)."""
    to_ms = 1. / (cst.rho_w * cst.Lv)
    rr_ms = rain / cst.rho_w
    subdti = 1. / subdt
    wlm = WLMAX * (1. - c_veg + c_veg * lai)
    wl_tend_max = (wlm - wl) * subdti - wl_t0
    wl_tend_min = -wl * subdti - wl_t0
    wl_liq = -jnp.maximum(0., frac["wet"] * LE_t["wet"] * to_ms)
    wl_dew = -(jnp.minimum(0., frac["wet"] * LE_t["wet"] * to_ms)
               + jnp.minimum(0., frac["veg"] * LE_t["veg"] * to_ms)
               + jnp.minimum(0., frac["soil"] * LE_t["soil"] * to_ms))
    intercept_eff = 0.5
    wl_precip = intercept_eff * c_veg * rr_ms
    wl_sum = wl_liq + wl_dew + wl_precip
    wl_lim = jnp.minimum(wl_tend_max, jnp.maximum(wl_tend_min, wl_sum))
    throughfall = (-(1. - c_veg) * rr_ms
                   - (1. - intercept_eff) * c_veg * rr_ms
                   + jnp.minimum(0., wl_lim - wl_sum))
    interception = jnp.maximum(0., wl_lim)
    return wl_lim, throughfall, interception


def soil_thermal_diffusivity(theta, tsat, gdry, rhoC):
    """IFS soil heat conductivity/diffusivity (soil_kernels.h
    calc_thermal_properties :213-249).  Returns (kappa, gamma)."""
    gamma_T_sat = (GAMMA_T_MATRIX ** (1. - tsat)
                   * GAMMA_T_WATER ** theta * 2.2 ** (tsat - theta))
    kersten = jnp.log10(jnp.maximum(0.1, theta / tsat)) + 1.
    gam = kersten * (gamma_T_sat - gdry) + gdry
    return gam / rhoC, gam


def _vg_conductivity(tn, vg_l, vg_m, gamma_sat):
    """van Genuchten conductivity (soil_kernels.h:45-51)."""
    return gamma_sat * tn ** vg_l * (1. - (1. - tn ** (1. / vg_m)) ** vg_m) ** 2


class BoundarySurfaceLSM(BoundarySurface):
    is_surface = True
    is_lsm = True

    def __init__(self, ini, fields, grid, soil_grid):
        if ini.get_str("boundary", "mbcbot") != "noslip":
            raise ValueError("swboundary=surface_lsm requires mbcbot=noslip")
        super().__init__(ini, fields, grid)
        if not self.sw_constant_z0:
            raise NotImplementedError("surface_lsm currently requires "
                                      "swconstantz0=true")
        self.sgrid = soil_grid
        for name in ("thl", "qt"):
            if name in fields.sp and self.bcs[name].bcbot != DIRICHLET:
                raise ValueError("surface_lsm requires sbcbot=dirichlet for thl/qt")

        self.sw_homogeneous = ini.get_bool("land_surface", "swhomogeneous", default=True)
        self.sw_free_drainage = ini.get_bool("land_surface", "swfreedrainage", default=True)
        self.sw_water = ini.get_bool("land_surface", "swwater", default=False)
        self.sw_homogenize = ini.get_bool("land_surface", "swhomogenizesfc", default=False)
        self.sw_tile_stats = ini.get_bool("land_surface", "swtilestats", default=False)
        self.emis_sfc = ini.get_float("radiation", "emis_sfc")
        if self.sw_homogeneous and self.sw_water:
            # water tiles require a 2-D mask (boundary_surface_lsm.cxx:290)
            raise ValueError("swwater=true requires swhomogeneous=false")

        # homogeneous land-surface properties ([land_surface] group);
        # heterogeneous runs read 2-D maps in create()
        # (boundary_surface_lsm.cxx:1209-1220 vs :1427-1456)
        if self.sw_homogeneous:
            self.props = {name: ini.get_float("land_surface", name) for name in
                          ("gD", "c_veg", "lai", "rs_veg_min", "rs_soil_min",
                           "lambda_stable", "lambda_unstable", "cs_veg")}
        else:
            self.props = None
        self.water_mask = None
        self.t_bot_water = None

        # prognostic soil + 2-D state
        fields.init_prognostic_soil_field("t_soil", "Soil temperature", "K")
        fields.init_prognostic_soil_field("theta_soil",
                                          "Soil volumetric water content", "m3 m-3")
        fields.init_prognostic_2d_field("wl", "Liquid water reservoir", "m")

        self.radiation = None  # wired by Model
        self.micro = None

    # -- setup ---------------------------------------------------------------
    def _read_map(self, workdir, name, shape, dtype):
        """Binary 2-D/3-D input map ``<name>.0000000`` (reference
        load_2d_field/load_3d_field, boundary_surface_lsm.cxx:1355-1456;
        generated with python/lsm_input.py)."""
        path = os.path.join(workdir, "%s.%07d" % (name, 0))
        if not os.path.exists(path):
            raise FileNotFoundError(
                "%s not found: swhomogeneous=false needs binary input maps "
                "(see python/lsm_input.py)" % path)
        a = np.fromfile(path, dtype=dtype).astype(np.float64)
        return a.reshape(shape)

    def create(self, input_nc, workdir=".", dtype=np.float64):
        """Soil index/root profiles + van Genuchten table
        (boundary_surface_lsm.cxx:1163-1250); heterogeneous property maps
        (:1427-1456)."""
        sg = self.sgrid
        g = self.grid
        kt = sg.ktot
        if self.sw_homogeneous:
            soil = input_nc.groups["soil"]
            si = np.asarray(soil.variables["index_soil"][:kt], dtype=np.int64)
            self.root_frac = np.asarray(soil.variables["root_frac"][:kt],
                                        dtype=np.float64)
        else:
            shape3 = (kt, g.jtot, g.itot)
            shape2 = (g.jtot, g.itot)
            si = np.rint(self._read_map(workdir, "index_soil", shape3,
                                        dtype)).astype(np.int64)
            self.root_frac = self._read_map(workdir, "root_frac", shape3, dtype)
            self.props = {name: self._read_map(workdir, name, shape2, dtype)
                          for name in
                          ("gD", "c_veg", "lai", "rs_veg_min", "rs_soil_min",
                           "lambda_stable", "lambda_unstable", "cs_veg")}
            if self.sw_water:
                self.water_mask = (self._read_map(
                    workdir, "water_mask", shape2, dtype) > 0.5)
                self.t_bot_water = self._read_map(
                    workdir, "t_bot_water", shape2, dtype)

        # table (misc/van_genuchten_parameters.nc; standard IFS/van Genuchten
        # soil classes) — the run directory may override the packaged copy.
        from ..utils import nc
        path = os.path.join(workdir, "van_genuchten_parameters.nc")
        if not os.path.exists(path):
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "data", "van_genuchten_parameters.nc")
        tbl = nc.Dataset(path, "r")

        def col(name):
            return np.asarray(tbl.variables[name][:], dtype=np.float64)[si]

        self.theta_res = np.maximum(col("theta_res"), cst.dsmall)
        self.theta_wp = col("theta_wp")
        self.theta_fc = col("theta_fc")
        self.theta_sat = col("theta_sat")
        self.gamma_sat = col("gamma_sat")
        self.vg_a = col("alpha")
        self.vg_l = col("l")
        vg_n = col("n")
        self.vg_m = 1. - 1. / vg_n

        # derived per-level properties (soil_kernels.h calc_soil_properties)
        tn_min = (1.001 * self.theta_res - self.theta_res) / (self.theta_sat - self.theta_res)
        tn_max = (0.999 * self.theta_sat - self.theta_res) / (self.theta_sat - self.theta_res)
        self.kappa_min = _vg_diffusivity(self.vg_a, self.vg_l, self.vg_m,
                                         self.gamma_sat, self.theta_res,
                                         self.theta_sat, tn_min)
        self.kappa_max = _vg_diffusivity(self.vg_a, self.vg_l, self.vg_m,
                                         self.gamma_sat, self.theta_res,
                                         self.theta_sat, tn_max)
        self.gamma_min = np.zeros(kt)
        self.gamma_max = self.gamma_sat.copy()

        rho_solid = 2700.
        rho_dry = (1. - self.theta_sat) * rho_solid
        self.gamma_T_dry = (0.135 * rho_dry + 64.7) / (rho_solid - 0.947 * rho_dry)
        self.rho_C = ((1. - self.theta_sat) * RHO_C_MATRIX
                      + self.theta_fc * RHO_C_WATER)

    def create_cold_start(self, input_nc, state, sfc, dtype=np.float64,
                          workdir="."):
        """Initial soil/skin state (boundary_surface_lsm.cxx:1088-1160);
        heterogeneous runs take the user-provided 3-D maps instead
        (boundary_surface_lsm.cxx:1120 'provided as binary input files')."""
        g, sg = self.grid, self.sgrid
        soil = input_nc.groups["soil"]
        init = input_nc.groups["init"]
        shape3 = (sg.ktot, g.jtot, g.itot)
        shape2 = (g.jtot, g.itot)
        if self.sw_homogeneous:
            t_prof = np.asarray(soil.variables["t_soil"][:sg.ktot], dtype=dtype)
            th_prof = np.asarray(soil.variables["theta_soil"][:sg.ktot], dtype=dtype)
            state["t_soil"] = np.broadcast_to(t_prof[:, None, None], shape3).copy()
            state["theta_soil"] = np.broadcast_to(th_prof[:, None, None], shape3).copy()
        else:
            state["t_soil"] = self._read_map(
                workdir, "t_soil", shape3, dtype).astype(dtype)
            state["theta_soil"] = self._read_map(
                workdir, "theta_soil", shape3, dtype).astype(dtype)
        state["wl"] = np.zeros(shape2, dtype=dtype)
        thl1 = float(np.asarray(init.variables["thl"][:1])[0])
        qt1 = float(np.asarray(init.variables["qt"][:1])[0])
        sfc["thl_bot"] = np.full(shape2, thl1 + 0.1, dtype=dtype)
        sfc["qt_bot"] = np.full(shape2, qt1, dtype=dtype)
        for tile in TILES:
            sfc["thl_bot_" + tile] = np.full(shape2, thl1 + 0.1, dtype=dtype)
            sfc["qt_bot_" + tile] = np.full(shape2, qt1, dtype=dtype)
        sfc["thl_fluxbot"] = np.full(shape2, cst.dsmall, dtype=dtype)
        sfc["qt_fluxbot"] = np.full(shape2, cst.dsmall, dtype=dtype)
        return state, sfc

    def init_surface_state(self, dtype=np.float64):
        sfc = super().init_surface_state(dtype)
        g = self.grid
        shape = (g.jtot, g.itot)
        for tile in TILES:
            sfc["thl_bot_" + tile] = np.zeros(shape, dtype=dtype)
            sfc["qt_bot_" + tile] = np.zeros(shape, dtype=dtype)
            # near-neutral seed for the warm-started z/L Newton solve
            sfc["obuk_" + tile] = np.full(shape, -cst.dbig, dtype=dtype)
        sfc["ustar"][:] = cst.dsmall
        for name in ("H", "LE", "G", "rs_veg", "rs_soil",
                     "throughfall", "interception", "runoff", "infiltration"):
            sfc[name] = np.zeros(shape, dtype=dtype)
        for tile in TILES:
            for pre in ("H_", "LE_", "G_", "c_"):
                sfc[pre + tile] = np.zeros(shape, dtype=dtype)
        return sfc

    # -- io (reference filenames, boundary_surface_lsm.cxx:1470-1553) --------
    LSM_2D = ("dudz_mo", "dvdz_mo", "dbdz_mo", "obuk",
              "thl_bot", "qt_bot",
              "thl_bot_veg", "qt_bot_veg", "thl_bot_soil", "qt_bot_soil",
              "thl_bot_wet", "qt_bot_wet",
              "obuk_veg", "obuk_soil", "obuk_wet")

    def save(self, sfc, iotime, path="."):
        from ..utils import fastio
        for name in self.LSM_2D:
            fastio.write_array("%s/%s.%07d" % (path, name, iotime),
                               np.asarray(sfc[name]))

    def load(self, sfc, iotime, path=".", dtype=np.float64):
        from ..utils import fastio
        fastio.flush()
        g = self.grid
        sfc = dict(sfc)
        for name in self.LSM_2D:
            raw = np.fromfile("%s/%s.%07d" % (path, name, iotime), dtype=dtype)
            sfc[name] = raw.reshape(g.jtot, g.itot)
        return sfc

    # -- main exec -----------------------------------------------------------
    def exec_lsm(self, ctx, s, t, sfc, aux, subdt):
        """Tiled SEB + soil column; returns (sfc, t) with soil/wl tendencies
        (boundary_surface_lsm.cxx:330-940)."""
        g, sg = self.grid, self.sgrid
        ks = ctx.ks
        zsl = float(g.z[ks])
        thermo = self.thermo
        sfc = dict(sfc)
        t = dict(t)

        dutot = self._calc_dutot(ctx, s, sfc)

        rad = self.radiation.get_surface_radiation()
        sw_dn = aux.get("sw_flux_dn_sfc", rad["sw_flux_dn"])
        sw_up = aux.get("sw_flux_up_sfc", rad["sw_flux_up"])
        lw_dn = aux.get("lw_flux_dn_sfc", rad["lw_flux_dn"])
        lw_up = aux.get("lw_flux_up_sfc", rad["lw_flux_up"])

        # thermo land-surface fields (thermo_moist.cxx:948-988)
        exnh = float(thermo.exnrefh[ks])
        ph = float(thermo.prefh[ks])
        p1 = float(thermo.pref[ks])
        exn1 = float(thermo.exnref[ks])
        rhoh = float(np.asarray(ctx.rhorefh)[ks])
        thvref1 = float(thermo.thvref[ks])
        thvrefh = float(thermo.thvrefh[ks])
        db_ref = thermo.get_db_ref()

        thl1 = s["thl"][ks]
        qt1 = s["qt"][ks]
        _, _, T_a, qs_a = sat_adjust(thl1, qt1, p1, exn1)
        a_w = water_fraction(T_a)
        es = a_w * esat_liq(T_a) + (1. - a_w) * esat_ice(T_a)
        vpd = es - qt1 / qs_a * es
        T_bot = exnh * sfc["thl_bot"]
        qsat_bot = qsat(ph, T_bot)
        dqsatdT_bot = dqsatdT(ph, T_bot)

        # surface rain rate (2mom/nsw6 bottom fluxes if present)
        rain = None
        for key in ("rr_bot", "rs_bot", "rg_bot"):
            if key in aux:
                rain = aux[key] if rain is None else rain + aux[key]
        if rain is None:
            rain = jnp.zeros_like(dutot)

        # dynamic tile fractions (land_surface_kernels.h:62-86)
        c_veg, lai = self.props["c_veg"], self.props["lai"]
        wl = s["wl"]
        wlm = WLMAX * (1. - c_veg + c_veg * lai)
        frac = {}
        frac["wet"] = jnp.minimum(1., wl / wlm)
        frac["veg"] = (1. - frac["wet"]) * c_veg
        frac["soil"] = (1. - frac["wet"]) * (1. - c_veg)

        # root-weighted soil moisture + resistances
        theta = s["theta_soil"]
        wp = _L(self.theta_wp)
        fc = _L(self.theta_fc)
        rf = _L(self.root_frac)
        theta_mean_n = jnp.sum(rf * (jnp.maximum(theta, wp) - wp) / (fc - wp),
                               axis=0)

        a_f1, b_f1, c_f1 = 0.81, 0.004, 0.05
        swd = jnp.maximum(0., sw_dn) * jnp.ones_like(dutot)
        f1 = 1. / jnp.minimum(1., (b_f1 * swd + c_f1) / (a_f1 * (b_f1 * swd + 1.)))
        f2 = 1. / jnp.minimum(1., jnp.maximum(1e-9, theta_mean_n))
        f3 = 1. / jnp.exp(-self.props["gD"] * vpd)
        th_top = theta[-1]
        th_min = c_veg * self.theta_wp[-1] + (1. - c_veg) * self.theta_res[-1]
        th_rel = (th_top - th_min) / (self.theta_fc[-1] - th_min)
        f2b = 1. / jnp.minimum(1., jnp.maximum(1e-9, th_rel))

        rs = {"veg": self.props["rs_veg_min"] / (lai + cst.dsmall) * f1 * f2 * f3,
              "soil": self.props["rs_soil_min"] * f2b,
              "wet": jnp.zeros_like(f1)}
        sfc["rs_veg"], sfc["rs_soil"] = rs["veg"], rs["soil"]

        # per-tile stability + SEB (land_surface_kernels.h:246-385)
        b1 = buoyancy_no_ql(thl1, qt1, thvref1)
        T_soil_top = s["t_soil"][-1]
        H_t, LE_t, G_t, bflux_t, ustar_t, ra_t = {}, {}, {}, {}, {}, {}
        for tile in TILES:
            thl_b = sfc["thl_bot_" + tile]
            qt_b = sfc["qt_bot_" + tile]
            b_bot = buoyancy_no_ql(thl_b, qt_b, thvrefh)
            db = b1 - b_bot + db_ref
            Ri = cst.kappa * db * zsl / dutot ** 2
            zL = most.solve_zL_dirichlet(Ri, zsl / sfc["obuk_" + tile], zsl,
                                         self.z0m, self.z0h)
            obuk = zsl / zL
            fh2d = most.fh(zsl, self.z0h, obuk)
            ustar = dutot * most.fm(zsl, self.z0m, obuk)
            bflux = -ustar * db * fh2d
            ra = 1. / (ustar * fh2d)
            ra_t[tile] = ra
            sfc["obuk_" + tile] = obuk
            ustar_t[tile] = ustar
            bflux_t[tile] = bflux

            # SEB solve (calc_fluxes): new skin temperature
            T_b = exnh * thl_b
            rs_lim = jnp.where(qsat_bot < qt1, 0., rs[tile])
            cs_lim = self.props["cs_veg"] if tile == "veg" else 0.
            lam = jnp.where(db > 0., self.props["lambda_stable"],
                            self.props["lambda_unstable"])
            H_t[tile], LE_t[tile], G_t[tile], _, T_new, _ = seb_fluxes(
                T_a, qt1, T_b, T_soil_top, qsat_bot, dqsatdT_bot, ra,
                rs_lim, lam, cs_lim, sw_dn, sw_up, lw_dn, lw_up, rhoh,
                self.emis_sfc, subdt)
            sfc["thl_bot_" + tile] = T_new / exnh
            sfc["qt_bot_" + tile] = qt1 + LE_t[tile] * ra / (rhoh * cst.Lv)

        # open-water override (land_surface_kernels.h set_water_tiles,
        # boundary_surface_lsm.cxx:564-597): water points are all-wet with a
        # prescribed water temperature; H/LE from the wet tile's aerodynamic
        # resistance, no soil heat flux, zero canopy resistance.
        if self.sw_water:
            mask = jnp.asarray(self.water_mask)
            t_wat = jnp.asarray(self.t_bot_water, dtype=ctx.dtype)
            thl_wet = jnp.where(mask, t_wat / exnh, sfc["thl_bot_wet"])
            qt_wet = jnp.where(mask, qsat(ph, t_wat), sfc["qt_bot_wet"])
            sfc["thl_bot_wet"], sfc["qt_bot_wet"] = thl_wet, qt_wet
            frac["wet"] = jnp.where(mask, 1., frac["wet"])
            frac["veg"] = jnp.where(mask, 0., frac["veg"])
            frac["soil"] = jnp.where(mask, 0., frac["soil"])
            H_wat = rhoh * cst.cp / ra_t["wet"] * (thl_wet - thl1)
            LE_wat = rhoh * cst.Lv / ra_t["wet"] * (qt_wet - qt1)
            for tile in TILES:
                wet = tile == "wet"
                H_t[tile] = jnp.where(mask, H_wat if wet else 0., H_t[tile])
                LE_t[tile] = jnp.where(mask, LE_wat if wet else 0., LE_t[tile])
                G_t[tile] = jnp.where(mask, 0., G_t[tile])

        def tiled(d):
            return sum(frac[k] * d[k] for k in TILES)

        H, LE, G = tiled(H_t), tiled(LE_t), tiled(G_t)
        sfc["H"], sfc["LE"], sfc["G"] = H, LE, G
        # per-tile fluxes and dynamic fractions for swtilestats
        for tile in TILES:
            sfc["H_" + tile] = H_t[tile]
            sfc["LE_" + tile] = LE_t[tile]
            sfc["G_" + tile] = G_t[tile]
            sfc["c_" + tile] = frac[tile]
        sfc["thl_fluxbot"] = H / (rhoh * cst.cp)
        sfc["qt_fluxbot"] = LE / (rhoh * cst.Lv)
        ustar = tiled(ustar_t)
        bfluxbot = tiled(bflux_t)
        sfc["ustar"] = ustar
        sfc["thl_bot"] = tiled({k: sfc["thl_bot_" + k] for k in TILES})
        sfc["qt_bot"] = tiled({k: sfc["qt_bot_" + k] for k in TILES})

        # bulk Obukhov length (boundary_surface_lsm.cxx:96-113)
        obuk = -ustar ** 3 / (cst.kappa * bfluxbot)
        obuk = zsl / jnp.clip(zsl / obuk, cst.zL_min, cst.zL_max)
        sfc["obuk"] = obuk

        # momentum fluxes via ustar redistribution (set_bcs_momentum)
        u, v = s["u"][ks], s["v"][ks]
        ubot, vbot = sfc["u_bot"], sfc["v_bot"]
        minval = 1.e-2
        du, dv = u - ubot, v - vbot
        vonu2 = jnp.maximum(minval, 0.25 * (im(dv) ** 2 + im(jp(dv)) ** 2 + dv ** 2 + jp(dv) ** 2))
        uonv2 = jnp.maximum(minval, 0.25 * (jm(du) ** 2 + jm(ip(du)) ** 2 + du ** 2 + ip(du) ** 2))
        u2 = jnp.maximum(minval, du ** 2)
        v2 = jnp.maximum(minval, dv ** 2)
        ustaronu4 = 0.5 * (im(ustar) ** 4 + ustar ** 4)
        ustaronv4 = 0.5 * (jm(ustar) ** 4 + ustar ** 4)
        uflux = -jnp.sign(du) * jnp.sqrt(ustaronu4 / (1. + vonu2 / u2))
        vflux = -jnp.sign(dv) * jnp.sqrt(ustaronv4 / (1. + uonv2 / v2))
        sfc["u_fluxbot"], sfc["v_fluxbot"] = uflux, vflux
        sfc["u_gradbot"] = du / zsl
        sfc["v_gradbot"] = dv / zsl

        # thl/qt linear surface gradients (set_bcs_thl_qt)
        sfc["thl_bot"] = sfc["thl_bot"]
        sfc["thl_gradbot"] = (thl1 - sfc["thl_bot"]) / zsl
        sfc["qt_gradbot"] = (qt1 - sfc["qt_bot"]) / zsl

        # other scalars via MOST fh on the bulk obuk (set_bcs_scalars)
        fh_bulk = ustar * most.fh(zsl, self.z0h, obuk)
        for name in self.fields.sp:
            if name in ("thl", "qt"):
                continue
            bc = self.bcs[name]
            var = s[name][ks]
            if bc.bcbot == DIRICHLET:
                varbot = sfc[name + "_bot"]
                sfc[name + "_fluxbot"] = -(var - varbot) * fh_bulk
                sfc[name + "_gradbot"] = (var - varbot) / zsl
            elif bc.bcbot == FLUX:
                varbot = sfc[name + "_fluxbot"] / fh_bulk + var
                sfc[name + "_bot"] = varbot
                sfc[name + "_gradbot"] = (var - varbot) / zsl

        # MO gradients for the SGS model (bsk calc_duvdz_mo / calc_dbdz_mo)
        phim = most.phim(zsl / obuk)
        uflux_c = 0.5 * (uflux + ip(uflux))
        vflux_c = 0.5 * (vflux + jp(vflux))
        sfc["dudz_mo"] = -uflux_c / (cst.kappa * zsl * ustar) * phim
        sfc["dvdz_mo"] = -vflux_c / (cst.kappa * zsl * ustar) * phim
        sfc["dbdz_mo"] = -bfluxbot / (cst.kappa * zsl * ustar) * most.phih(zsl / obuk)

        # liquid water reservoir tendency (calc_liquid_water_reservoir)
        wl_t0 = t["wl"]
        wl_lim, throughfall, interception = liquid_water_reservoir(
            wl, wl_t0, frac, LE_t, rain, c_veg, lai, subdt)
        sfc["throughfall"] = throughfall
        sfc["interception"] = interception
        t["wl"] = wl_t0 + wl_lim

        # ---- soil columns ---------------------------------------------------
        dz = self.sgrid.dz[:, None, None]
        dzi = self.sgrid.dzi[:, None, None]
        dzhi = self.sgrid.dzhi[:, None, None]   # (kts+1,1,1)
        tsat = _L(self.theta_sat)

        # soil temperature: thermal diffusivity (calc_thermal_properties)
        kap_T, _ = soil_thermal_diffusivity(theta, tsat, _L(self.gamma_T_dry),
                                            _L(self.rho_C))

        def interp_harmonic(f):
            dzs = self.sgrid.dz
            num = (dzs[:-1] + dzs[1:])[:, None, None] * f[:-1] * f[1:]
            den = f[:-1] * dzs[1:][:, None, None] + f[1:] * dzs[:-1][:, None, None]
            return num / den

        def interp_max(f):
            return jnp.maximum(f[:-1], f[1:])

        def diff_explicit(f, kap_h, flux_top, flux_bot, gam_h=None, source=None):
            # kap_h/gam_h: interior half levels 1..kts-1 -> shape (kts-1,j,i)
            grad = (f[1:] - f[:-1]) * dzhi[1:-1]
            flux = kap_h * grad                           # diffusive flux, interior faces
            ftop = -flux_top[None]
            fbot = -flux_bot[None]
            F = jnp.concatenate([fbot, flux, ftop], axis=0)   # (kts+1, j, i)
            tend = (F[1:] - F[:-1]) * dzi
            if gam_h is not None:
                # bottom face conductivity: free drainage copies the first
                # interior face, else zero; top face rides in flux_top
                # (set_bcs_moisture, soil_kernels.h:437-480)
                gbot = gam_h[:1] if self.sw_free_drainage else jnp.zeros_like(gam_h[:1])
                Gm = jnp.concatenate([gbot, gam_h, jnp.zeros_like(gam_h[:1])], axis=0)
                tend = tend + (Gm[1:] - Gm[:-1]) * dzi
            if source is not None:
                tend = tend + source
            return tend

        tsoil = s["t_soil"]
        kapTh = interp_harmonic(kap_T)
        flux_top_T = -G / self.rho_C[-1]
        flux_bot_T = jnp.zeros_like(G)
        t["t_soil"] = t["t_soil"] + diff_explicit(tsoil, kapTh, flux_top_T, flux_bot_T)

        # soil moisture: hydraulic properties (calc_hydraulic_properties)
        tres = _L(self.theta_res)
        th_lim = jnp.maximum(theta, 1.001 * tres)
        tn = (th_lim - tres) / (tsat - tres)
        kap_th = _vg_diffusivity(_L(self.vg_a), _L(self.vg_l),
                                 _L(self.vg_m), _L(self.gamma_sat),
                                 tres, tsat, tn)
        kap_th = jnp.clip(kap_th, _L(self.kappa_min), _L(self.kappa_max))
        gam_th = _vg_conductivity(tn, _L(self.vg_l),
                                  _L(self.vg_m), _L(self.gamma_sat))
        gam_th = jnp.clip(gam_th, _L(self.gamma_min), _L(self.gamma_max))

        kap_th_h = interp_max(kap_th)
        gam_th_h = interp_max(gam_th)

        # infiltration / runoff (calc_infiltration)
        dz2i = 1. / (0.5 * self.sgrid.dz[-1])
        i_max = jnp.minimum(0., -(self.kappa_max[-1] * (self.theta_sat[-1] - th_top)
                                  * dz2i + self.gamma_max[-1]))
        infiltration = jnp.minimum(0., jnp.maximum(throughfall, i_max))
        runoff = jnp.minimum(0., throughfall - infiltration)
        sfc["infiltration"], sfc["runoff"] = infiltration, runoff

        # moisture BCs: top = bare-soil evaporation + infiltration
        fac = 1. / (cst.rho_w * cst.Lv)
        flux_top_th = frac["soil"] * LE_t["soil"] * fac + infiltration
        flux_bot_th = jnp.zeros_like(flux_top_th)

        # root water extraction (calc_root_water_extraction)
        theta_rf_sum = jnp.sum(rf * theta, axis=0)
        theta_frac = rf * theta / theta_rf_sum
        LE_veg_frac = frac["veg"] * LE_t["veg"]
        extraction = -jnp.maximum(0., LE_veg_frac) * fac * dzi * theta_frac

        t["theta_soil"] = t["theta_soil"] + diff_explicit(
            theta, kap_th_h, flux_top_th, flux_bot_th,
            gam_h=gam_th_h, source=extraction)

        return sfc, t

    # the base-class exec is replaced by exec_lsm (called from the model)
    def exec(self, ctx, s, sfc, aux):
        raise RuntimeError("BoundarySurfaceLSM must be driven via exec_lsm")
