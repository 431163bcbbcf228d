"""Interactive longwave + shortwave radiative transfer (RRTMGP component).

Reference: ``src/radiation_rrtmgp.cxx`` — full RTE+RRTMGP: k-distribution
gas optics loaded from ``coefficients_lw/sw.nc`` (the ``rte-rrtmgp-cpp``
submodule, EMPTY in the reference checkout, carries both the kernels and
those data files), a background column above the domain top, cloud optics,
no-scattering LW and two-stream SW solvers, heating rates, and surface
fluxes consumed by the land-surface scheme.

This TPU build reproduces the component structure end-to-end.  When the
standard rte-rrtmgp data files sit in the case directory —
``coefficients_{lw,sw}.nc`` (k-distributions) and
``cloud_coefficients_{lw,sw}.nc`` (cloud-optics LUTs) — the full spectral
path runs: per-g-point major + MINOR gas optics (kminor lower/upper with
density/scaling-gas/complement scaling), Planck fractions, per-g-point
solar source, Rayleigh, and per-band LUT cloud optics with Martin (1994)
effective radii (see rrtmgp_optics.py; oracle-tested against a numpy
transliteration of the rte-rrtmgp kernels in tests/oracle_ref/rrtmgp_ref.py).

Without the data files (the reference checkout's rte-rrtmgp-cpp submodule
is empty, so no tables ship with it) a documented TWO-BAND gray stand-in
keeps radiatively-driven cases runnable:

* LW: gray water-vapor + continuum with a diffusivity-factor no-scattering
  solve, identical solver structure to ``Rte_lw`` with one g-point;
* SW: one band with Rayleigh + water-vapor absorption and delta-two-stream
  cloud scattering, like ``Rte_sw`` with one g-point.

All solves are vectorized over whole (j, i) planes of columns — columns
are independent, so the TPU sees batched elementwise math plus `lax.scan`
cumulative sweeps, with the g-point loop scanned so the working set stays
one g-point wide.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as cst
from .radiation import calc_zenith, utc_anchor, utc_zenith
from .rrtmgp_optics import _BandOptics
from .thermo_moist import sat_adjust

# two-band gas-optics stand-in coefficients (tuned to give realistic
# clear-sky OLR ~ 260-300 W m-2 and SW transmittance ~0.75 for a
# midlatitude column; NOT a k-distribution)
K_LW_H2O = 0.15      # m2 kg-1, gray water-vapor mass absorption
K_LW_DRY = 1.5e-4    # m2 kg-1 at p0, pressure-broadened continuum
K_LW_CLD = 0.158     # m2 g-1 LWP (GCSS-like cloud LW)
K_SW_H2O = 0.002     # m2 kg-1
TAU_SW_RAY = 0.10    # total Rayleigh optical depth of a full atmosphere
DIFFUSIVITY = 1.66   # LW diffusivity factor (Elsasser)

REFF = 1.0e-5        # cloud droplet effective radius [m]
G_CLOUD = 0.85       # cloud asymmetry
SSA_CLOUD = 0.9999   # cloud single-scattering albedo


class RadiationRrtmgp:
    sw = "rrtmgp"

    def __init__(self, ini, grid):
        self.grid = grid
        self.sw_longwave = ini.get_bool("radiation", "swlongwave", default=True)
        self.sw_shortwave = ini.get_bool("radiation", "swshortwave", default=True)
        self.emis_sfc = ini.get_float("radiation", "emis_sfc")
        self.sfc_alb_dir = ini.get_float("radiation", "sfc_alb_dir")
        self.sfc_alb_dif = ini.get_float("radiation", "sfc_alb_dif")
        self.tsi_scaling = ini.get_float("radiation", "tsi_scaling", default=1.)
        self.sw_fixed_sza = ini.get_bool("radiation", "swfixedsza", default=True)
        if self.sw_fixed_sza:
            self.mu0 = float(np.cos(ini.get_float("radiation", "sza")))
        self.lat = grid.lat
        self.lon = grid.lon
        # Paltridge-Platt solar position when [time] datetime_utc anchors
        # the calendar (radiation_rrtmgp.cxx:1307-1310); otherwise the
        # GCSS-style doy-from-simulation-time fallback.
        self._utc = utc_anchor(ini)
        self._latlon = (self.lat, self.lon)
        # optional smoothing of the surface diffuse SW
        # (radiation_rrtmgp.cxx:607-614)
        self.sw_diffuse_filter = ini.get_bool("radiation", "swfilterdiffuse",
                                              default=False)
        if self.sw_diffuse_filter:
            self.sigma_filter = ini.get_float("radiation", "sigma_filter")
        # clear-sky flux profiles in the statistics
        # (radiation_rrtmgp.cxx:590,628-642)
        self.sw_clear_sky_stats = ini.get_bool(
            "radiation", "swclearskystats", default=False)
        # The reference recomputes radiation every [radiation] dt_rad and
        # holds thlt_rad (and the surface fluxes) constant in between
        # (radiation_rrtmgp.cxx exec gating).  dt_rad=0 -> every substep.
        self.dt_rad = ini.get_float("radiation", "dt_rad", default=0.)
        self.t_sfc = ini.get_float("radiation", "t_sfc", default=-1.)
        self.bg = None       # background column (p, T, qv) above domain top
        self.o3_prof = None  # in-domain o3 vmr profile (from the init group)
        self._sfc = None
        self.kdist_lw = None
        self.kdist_sw = None
        self.cloud_lw = None
        self.cloud_sw = None
        # trace gases as constant volume mixing ratios for the k-distribution
        self.gas_vmr = {"co2": ini.get_float("radiation", "co2", default=397e-6),
                        "o3": ini.get_float("radiation", "o3", default=0.),
                        "n2o": ini.get_float("radiation", "n2o", default=0.),
                        "ch4": ini.get_float("radiation", "ch4", default=0.)}

    # -- setup ----------------------------------------------------------------
    def create(self, input_nc, thermo, workdir="."):
        """Background column from the `radiation` input group
        (radiation_rrtmgp.cxx:1020-1060); falls back to a hydrostatic
        isothermal-stratosphere extension of the domain top.  When RRTMGP
        coefficient files (``coefficients_lw/sw.nc``, the standard
        rte-rrtmgp data schema) sit in the case directory, the k-
        distribution loader swaps in table-driven gas optics
        (radiation_rrtmgp.cxx:1222,1265); otherwise the documented two-band
        stand-in runs."""
        import os
        self.thermo = thermo
        from .rrtmgp_optics import KDistribution, CloudOptics
        lw_path = os.path.join(workdir, "coefficients_lw.nc")
        sw_path = os.path.join(workdir, "coefficients_sw.nc")
        if os.path.exists(lw_path):
            self.kdist_lw = KDistribution(lw_path)
        if os.path.exists(sw_path):
            self.kdist_sw = KDistribution(sw_path)
        # cloud-optics LUTs (radiation_rrtmgp.cxx:1224,1267)
        self.cloud_lw = self.cloud_sw = None
        cl_path = os.path.join(workdir, "cloud_coefficients_lw.nc")
        cs_path = os.path.join(workdir, "cloud_coefficients_sw.nc")
        if os.path.exists(cl_path):
            self.cloud_lw = CloudOptics(cl_path)
        if os.path.exists(cs_path):
            self.cloud_sw = CloudOptics(cs_path)
        if input_nc is not None and "radiation" in getattr(input_nc, "groups", {}):
            rad = input_nc.groups["radiation"]
            self.bg = {
                "p": np.asarray(rad.variables["p_lay"][:], dtype=np.float64),
                "T": np.asarray(rad.variables["t_lay"][:], dtype=np.float64),
                "qv": np.asarray(rad.variables["h2o"][:], dtype=np.float64),
            }
            if "o3" in rad.variables:
                self.bg["o3"] = np.asarray(rad.variables["o3"][:],
                                           dtype=np.float64)
            # h2o is a volume mixing ratio in the reference input; convert
            # to specific humidity q = ep*x/(1+ep*x).
            x = self.bg["qv"]
            self.bg["qv"] = cst.ep * x / (1. + cst.ep * x)
            # The reference solves the FULL background column and then takes
            # the flux interpolated AT the domain-top pressure as the
            # incident boundary condition (radiation_rrtmgp.cxx:823-838,
            # 913-928) — layers at or below the domain top must not
            # attenuate the incident beam.  Equivalent here: keep only the
            # background layers strictly above the domain top.
            ks, ke = self.grid.kstart, self.grid.kend
            p_top = float(thermo.prefh[ke])
            keep = self.bg["p"] < p_top
            self.bg = {k: v[keep] for k, v in self.bg.items()}
        else:
            ks, ke = self.grid.kstart, self.grid.kend
            p_top = float(thermo.prefh[ke])
            T_top = 230.
            # 12 layers from the domain top to 1 hPa
            p = np.geomspace(p_top * 0.95, 100., 12)
            self.bg = {"p": p, "T": np.full(12, T_top),
                       "qv": np.full(12, 3.e-6)}
        # In-domain o3 volume-mixing-ratio profile: the reference loads gas
        # profiles from the `init` group into Gas_concs (radiation_rrtmgp
        # create path); a constant [radiation] o3= still wins if set.
        if (self.gas_vmr.get("o3", 0.) == 0. and input_nc is not None
                and "init" in getattr(input_nc, "groups", {})
                and "o3" in input_nc.groups["init"].variables):
            z_in = np.asarray(input_nc.variables["z"][:], dtype=np.float64)
            o3_in = np.asarray(input_nc.groups["init"].variables["o3"][:],
                               dtype=np.float64)
            ks, ke = self.grid.kstart, self.grid.kend
            zc = np.asarray(self.grid.z[ks:ke], dtype=np.float64)
            self.o3_prof = np.interp(zc, z_in, o3_in)

    # -- gas + cloud optics ----------------------------------------------------
    def _domain_paths(self, ctx, s, thermo):
        ks, ke = ctx.ks, ctx.ke
        p = jnp.asarray(thermo.pref, dtype=ctx.dtype)[ks:ke][:, None, None]
        exn = jnp.asarray(thermo.exnref, dtype=ctx.dtype)[ks:ke][:, None, None]
        rho = ctx.rhoref[ks:ke][:, None, None]
        dz = ctx.dz[ks:ke][:, None, None]
        ql, qi, T, _ = sat_adjust(s["thl"][ks:ke], s["qt"][ks:ke], p, exn)
        qv = s["qt"][ks:ke] - ql - qi
        wv_path = rho * qv * dz                       # kg m-2 per layer
        dry_path = rho * dz * (p / cst.p0)
        lwp = rho * (ql + qi) * dz * 1e3              # g m-2 per layer
        return T, wv_path, dry_path, lwp, rho, dz, exn

    def _cloud_fields(self, ctx, s, thermo):
        """Separate liquid/ice water paths [g m-2] + effective radii
        [micron] via the Martin et al. (1994) parametrization with the
        reference's fixed Nc0/Ni0 (radiation_rrtmgp.cxx:1981-2024)."""
        ks, ke = ctx.ks, ctx.ke
        p = jnp.asarray(thermo.pref, dtype=ctx.dtype)[ks:ke][:, None, None]
        exn = jnp.asarray(thermo.exnref, dtype=ctx.dtype)[ks:ke][:, None, None]
        rho = ctx.rhoref[ks:ke][:, None, None]
        dz = ctx.dz[ks:ke][:, None, None]
        ql, qi, _, _ = sat_adjust(s["thl"][ks:ke], s["qt"][ks:ke], p, exn)
        clwp = rho * ql * dz                          # kg m-2
        ciwp = rho * qi * dz
        sig_g = 1.34
        fac = np.exp(np.log(sig_g) ** 2)
        Nc0, Ni0 = 100.e6, 1.e5
        four3pi_cw = (4. / 3.) * np.pi * Nc0 * cst.rho_w
        four3pi_ii = (4. / 3.) * np.pi * Ni0 * cst.rho_i
        rel = jnp.where(clwp > 0.,
                        1e6 * fac * ((clwp / dz) / four3pi_cw) ** (1. / 3.), 0.)
        rel = jnp.clip(rel, 2.5, 21.5)
        rei = jnp.where(ciwp > 0.,
                        1e6 * ((ciwp / dz) / four3pi_ii) ** (1. / 3.), 0.)
        rei = jnp.clip(rei, 10., 180.)
        return clwp * 1e3, ciwp * 1e3, rel, rei       # paths in g m-2

    def _bg_lw(self):
        """Background-column LW: gray downward emission at the domain top
        and its transmittance (numpy, time-independent)."""
        p, T, qv = self.bg["p"], self.bg["T"], self.bg["qv"]
        g = cst.grav
        # layer masses from hydrostatic dp (build level pressures as midpoints)
        pl = np.concatenate([[p[0] * 1.02], 0.5 * (p[:-1] + p[1:]), [p[-1] * 0.5]])
        dm = np.abs(np.diff(pl)) / g                  # kg m-2 per layer
        tau = DIFFUSIVITY * (K_LW_H2O * qv * dm + K_LW_DRY * dm * (p / cst.p0))
        # march downward from space (p increasing toward the domain top)
        order = np.argsort(p)                          # low p (space) first
        F = 0.
        for i in order:
            tr = np.exp(-tau[i])
            F = F * tr + (1. - tr) * cst.sigma_b * T[i] ** 4
        return float(F)

    def _bg_sw_trans(self):
        p, qv = self.bg["p"], self.bg["qv"]
        pl = np.concatenate([[p[0] * 1.02], 0.5 * (p[:-1] + p[1:]), [p[-1] * 0.5]])
        dm = np.abs(np.diff(pl)) / cst.grav
        tau = (K_SW_H2O * qv * dm + TAU_SW_RAY * np.abs(np.diff(pl)) / cst.p0)
        return float(np.exp(-np.sum(tau)))

    # -- solvers ----------------------------------------------------------------
    def _lw_solve(self, tr, B, t_sfc_emis, fdn_top):
        """No-scattering LW sweeps (Rte_lw structure): downward from
        fdn_top, surface emission t_sfc_emis + reflection, upward.
        tr: per-layer transmittance, B: per-layer source (flux units)."""
        top = jnp.broadcast_to(fdn_top, tr.shape[1:]).astype(tr.dtype)

        def sweep(F, xs):
            tr_k, B_k = xs
            F = F * tr_k + (1. - tr_k) * B_k
            return F, F

        _, dns = jax.lax.scan(sweep, top, (tr[::-1], B[::-1]))
        flux_dn = jnp.concatenate([dns[::-1], top[None]], axis=0)
        sfc = (self.emis_sfc * t_sfc_emis
               + (1. - self.emis_sfc) * flux_dn[0])
        _, ups = jax.lax.scan(sweep, sfc, (tr, B))
        flux_up = jnp.concatenate([sfc[None], ups], axis=0)
        return flux_up, flux_dn

    def _longwave(self, ctx, T, wv_path, dry_path, lwp, t_sfc, fdn_top):
        """Two-band stand-in LW: gray optics + Planck emission per layer.
        Returns (flux_up, flux_dn) at the ktot+1 half levels."""
        tau = (DIFFUSIVITY * (K_LW_H2O * wv_path + K_LW_DRY * dry_path)
               + K_LW_CLD * lwp)
        tr = jnp.exp(-tau)
        B = cst.sigma_b * T ** 4
        return self._lw_solve(tr, B, cst.sigma_b * t_sfc ** 4, fdn_top)

    # -- table-driven k-distribution paths (coefficients_{lw,sw}.nc) ----------
    def _column_inputs(self, ctx, T, s, thermo):
        """Domain-column interpolation inputs for the k-distribution."""
        from .rrtmgp_optics import col_amounts
        ks, ke = ctx.ks, ctx.ke
        play = jnp.asarray(thermo.pref, dtype=ctx.dtype)[ks:ke][:, None, None]
        plev = jnp.asarray(thermo.prefh, dtype=ctx.dtype)[ks:ke + 1][:, None, None]
        p_ = jnp.asarray(thermo.pref, dtype=ctx.dtype)[ks:ke][:, None, None]
        exn = jnp.asarray(thermo.exnref, dtype=ctx.dtype)[ks:ke][:, None, None]
        ql, qi, _, _ = sat_adjust(s["thl"][ks:ke], s["qt"][ks:ke], p_, exn)
        qv = s["qt"][ks:ke] - ql - qi
        extra = dict(self.gas_vmr)
        if self.o3_prof is not None:
            extra["o3"] = jnp.asarray(self.o3_prof,
                                      dtype=ctx.dtype)[:, None, None]
        col_dry, cols = col_amounts(play, plev, qv, extra)
        return play, T, col_dry, cols

    def _bg_inputs(self, dtype):
        from .rrtmgp_optics import col_amounts
        p = jnp.asarray(self.bg["p"], dtype=dtype)
        T = jnp.asarray(self.bg["T"], dtype=dtype)
        qv = jnp.asarray(self.bg["qv"], dtype=dtype)
        pl = jnp.concatenate([p[:1] * 1.02, 0.5 * (p[:-1] + p[1:]),
                              p[-1:] * 0.5])
        extra = dict(self.gas_vmr)
        if "o3" in self.bg:
            extra["o3"] = jnp.asarray(self.bg["o3"], dtype=dtype)
        col_dry, cols = col_amounts(p, pl, qv, extra)
        return p, T, col_dry, cols

    def _lw_table_flux(self, ctx, T, lwp, t_sfc, thermo, s, clear=False):
        """LW fluxes with RRTMGP gas optics: lax.scan over g-points, each
        with interpolated tau + Planck sources; gray cloud optical depth
        rides on every g-point.  Reference: radiation_rrtmgp.cxx
        exec_longwave (:775-900), column-blocked there, g-point-blocked
        here so the working set stays one g-point wide."""
        kd = self.kdist_lw
        play, tlay, col_dry, cols = self._column_inputs(ctx, T, s, thermo)
        idx = kd.interp_indices(play, tlay)
        idx0 = {k: v[:1] for k, v in idx.items()}
        cols0 = {k: v[:1] for k, v in cols.items()}
        tsfc_b = jnp.broadcast_to(t_sfc, tlay.shape[1:])[None]

        # background column (1-D): per-gpt downward emission at domain top
        pb, Tb, cdb, colsb = self._bg_inputs(tlay.dtype)
        idxb = kd.interp_indices(pb, Tb)
        order = jnp.argsort(pb)   # low p (space) first

        # cloud optics: banded LUT when tables are present, gray fallback.
        # ``clear`` zeroes the condensate paths on BOTH branches
        # (swclearskystats; the gray branch gets it via the zeroed lwp).
        if self.cloud_lw is not None and not clear:
            clwp_g, ciwp_g, rel, rei = self._cloud_fields(ctx, s, thermo)
            tau_c, taussa_c, _ = self.cloud_lw.cloud_optics(
                clwp_g, ciwp_g, rel, rei, dtype=tlay.dtype)
            tau_cld_band = tau_c - taussa_c   # 1scl absorption optical depth
        else:
            tau_cld_band = None
            tau_cld = K_LW_CLD * lwp          # gray cloud, all g-points
        bo = _BandOptics(kd, idx, cols, col_dry, play, tlay, tlay.dtype)
        bob = _BandOptics(kd, idxb, colsb, cdb, pb, Tb, tlay.dtype)

        # Bands run as a static loop of banded EINSUMS (_BandOptics): the
        # per-g-point table gathers measured ~150 ms/gpt on TPU at 1.2M
        # points and the per-g scan serialized n_gpt*nlay dispatch steps;
        # the banded form computes each band's Gb g-points as one-hot
        # matmuls and runs the vertical sweeps with a trailing g batch
        # axis.
        nlev = tlay.shape[0] + 1
        up = jnp.zeros((nlev,) + tlay.shape[1:], tlay.dtype)
        dn = jnp.zeros_like(up)
        for b in range(kd.band2gpt.shape[0]):
            res = bo.band_all(b, t_sfc=tsfc_b, want_planck=True)
            rb = bob.band_all(b, want_planck=True)
            tr_b = jnp.exp(-DIFFUSIVITY * rb["tau"])          # (nbg, Gb)
            src_b = rb["lay_src"]
            # downward accumulation over the (space -> domain top) order in
            # closed form: F = sum_i (1-tr_i) src_i * prod_{j above i} tr_j
            tr_o = tr_b[order]
            src_o = src_b[order]
            cp = jnp.cumprod(tr_o[::-1], axis=0)[::-1]
            suff = jnp.concatenate([cp[1:], jnp.ones_like(cp[:1])], axis=0)
            fdn_top = jnp.sum((1. - tr_o) * src_o * suff, axis=0)  # (Gb,)

            cld = (tau_cld[..., None] if tau_cld_band is None
                   else tau_cld_band[..., b][..., None])
            tr = jnp.exp(-DIFFUSIVITY * (res["tau"] + cld))
            upb, dnb = self._lw_solve(tr, res["lay_src"], res["sfc_src"],
                                      fdn_top)
            up = up + upb.sum(-1)
            dn = dn + dnb.sum(-1)
        return up, dn

    def _sw_table_flux(self, ctx, T, lwp, mu0, thermo, s, clear=False):
        """SW fluxes with RRTMGP gas optics + per-g-point solar source."""
        kd = self.kdist_sw
        play, tlay, col_dry, cols = self._column_inputs(ctx, T, s, thermo)
        idx = kd.interp_indices(play, tlay)
        mu = jnp.maximum(mu0, 1e-3)

        # background column transmittance per gpt (1-D direct beam)
        pb, Tb, cdb, colsb = self._bg_inputs(tlay.dtype)
        idxb = kd.interp_indices(pb, Tb)

        if self.cloud_sw is not None and not clear:
            clwp_g, ciwp_g, rel, rei = self._cloud_fields(ctx, s, thermo)
            tau_c_b, taussa_c_b, taussag_c_b = self.cloud_sw.cloud_optics(
                clwp_g, ciwp_g, rel, rei, dtype=tlay.dtype)
        else:
            tau_c_b = None
            tau_cld = 1.5e-3 * lwp / (REFF * cst.rho_w)
            ssa_cld_tau = SSA_CLOUD * tau_cld
        bo = _BandOptics(kd, idx, cols, col_dry, play, tlay, tlay.dtype)
        bob = _BandOptics(kd, idxb, colsb, cdb, pb, Tb, tlay.dtype)
        solar = jnp.asarray(kd.solar_source, dtype=tlay.dtype)

        # banded einsums + trailing-g-axis solves (see _lw_table_flux)
        nlev = tlay.shape[0] + 1
        up = jnp.zeros((nlev,) + tlay.shape[1:], tlay.dtype)
        dn = jnp.zeros_like(up)
        dirh = jnp.zeros_like(up)
        for b in range(kd.band2gpt.shape[0]):
            gp = bo.gpts(b)
            res = bo.band_all(b, want_rayleigh=True)
            rb = bob.band_all(b, want_rayleigh=True)
            tau_bg = rb["tau"] + rb["kray"]                   # (nbg, Gb)
            toa_g = (solar[gp] * self.tsi_scaling * jnp.maximum(mu0, 0.)
                     * jnp.exp(-jnp.sum(tau_bg, axis=0) / mu))  # (Gb,)
            tau_gas = res["tau"]
            tau_ray = res["kray"]
            if tau_c_b is not None:
                tc = tau_c_b[..., b][..., None]
                tcs = taussa_c_b[..., b][..., None]
                tcsg = taussag_c_b[..., b][..., None]
                tau = tau_gas + tau_ray + tc
                ssa_tau = tau_ray + tcs
                ssa = ssa_tau / jnp.maximum(tau, 1e-30)
                g_as = tcsg / jnp.maximum(ssa_tau, 1e-30)
            else:
                tau = tau_gas + tau_ray + tau_cld[..., None]
                ssa = ((tau_ray + ssa_cld_tau[..., None])
                       / jnp.maximum(tau, 1e-30))
                g_as = jnp.where(tau_cld[..., None] > 0.,
                                 G_CLOUD * ssa_cld_tau[..., None]
                                 / jnp.maximum(ssa * tau, 1e-30), 0.)
            upb, dnb, dirb = self._sw_solve(tau, ssa, g_as, mu0, toa_g)
            up = up + upb.sum(-1)
            dn = dn + dnb.sum(-1)
            dirh = dirh + dirb.sum(-1)
        return up, dn, dirh

    def _shortwave(self, ctx, wv_path, dry_path, lwp, mu0, toa_dir):
        """Two-band stand-in SW: build (tau, ssa, g) then run the generic
        delta-two-stream solve."""
        tau_gas = K_SW_H2O * wv_path + TAU_SW_RAY * dry_path / (cst.p0 / cst.grav)
        tau_cld = 1.5e-3 * lwp / (REFF * cst.rho_w)   # lwp g/m2 -> tau
        tau = tau_gas + tau_cld
        ssa = jnp.where(tau > 0., (SSA_CLOUD * tau_cld + 0.5 * TAU_SW_RAY
                                   * dry_path / (cst.p0 / cst.grav)) / (tau + 1e-30), 0.)
        g_as = jnp.where(tau_cld > 0., G_CLOUD * SSA_CLOUD * tau_cld
                         / (ssa * tau + 1e-30), 0.)
        return self._sw_solve(tau, ssa, g_as, mu0, toa_dir)

    def _sw_solve(self, tau, ssa, g_as, mu0, toa_dir):
        """Delta-scaled Meador-Weaver two-stream + adding, the rte-rrtmgp
        ``sw_two_stream``/``sw_source_2str``/``adding`` structure: per-layer
        diffuse R/T, direct-beam reflectance/transmittance sources with the
        standard gamma3/gamma4 partition, then an upward albedo/source
        accumulation and a downward diffuse sweep.  Layer index 0 is the
        lowest layer; half levels run surface..TOA."""
        # delta scaling (mo_optical_props delta_scale)
        f = g_as * g_as
        tau_d = (1. - ssa * f) * tau
        ssa_d = (1. - f) * ssa / (1. - ssa * f + 1e-30)
        g_d = (g_as - f) / (1. - f + 1e-30)

        mu = jnp.maximum(mu0, 1e-3)
        # direct beam at half levels: attenuation through all layers above
        tau_acc = jnp.cumsum(tau_d[::-1], axis=0)[::-1]
        dir_half = toa_dir * jnp.exp(-jnp.concatenate(
            [tau_acc, jnp.zeros_like(tau_acc[:1])], axis=0) / mu)

        # Meador-Weaver / Zdunkowski PIFM two-stream coefficients
        gamma1 = (8. - ssa_d * (5. + 3. * g_d)) * 0.25
        gamma2 = 3. * (ssa_d * (1. - g_d)) * 0.25
        gamma3 = (2. - 3. * mu * g_d) * 0.25
        gamma4 = 1. - gamma3
        alpha1 = gamma1 * gamma4 + gamma2 * gamma3
        alpha2 = gamma1 * gamma3 + gamma2 * gamma4
        k = jnp.sqrt(jnp.maximum(gamma1 * gamma1 - gamma2 * gamma2, 1e-12))
        ek = jnp.exp(-k * tau_d)
        ek2 = ek * ek
        RT = 1. / (k * (1. + ek2) + gamma1 * (1. - ek2))
        Rdif = RT * gamma2 * (1. - ek2)
        Tdif = RT * 2. * k * ek

        Tnoscat = jnp.exp(-tau_d / mu)
        k_mu = k * mu
        k_g3 = k * gamma3
        k_g4 = k * gamma4
        res = 1. - k_mu * k_mu
        res = jnp.where(jnp.abs(res) < 1e-12,
                        jnp.where(res >= 0., 1e-12, -1e-12), res)
        RT2 = ssa_d * RT / res
        Rdir = RT2 * ((1. - k_mu) * (alpha2 + k_g3)
                      - (1. + k_mu) * (alpha2 - k_g3) * ek2
                      - 2. * (k_g3 - alpha2 * k_mu) * ek * Tnoscat)
        Tdir = -RT2 * ((1. + k_mu) * (alpha1 + k_g4) * Tnoscat
                       - (1. - k_mu) * (alpha1 - k_g4) * ek2 * Tnoscat
                       - 2. * (k_g4 + alpha1 * k_mu) * ek)
        # physical bounds (as in rte-rrtmgp): the direct beam can yield at
        # most (1 - Tnoscat) of scattered flux
        Rdir = jnp.clip(Rdir, 0., 1. - Tnoscat)
        Tdir = jnp.clip(Tdir, 0., 1. - Tnoscat - Rdir)

        src_up = Rdir * dir_half[1:]       # beam entering each layer top
        src_dn = Tdir * dir_half[1:]

        # upward accumulation of albedo-below + upwelling source
        alb_sfc = jnp.full(tau.shape[1:], self.sfc_alb_dif, tau.dtype)
        src_sfc = self.sfc_alb_dir * dir_half[0]

        def up_acc(carry, xs):
            alb, src = carry
            R_k, T_k, su, sd = xs
            denom = 1. / (1. - R_k * alb)
            alb_new = R_k + T_k * T_k * alb * denom
            src_new = su + T_k * denom * (src + alb * sd)
            return (alb_new, src_new), (alb, src)

        (alb_top, src_top), (albs, srcs) = jax.lax.scan(
            up_acc, (alb_sfc, src_sfc), (Rdif, Tdif, src_up, src_dn))
        # albedo/source at half level l (everything below layer l)
        albs_half = jnp.concatenate([albs, alb_top[None]], axis=0)
        srcs_half = jnp.concatenate([srcs, src_top[None]], axis=0)

        # downward diffuse sweep from the top (flux_dn_dif[TOA] = 0)
        def dn_sweep(fdn, xs):
            R_k, T_k, sd, alb_b, src_b = xs
            fdn_new = (T_k * fdn + R_k * src_b + sd) / (1. - R_k * alb_b)
            return fdn_new, fdn_new

        zero_top = jnp.zeros(tau.shape[1:], tau.dtype)
        _, dn_rev = jax.lax.scan(
            dn_sweep, zero_top,
            (Rdif[::-1], Tdif[::-1], src_dn[::-1],
             albs_half[:-1][::-1], srcs_half[:-1][::-1]))
        dif_dn = jnp.concatenate([dn_rev[::-1], zero_top[None]], axis=0)
        dif_up = dif_dn * albs_half + srcs_half

        flux_dn = dif_dn + dir_half
        return dif_up, flux_dn, dir_half

    # -- model hook --------------------------------------------------------------
    _SFC_KEYS = ("lw_flux_up", "lw_flux_dn", "sw_flux_up", "sw_flux_dn",
                 "sw_flux_dn_dif")

    def init_state(self, sfc, ctx, dtype):
        """Extend the carried surface state with the held radiation fields
        (reference thlt_rad field + surface fluxes, recomputed every
        dt_rad and constant in between)."""
        if self.dt_rad <= 0.:
            return sfc
        sfc = dict(sfc)
        sfc["rad_tend"] = np.zeros((ctx.ktot, ctx.jtot, ctx.itot),
                                   dtype=dtype)
        for k_ in self._SFC_KEYS:
            sfc["rad_" + k_] = np.zeros((ctx.jtot, ctx.itot), dtype=dtype)
        # next compute time: 0 -> radiation runs on the first step
        sfc["rad_time_next"] = np.zeros((), dtype=dtype)
        return sfc

    def _compute(self, ctx, s, time_s, thermo):
        """One full radiation solve: (thl tendency, surface-flux dict)."""
        T, wv_path, dry_path, lwp, rho, dz, exn = self._domain_paths(ctx, s, thermo)
        lat, lon = self._latlon
        tend = jnp.zeros_like(T)
        zero2d = jnp.zeros_like(T[0])
        sfc_out = {k_: zero2d for k_ in self._SFC_KEYS}

        t_sfc = (jnp.asarray(self.t_sfc, dtype=ctx.dtype)
                 if self.t_sfc > 0. else T[0])

        if self.sw_longwave:
            if self.kdist_lw is not None:
                lw_up, lw_dn = self._lw_table_flux(ctx, T, lwp, t_sfc,
                                                   thermo, s)
            else:
                fdn_top = self._bg_lw()
                lw_up, lw_dn = self._longwave(ctx, T, wv_path, dry_path,
                                              lwp, t_sfc, fdn_top)
            net = lw_up - lw_dn
            tend = tend - (net[1:] - net[:-1]) / (rho * cst.cp * exn * dz)
            sfc_out["lw_flux_up"] = lw_up[0]
            sfc_out["lw_flux_dn"] = lw_dn[0]

        if self.sw_shortwave:
            if self.sw_fixed_sza:
                mu0 = self.mu0
            elif self._utc is not None:
                mu0 = utc_zenith(self._utc, lat, lon, time_s)
            else:
                mu0 = calc_zenith(lat, lon, time_s / 86400.)
            day = mu0 > 0.
            if self.kdist_sw is not None:
                sw_up, sw_dn, sw_dir = self._sw_table_flux(
                    ctx, T, lwp, jnp.asarray(mu0, ctx.dtype), thermo, s)
            else:
                toa = 1365.0 * self.tsi_scaling * jnp.maximum(mu0, 0.)
                toa = toa * self._bg_sw_trans()
                sw_up, sw_dn, sw_dir = self._shortwave(
                    ctx, wv_path, dry_path, lwp,
                    jnp.asarray(mu0, ctx.dtype), toa)
            zero = jnp.zeros_like(sw_up)
            sw_up = jnp.where(day, sw_up, zero)
            sw_dn = jnp.where(day, sw_dn, zero)
            sw_dir = jnp.where(day, sw_dir, zero)
            net = sw_up - sw_dn
            tend = tend - (net[1:] - net[:-1]) / (rho * cst.cp * exn * dz)
            dn_sfc, up_sfc, dir_sfc = sw_dn[0], sw_up[0], sw_dir[0]
            dif_sfc = jnp.maximum(dn_sfc - dir_sfc, 0.)
            if self.sw_diffuse_filter:
                # smoothed diffuse radiation drives the surface energy
                # balance (radiation_rrtmgp.cxx:948-990,1495-1513): the
                # total/up fluxes the LSM sees are rebuilt from the direct
                # beam plus the filtered diffuse part.
                dif_sfc = self._filter_diffuse(dif_sfc)
                dn_sfc = dir_sfc + dif_sfc
                up_sfc = (self.sfc_alb_dir * dir_sfc
                          + self.sfc_alb_dif * dif_sfc)
            sfc_out["sw_flux_up"] = up_sfc
            sfc_out["sw_flux_dn"] = dn_sfc
            sfc_out["sw_flux_dn_dif"] = dif_sfc
        return tend, sfc_out

    def _filter_diffuse(self, dif):
        """Iterated separable Gaussian smoothing of the surface diffuse SW
        flux with periodic wrap (the reference's filter_diffuse_radiation +
        kernel set-up, radiation_rrtmgp.cxx:948-990): n iterations of a
        +-ngc-point kernel whose per-iteration variances sum to
        sigma_filter^2."""
        g = self.grid
        ngc = max(int(getattr(g, "igc", 1)), 1)
        small = min(g.dx, g.dy)
        n_iter = max(int(np.ceil(self.sigma_filter ** 2 / small ** 2)), 1)
        sig = self.sigma_filter / np.sqrt(n_iter)
        offs = np.arange(-ngc, ngc + 1)
        kx = np.exp(-(offs * g.dx) ** 2 / (2. * sig ** 2))
        kx /= kx.sum()
        ky = np.exp(-(offs * g.dy) ** 2 / (2. * sig ** 2))
        ky /= ky.sum()
        for _ in range(n_iter):
            dif = sum(float(kx[m]) * jnp.roll(dif, int(offs[m]), axis=-1)
                      for m in range(len(offs)))
            dif = sum(float(ky[m]) * jnp.roll(dif, int(offs[m]), axis=-2)
                      for m in range(len(offs)))
        return dif

    def exec(self, ctx, s, t, sfc, aux, time_s, thermo):
        if "thl" not in s:
            return t, sfc
        ks, ke = ctx.ks, ctx.ke

        # lat/lon may ride in the carried state ([grid] swtimedep)
        self._latlon = ((sfc["__lat"], sfc["__lon"]) if "__lat" in sfc
                        else (self.lat, self.lon))
        if self.dt_rad <= 0. or "rad_time_next" not in sfc:
            tend, sfc_out = self._compute(ctx, s, time_s, thermo)
        else:
            # dt_rad gating (radiation_rrtmgp.cxx exec): recompute when the
            # clock passes rad_time_next, otherwise hold the previous
            # tendency and surface fluxes.
            do = jnp.asarray(time_s, ctx.dtype) >= sfc["rad_time_next"]

            def yes(_):
                tend, fl = self._compute(ctx, s, time_s, thermo)
                return (tend,) + tuple(fl[k_] for k_ in self._SFC_KEYS)

            def no(_):
                return ((sfc["rad_tend"],)
                        + tuple(sfc["rad_" + k_] for k_ in self._SFC_KEYS))

            out = jax.lax.cond(do, yes, no, operand=None)
            tend = out[0]
            sfc_out = dict(zip(self._SFC_KEYS, out[1:]))
            sfc = dict(sfc)
            sfc["rad_tend"] = tend
            for k_ in self._SFC_KEYS:
                sfc["rad_" + k_] = sfc_out[k_]
            sfc["rad_time_next"] = jnp.where(
                do, jnp.asarray(time_s, ctx.dtype) + ctx.dtype(self.dt_rad),
                sfc["rad_time_next"])

        t = dict(t)
        t["thl"] = t["thl"].at[ks:ke].add(tend)
        # surface fluxes travel through aux to the land-surface scheme
        # (same-trace; no host round trip)
        for k_, v in sfc_out.items():
            aux[k_ + "_sfc"] = v
        return t, sfc

    def flux_profiles(self, ctx, s, time_s, thermo, clear=False):
        """Domain-mean flux profiles on half levels for the statistics
        (radiation_rrtmgp.cxx exec_all_stats; ``clear`` zeroes the cloud
        water path — swclearskystats, :590,628-642)."""
        return {k: jnp.mean(v, axis=(1, 2)) for k, v in
                self.flux_fields(ctx, s, time_s, thermo, clear=clear).items()}

    def _mu0_at(self, time_s):
        """cos(solar zenith) at model time [s]."""
        if self.sw_fixed_sza:
            return self.mu0
        if self._utc is not None:
            return utc_zenith(self._utc, self.lat, self.lon, time_s)
        return calc_zenith(self.lat, self.lon, time_s / 86400.)

    def solar_series(self, ctx, time_s):
        """(sza [rad], sw_flux_dn_toa [W m-2]) time series
        (radiation_rrtmgp.cxx exec_all_stats tail:
        stats.set_time_series("sza"/"sw_flux_dn_toa"))."""
        mu0 = jnp.asarray(self._mu0_at(time_s), ctx.dtype)
        if self.kdist_sw is not None:
            tsi = jnp.sum(jnp.asarray(self.kdist_sw.solar_source, ctx.dtype))
        else:
            tsi = jnp.asarray(1365.0, ctx.dtype)
        toa = tsi * ctx.dtype(self.tsi_scaling) * jnp.maximum(mu0, 0.)
        sza = jnp.arccos(jnp.clip(mu0, -1., 1.))
        return sza, toa

    def flux_fields(self, ctx, s, time_s, thermo, clear=False):
        """Full 3-D flux fields on the ktot+1 half levels — the source
        arrays the reference saves as stats/cross/column
        (radiation_rrtmgp.cxx exec_all_stats save_stats_and_cross)."""
        T, wv_path, dry_path, lwp, rho, dz, exn = self._domain_paths(
            ctx, s, thermo)
        if clear:
            lwp = jnp.zeros_like(lwp)
        sfx = "_clear" if clear else ""
        out = {}
        t_sfc = (jnp.asarray(self.t_sfc, dtype=ctx.dtype)
                 if self.t_sfc > 0. else T[0])
        if self.sw_longwave:
            if self.kdist_lw is not None:
                lw_up, lw_dn = self._lw_table_flux(ctx, T, lwp, t_sfc,
                                                   thermo, s, clear=clear)
            else:
                lw_up, lw_dn = self._longwave(ctx, T, wv_path, dry_path,
                                              lwp, t_sfc, self._bg_lw())
            out["lw_flux_up" + sfx] = lw_up
            out["lw_flux_dn" + sfx] = lw_dn
        if self.sw_shortwave:
            mu0 = self._mu0_at(time_s)
            day = mu0 > 0.
            if self.kdist_sw is not None:
                sw_up, sw_dn, sw_dir = self._sw_table_flux(
                    ctx, T, lwp, jnp.asarray(mu0, ctx.dtype), thermo, s,
                    clear=clear)
            else:
                toa = (1365.0 * self.tsi_scaling * jnp.maximum(mu0, 0.)
                       * self._bg_sw_trans())
                sw_up, sw_dn, sw_dir = self._shortwave(
                    ctx, wv_path, dry_path, lwp,
                    jnp.asarray(mu0, ctx.dtype), toa)
            zero = jnp.zeros_like(sw_up)
            out["sw_flux_up" + sfx] = jnp.where(day, sw_up, zero)
            out["sw_flux_dn" + sfx] = jnp.where(day, sw_dn, zero)
            out["sw_flux_dn_dir" + sfx] = jnp.where(day, sw_dir, zero)
        return out

    def get_surface_radiation(self):
        """Fallback zeros; the live planes reach the land-surface scheme
        through aux["{sw,lw}_flux_{up,dn}_sfc"] inside the same trace."""
        z = np.zeros((self.grid.jtot, self.grid.itot))
        return {"sw_flux_dn": z, "sw_flux_up": z,
                "lw_flux_dn": z, "lw_flux_up": z}
