"""Reference-kernel parity: RRTMGP gas optics (major + minor) and LUT
cloud optics, vs the transliterated rte-rrtmgp kernels in
tests/oracle_ref/rrtmgp_ref.py, on fully-random synthetic tables that
exercise both atmospheres, all key-species cases (pair / single / none),
identifier-mapped minor gases, density/scaling-gas/complement scaling, and
both cloud phases."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.ops.rrtmgp_optics import KDistribution, CloudOptics
from oracle_ref import rrtmgp_ref as ref

GASES = ["h2o", "co2", "o3", "n2o", "ch4"]


def synthetic_kdist(rng, lw=True):
    n_temp, n_press, n_eta = 5, 10, 5
    n_bnd, gpt_per = 2, 3
    n_gpt = n_bnd * gpt_per

    v = {
        "gas_names": list(GASES),
        "bnd_limits_gpt": np.array([[1, 3], [4, 6]], dtype=np.int32),
        "press_ref": np.geomspace(1.1e5, 10., n_press),
        "temp_ref": np.linspace(160., 340., n_temp),
        "press_ref_trop": np.float64(9000.),
        "kmajor": rng.rand(n_temp, n_press + 1, n_eta, n_gpt) * 1e-27,
    }
    ks = np.zeros((n_bnd, 2, 2), dtype=np.int32)
    ks[0, 0] = (1, 2)     # band0 lower: h2o/co2 pair
    ks[0, 1] = (1, 3)     # band0 upper: h2o/o3 pair
    ks[1, 0] = (1, 0)     # band1 lower: h2o alone
    ks[1, 1] = (0, 0)     # band1 upper: no key species
    v["key_species"] = ks
    vmr = 0.5 + rng.rand(n_temp, len(GASES) + 1, 2)
    v["vmr_ref"] = vmr

    # minor gases: identifiers map "ch4x" -> gas ch4
    v["gas_minor"] = ["n2o", "ch4", "co2"]
    v["identifier_minor"] = ["n2o", "ch4x", "co2"]
    v["minor_gases_lower"] = ["n2o", "ch4x", "co2"]
    v["minor_limits_gpt_lower"] = np.array([[1, 3], [2, 6], [4, 6]],
                                           dtype=np.int32)
    v["minor_scales_with_density_lower"] = np.array([1, 1, 0], dtype=np.int8)
    v["scale_by_complement_lower"] = np.array([0, 0, 0], dtype=np.int8)
    v["scaling_gas_lower"] = ["", "h2o", ""]
    v["kminor_start_lower"] = np.array([1, 4, 9], dtype=np.int32)
    v["kminor_lower"] = rng.rand(n_temp, n_eta, 11) * 1e-28

    v["minor_gases_upper"] = ["n2o"]
    v["minor_limits_gpt_upper"] = np.array([[1, 2]], dtype=np.int32)
    v["minor_scales_with_density_upper"] = np.array([1], dtype=np.int8)
    v["scale_by_complement_upper"] = np.array([1], dtype=np.int8)
    v["scaling_gas_upper"] = ["h2o"]
    v["kminor_start_upper"] = np.array([1], dtype=np.int32)
    v["kminor_upper"] = rng.rand(n_temp, n_eta, 2) * 1e-28

    if lw:
        nT_pl = 200
        v["totplnk"] = rng.rand(nT_pl, n_bnd) * 100.
        v["plank_fraction"] = rng.rand(n_temp, n_press + 1, n_eta, n_gpt)
    else:
        v["solar_source"] = rng.rand(n_gpt) * 200.
        v["rayl_lower"] = rng.rand(n_temp, n_eta, n_gpt) * 1e-30
        v["rayl_upper"] = rng.rand(n_temp, n_eta, n_gpt) * 1e-30

    # the oracle-side dict view
    kd_ref = {
        "gas_names": v["gas_names"],
        "key_species": ks,
        "temp_ref": v["temp_ref"],
        "press_ref": v["press_ref"],
        "press_ref_trop": 9000.,
        "vmr_ref": vmr,
        "n_eta": n_eta,
        "kmajor": v["kmajor"],
        "minor": {
            "lower": {
                "gases": ["n2o", "ch4", "co2"],
                "limits": [(1, 3), (2, 6), (4, 6)],
                "scales_with_density": [True, True, False],
                "scale_by_complement": [False, False, False],
                "scaling_gas": ["", "h2o", ""],
                "kminor_start": [1, 4, 9],
                "kminor": v["kminor_lower"],
            },
            "upper": {
                "gases": ["n2o"],
                "limits": [(1, 2)],
                "scales_with_density": [True],
                "scale_by_complement": [True],
                "scaling_gas": ["h2o"],
                "kminor_start": [1],
                "kminor": v["kminor_upper"],
            },
        },
    }
    if lw:
        kd_ref["plank_fraction"] = v["plank_fraction"]
    else:
        kd_ref["rayl_lower"] = v["rayl_lower"]
        kd_ref["rayl_upper"] = v["rayl_upper"]
    return v, kd_ref


def sample_column(rng, nlay=12):
    play = np.geomspace(1.0e5, 30., nlay)           # spans both atmospheres
    tlay = np.linspace(295., 200., nlay) + rng.randn(nlay)
    col_dry = np.geomspace(3e22, 1e20, nlay)
    cols = {g: col_dry * (10 ** rng.uniform(-7, -2)) * (1 + rng.rand(nlay))
            for g in GASES}
    return play, tlay, col_dry, cols


@pytest.mark.parametrize("lw", [True, False])
def test_gas_optics_matches_rrtmgp_kernels(lw):
    rng = np.random.RandomState(3 + lw)
    v, kd_ref = synthetic_kdist(rng, lw=lw)
    kd = KDistribution.from_vars(v)
    assert kd.is_lw == lw
    assert set(kd.minor.keys()) == {"lower", "upper"}

    play, tlay, col_dry, cols = sample_column(rng)
    playj = jnp.asarray(play)
    tlayj = jnp.asarray(tlay)
    cdj = jnp.asarray(col_dry)
    colsj = {k: jnp.asarray(c) for k, c in cols.items()}
    idx = kd.interp_indices(playj, tlayj)

    gpt_band = kd.gpt_band
    for g in range(kd.n_gpt):
        mine = np.asarray(kd.tau_gpt(jnp.int32(g), idx, colsj, cdj,
                                     playj, tlayj))
        if lw:
            pf_mine = np.asarray(kd.planck_gpt(jnp.int32(g), idx, colsj,
                                               tlayj))
        else:
            ray_mine = np.asarray(kd.rayleigh_gpt(jnp.int32(g), idx, colsj,
                                                  cdj))
        for l in range(len(play)):
            st = ref.interpolation_cell(kd_ref, play[l], tlay[l],
                                        gpt_band[g],
                                        {k: c[l] for k, c in cols.items()})
            want = (ref.tau_major_cell(kd_ref, st, g)
                    + ref.tau_minor_cell(kd_ref, st, g,
                                         {k: c[l] for k, c in cols.items()},
                                         col_dry[l], play[l], tlay[l]))
            assert mine[l] == pytest.approx(want, rel=1e-12), (g, l)
            if lw:
                # planck_gpt = frac * totplnk(T, band); divide the band
                # emission back out to isolate the interpolated fraction
                from microhh_tpu.ops.rrtmgp_optics import TOTPLNK_T0, TOTPLNK_DT
                tp = v["totplnk"]
                tt = min(max(tlay[l], TOTPLNK_T0),
                         TOTPLNK_T0 + TOTPLNK_DT * (tp.shape[0] - 1))
                ft = (tt - TOTPLNK_T0) / TOTPLNK_DT
                jt = min(int(ft), tp.shape[0] - 2)
                ft -= jt
                b_band = ((1. - ft) * tp[jt, gpt_band[g]]
                          + ft * tp[jt + 1, gpt_band[g]])
                want_pf = ref.planck_frac_cell(kd_ref, st, g) * b_band
                assert pf_mine[l] == pytest.approx(want_pf, rel=1e-12)
            else:
                want_ray = ref.rayleigh_cell(kd_ref, st, g, col_dry[l])
                assert ray_mine[l] == pytest.approx(want_ray, rel=1e-12)


def test_minor_contribution_is_nonzero_and_off_when_gas_missing():
    rng = np.random.RandomState(11)
    v, kd_ref = synthetic_kdist(rng, lw=True)
    kd = KDistribution.from_vars(v)
    play, tlay, col_dry, cols = sample_column(rng)
    playj, tlayj = jnp.asarray(play), jnp.asarray(tlay)
    cdj = jnp.asarray(col_dry)
    colsj = {k: jnp.asarray(c) for k, c in cols.items()}
    idx = kd.interp_indices(playj, tlayj)
    with_minor = np.asarray(kd.tau_gpt(jnp.int32(1), idx, colsj, cdj,
                                       playj, tlayj))
    without = np.asarray(kd.tau_gpt(jnp.int32(1), idx, colsj))
    assert np.all(with_minor > without)
    # minor gases absent from the gas dict contribute zero
    colsj_nomin = {k: colsj[k] for k in ("h2o", "co2", "o3")}
    reduced = np.asarray(kd.tau_gpt(jnp.int32(1), idx, colsj_nomin, cdj,
                                    playj, tlayj))
    assert np.all(reduced < with_minor)


def test_cloud_optics_matches_table_kernel():
    rng = np.random.RandomState(7)
    n_band, nsl, nsi, nrgh = 4, 8, 6, 3
    v = {
        "radliq_lwr": 2.5, "radliq_upr": 21.5, "radliq_fac": 0.,
        "radice_lwr": 10., "radice_upr": 180., "radice_fac": 0.,
        "lut_extliq": rng.rand(n_band, nsl) * 0.1,
        "lut_ssaliq": 0.4 + 0.5 * rng.rand(n_band, nsl),
        "lut_asyliq": 0.7 + 0.2 * rng.rand(n_band, nsl),
        "lut_extice": rng.rand(nrgh, n_band, nsi) * 0.1,
        "lut_ssaice": 0.4 + 0.5 * rng.rand(nrgh, n_band, nsi),
        "lut_asyice": 0.7 + 0.2 * rng.rand(nrgh, n_band, nsi),
    }
    co = CloudOptics.from_vars(v)
    n = 40
    clwp = np.where(rng.rand(n) < 0.3, 0., rng.rand(n) * 300.)
    ciwp = np.where(rng.rand(n) < 0.3, 0., rng.rand(n) * 100.)
    rel = np.clip(2.5 + 19. * rng.rand(n), 2.5, 21.5)
    rei = np.clip(10. + 170. * rng.rand(n), 10., 180.)
    tau, taussa, taussag = (np.asarray(a) for a in co.cloud_optics(
        jnp.asarray(clwp), jnp.asarray(ciwp), jnp.asarray(rel),
        jnp.asarray(rei)))
    extl, ssal, asyl = (v["lut_extliq"].T, v["lut_ssaliq"].T,
                        v["lut_asyliq"].T)
    exti, ssai, asyi = (v["lut_extice"][0].T, v["lut_ssaice"][0].T,
                        v["lut_asyice"][0].T)
    for i in range(n):
        lt, lts, ltsg = ref.cloud_from_table_cell(
            clwp[i], rel[i], 2.5, 21.5, extl, ssal, asyl)
        it_, its, itsg = ref.cloud_from_table_cell(
            ciwp[i], rei[i], 10., 180., exti, ssai, asyi)
        np.testing.assert_allclose(tau[i], lt + it_, rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(taussa[i], lts + its, rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(taussag[i], ltsg + itsg, rtol=1e-12, atol=1e-300)


# ---------------------------------------------------------------------------
# integration: full g-point LW/SW solves with minor gases + cloud optics
# ---------------------------------------------------------------------------

def _write_kdist_file(path, v):
    from microhh_tpu.utils import nc
    f = nc.Dataset(path, "w")
    n_gas = len(v["gas_names"])
    n_temp, n_press1, n_eta, n_gpt = v["kmajor"].shape
    dims = {"absorber": n_gas, "string_len": 32, "temperature": n_temp,
            "pressure": n_press1 - 1, "pressure1": n_press1,
            "mixing_fraction": n_eta, "gpt": n_gpt, "bnd": 2, "pair": 2,
            "atmos_layer": 2, "absorber_ext": n_gas + 1,
            "minor_absorber": 3,
            "minor_absorber_intervals_lower": 3,
            "minor_absorber_intervals_upper": 1,
            "contributors_lower": v["kminor_lower"].shape[2],
            "contributors_upper": v["kminor_upper"].shape[2]}
    if "totplnk" in v:
        dims["temperature_Planck"] = v["totplnk"].shape[0]
    for name, n in dims.items():
        f.createDimension(name, n)

    def strvar(name, dim, values):
        arr = np.zeros((len(values), 32), dtype="S1")
        for i, s_ in enumerate(values):
            for j, c in enumerate(s_):
                arr[i, j] = c.encode()
        f.createVariable(name, "S1", (dim, "string_len"))[:] = arr

    strvar("gas_names", "absorber", v["gas_names"])
    strvar("gas_minor", "minor_absorber", v["gas_minor"])
    strvar("identifier_minor", "minor_absorber", v["identifier_minor"])
    strvar("minor_gases_lower", "minor_absorber_intervals_lower",
           v["minor_gases_lower"])
    strvar("minor_gases_upper", "minor_absorber_intervals_upper",
           v["minor_gases_upper"])
    strvar("scaling_gas_lower", "minor_absorber_intervals_lower",
           v["scaling_gas_lower"])
    strvar("scaling_gas_upper", "minor_absorber_intervals_upper",
           v["scaling_gas_upper"])
    f.createVariable("key_species", "i4", ("bnd", "atmos_layer", "pair"))[:] = v["key_species"]
    f.createVariable("bnd_limits_gpt", "i4", ("bnd", "pair"))[:] = v["bnd_limits_gpt"]
    f.createVariable("press_ref", "f8", ("pressure",))[:] = v["press_ref"]
    f.createVariable("temp_ref", "f8", ("temperature",))[:] = v["temp_ref"]
    f.createVariable("press_ref_trop", "f8", ())[...] = v["press_ref_trop"]
    f.createVariable("vmr_ref", "f8", ("temperature", "absorber_ext", "atmos_layer"))[:] = v["vmr_ref"]
    f.createVariable("kmajor", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["kmajor"]
    for nm, dim in (("lower", "minor_absorber_intervals_lower"),
                    ("upper", "minor_absorber_intervals_upper")):
        f.createVariable("minor_limits_gpt_" + nm, "i4", (dim, "pair"))[:] = v["minor_limits_gpt_" + nm]
        f.createVariable("minor_scales_with_density_" + nm, "i1", (dim,))[:] = v["minor_scales_with_density_" + nm]
        f.createVariable("scale_by_complement_" + nm, "i1", (dim,))[:] = v["scale_by_complement_" + nm]
        f.createVariable("kminor_start_" + nm, "i4", (dim,))[:] = v["kminor_start_" + nm]
        f.createVariable("kminor_" + nm, "f8",
                         ("temperature", "mixing_fraction", "contributors_" + nm))[:] = v["kminor_" + nm]
    if "totplnk" in v:
        f.createVariable("totplnk", "f8", ("temperature_Planck", "bnd"))[:] = v["totplnk"]
        f.createVariable("plank_fraction", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["plank_fraction"]
    else:
        f.createVariable("solar_source", "f8", ("gpt",))[:] = v["solar_source"]
        f.createVariable("rayl_lower", "f8", ("temperature", "mixing_fraction", "gpt"))[:] = v["rayl_lower"]
        f.createVariable("rayl_upper", "f8", ("temperature", "mixing_fraction", "gpt"))[:] = v["rayl_upper"]
    f.close()


def _write_cloud_file(path, rng, n_band=2, solar=False):
    """Synthetic LUT cloud optics: LW-like (absorptive, low ssa) or
    SW-like (conservatively scattering, ssa ~0.999 as in the real data)."""
    from microhh_tpu.utils import nc
    nsl, nsi, nrgh = 8, 6, 3
    f = nc.Dataset(path, "w")
    for name, n in (("nband", n_band), ("nrghice", nrgh),
                    ("nsize_liq", nsl), ("nsize_ice", nsi), ("pair", 2)):
        f.createDimension(name, n)
    f.createVariable("bnd_limits_wavenumber", "f8", ("nband", "pair"))[:] = \
        np.tile([100., 1000.], (n_band, 1))
    for nm, val in (("radliq_lwr", 2.5), ("radliq_upr", 21.5),
                    ("radliq_fac", 0.), ("radice_lwr", 10.),
                    ("radice_upr", 180.), ("radice_fac", 0.)):
        f.createVariable(nm, "f8", ())[...] = val
    ssa_lo, ssa_sp = (0.995, 0.0045) if solar else (0.5, 0.4)
    f.createVariable("lut_extliq", "f8", ("nband", "nsize_liq"))[:] = \
        0.05 + 0.05 * rng.rand(n_band, nsl)
    f.createVariable("lut_ssaliq", "f8", ("nband", "nsize_liq"))[:] = \
        ssa_lo + ssa_sp * rng.rand(n_band, nsl)
    f.createVariable("lut_asyliq", "f8", ("nband", "nsize_liq"))[:] = \
        0.8 + 0.1 * rng.rand(n_band, nsl)
    f.createVariable("lut_extice", "f8", ("nrghice", "nband", "nsize_ice"))[:] = \
        0.02 + 0.02 * rng.rand(nrgh, n_band, nsi)
    f.createVariable("lut_ssaice", "f8", ("nrghice", "nband", "nsize_ice"))[:] = \
        ssa_lo + ssa_sp * rng.rand(nrgh, n_band, nsi)
    f.createVariable("lut_asyice", "f8", ("nrghice", "nband", "nsize_ice"))[:] = \
        0.75 + 0.15 * rng.rand(nrgh, n_band, nsi)
    f.close()


def test_full_lw_sw_with_minors_and_clouds(tmp_path):
    """End-to-end: coefficient + cloud files on disk drive the full
    g-point LW/SW path through Model; a cloudy column must dim the OLR and
    brighten the SW reflection relative to the same column without cloud
    optics loaded."""
    import os
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    from microhh_tpu.utils import nc as ncmod

    rng = np.random.RandomState(2)
    v_lw, _ = synthetic_kdist(rng, lw=True)
    v_sw, _ = synthetic_kdist(rng, lw=False)
    # physically-monotone Planck data (the random tables of the parity
    # tests are fine for kernel parity but break the cloud-dims-the-OLR
    # physics asserted below)
    SIGMA = 5.670374419e-8
    from microhh_tpu.ops.rrtmgp_optics import TOTPLNK_T0, TOTPLNK_DT
    Ts = TOTPLNK_T0 + TOTPLNK_DT * np.arange(v_lw["totplnk"].shape[0])
    v_lw["totplnk"] = np.stack([0.4 * SIGMA * Ts ** 4,
                                0.6 * SIGMA * Ts ** 4], axis=1)
    v_lw["plank_fraction"][:] = 1. / 3.    # 3 g-points per band
    wd = str(tmp_path)
    _write_kdist_file(os.path.join(wd, "coefficients_lw.nc"), v_lw)
    _write_kdist_file(os.path.join(wd, "coefficients_sw.nc"), v_sw)
    _write_cloud_file(os.path.join(wd, "cloud_coefficients_lw.nc"), rng)
    _write_cloud_file(os.path.join(wd, "cloud_coefficients_sw.nc"), rng,
                      solar=True)

    ktot, zsize = 12, 3000.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    fi = ncmod.Dataset(os.path.join(wd, "radc_input.nc"), "w")
    fi.createDimension("z", ktot)
    fi.createVariable("z", "f8", ("z",))[:] = z
    gi = fi.createGroup("init")
    gi.createVariable("thl", "f8", ("z",))[:] = 290. + 0.003 * z
    gi.createVariable("qt", "f8", ("z",))[:] = 9e-3 * np.exp(-z / 2000.)
    fi.close()

    ini = Ini("""
[grid]
itot=4
jtot=4
ktot=12
xsize=1600.
ysize=1600.
zsize=3000.
swspatialorder=2
[advec]
swadvec=2
[diff]
swdiff=smag2
[thermo]
swthermo=moist
swbasestate=anelastic
pbot=101325.
[radiation]
swradiation=rrtmgp
emis_sfc=0.97
sfc_alb_dir=0.2
sfc_alb_dif=0.2
swfixedsza=true
sza=0.5
t_sfc=290.
[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=0.1
sbot[qt]=4e-5
stop[thl]=0.003
stop[qt]=0.
swboundary=surface
z0m=0.1
z0h=0.1
[fields]
visc=1.e-5
svisc=1.e-5
[time]
starttime=0
endtime=60
savetime=60
dt=6.
""")
    m = Model(ini, "run", "radc", workdir=wd)
    m.finish_setup()
    rad = m.radiation
    assert rad.kdist_lw is not None and rad.kdist_lw.minor
    assert rad.cloud_lw is not None and rad.cloud_sw is not None

    ctx = m.ctx
    ks, ke = ctx.ks, ctx.ke
    kc = m.grid.kcells
    s = {n: jnp.zeros((kc, 4, 4)) for n in ("u", "v", "w", "thl", "qt")}
    exn = np.asarray(m.thermo.exnref)[ks:ke]
    # stratified column: cloud top colder than the surface
    T_prof = np.linspace(292., 268., ktot)
    s["thl"] = s["thl"].at[ks:ke].set(
        jnp.asarray((T_prof / exn)[:, None, None] * np.ones((ktot, 4, 4))))
    # a saturated mid-layer slab -> liquid cloud
    qt = 5e-3 * np.ones((ktot, 4, 4))
    qt[4:7] = 0.02
    s["qt"] = s["qt"].at[ks:ke].set(jnp.asarray(qt))

    clwp, ciwp, rel, rei = rad._cloud_fields(ctx, s, m.thermo)
    assert float(jnp.max(clwp)) > 1.          # the slab really is cloudy

    T, wv, dp_, lwp, rho, dzj, exn_j = rad._domain_paths(ctx, s, m.thermo)
    up_c, dn_c = rad._lw_table_flux(ctx, T, lwp, jnp.asarray(290.), m.thermo, s)
    swu_c, swd_c, _ = rad._sw_table_flux(ctx, T, lwp, jnp.asarray(0.8),
                                         m.thermo, s)
    # detach cloud optics -> clear-sky paths
    rad.cloud_lw = rad.cloud_sw = None
    rad_lwp0 = jnp.zeros_like(lwp)
    up_0, dn_0 = rad._lw_table_flux(ctx, T, rad_lwp0, jnp.asarray(290.),
                                    m.thermo, s)
    swu_0, swd_0, _ = rad._sw_table_flux(ctx, T, rad_lwp0, jnp.asarray(0.8),
                                         m.thermo, s)
    olr_c = float(jnp.mean(up_c[-1]))
    olr_0 = float(jnp.mean(up_0[-1]))
    assert np.isfinite(olr_c) and np.isfinite(olr_0)
    assert olr_c < olr_0                       # cloud dims the OLR
    assert float(jnp.mean(swu_c[-1])) > float(jnp.mean(swu_0[-1]))
    assert float(jnp.mean(swd_c[0])) < float(jnp.mean(swd_0[0]))
