"""RRTMGP k-distribution: loader, (T, p, eta) interpolation, g-point LW
solve, and dt_rad gating with flux hold."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.ops.rrtmgp_optics import (KDistribution, col_amounts,
                                           TOTPLNK_T0, TOTPLNK_DT)

SIGMA = 5.670374419e-8


def synthetic_lw_vars(k0=(2e-28, 4e-28, 1e-28, 3e-28), k_slope_t=0.0,
                      band_frac=(0.4, 0.6)):
    """A schema-faithful synthetic coefficients_lw table: 2 gases
    (h2o key in both bands; co2 the second key species of band 0),
    2 bands x 2 g-points, descending press_ref, troposphere split.
    totplnk(T, b) = band_frac[b]*sigma*T^4 and plank_fraction = 1/2 per
    g-point, so the summed Planck source is exactly sigma*T^4."""
    n_temp, n_press, n_eta, n_gpt, n_bnd = 4, 8, 3, 4, 2
    temp_ref = np.linspace(160., 340., n_temp)
    press_ref = np.geomspace(1.1e5, 10., n_press)   # descending like the files
    press_ref_trop = 9000.0

    kmajor = np.zeros((n_temp, n_press + 1, n_eta, n_gpt))
    for g in range(n_gpt):
        for jt in range(n_temp):
            kmajor[jt, :, :, g] = k0[g] * (1. + k_slope_t * jt)

    nT_pl = 200
    Ts = TOTPLNK_T0 + TOTPLNK_DT * np.arange(nT_pl)
    totplnk = np.empty((nT_pl, n_bnd))
    for b in range(n_bnd):
        totplnk[:, b] = band_frac[b] * SIGMA * Ts ** 4
    planck_frac = np.full((n_temp, n_press + 1, n_eta, n_gpt), 0.5)

    key_species = np.zeros((n_bnd, 2, 2), dtype=np.int32)
    key_species[0, :, 0] = 1   # h2o
    key_species[0, :, 1] = 2   # co2
    key_species[1, :, 0] = 1   # h2o only
    band2gpt = np.array([[1, 2], [3, 4]], dtype=np.int32)

    vmr_ref = np.ones((n_temp, 3, 2))
    vmr_ref[:, 2, :] = 400e-6   # co2 reference vmr

    return {
        "gas_names": ["h2o", "co2"],
        "key_species": key_species,
        "bnd_limits_gpt": band2gpt,
        "press_ref": press_ref,
        "temp_ref": temp_ref,
        "press_ref_trop": np.float64(press_ref_trop),
        "vmr_ref": vmr_ref,
        "kmajor": kmajor,
        "totplnk": totplnk,
        "plank_fraction": planck_frac,
    }


def test_loader_from_file(tmp_path):
    """Write the synthetic table through the NetCDF shim with the exact
    rte-rrtmgp variable names/layout and load it back."""
    from microhh_tpu.utils import nc
    v = synthetic_lw_vars()
    path = str(tmp_path / "coefficients_lw.nc")
    f = nc.Dataset(path, "w")
    dims = {"absorber": 2, "string_len": 32, "temperature": 4,
            "pressure": 8, "pressure1": 9, "mixing_fraction": 3, "gpt": 4,
            "bnd": 2, "pair": 2, "atmos_layer": 2, "absorber_ext": 3,
            "temperature_Planck": 200}
    for name, n in dims.items():
        f.createDimension(name, n)
    names = np.zeros((2, 32), dtype="S1")
    for i, g in enumerate(["h2o", "co2"]):
        for j, c in enumerate(g):
            names[i, j] = c.encode()
    f.createVariable("gas_names", "S1", ("absorber", "string_len"))[:] = names
    f.createVariable("key_species", "i4", ("bnd", "atmos_layer", "pair"))[:] = v["key_species"]
    f.createVariable("bnd_limits_gpt", "i4", ("bnd", "pair"))[:] = v["bnd_limits_gpt"]
    f.createVariable("press_ref", "f8", ("pressure",))[:] = v["press_ref"]
    f.createVariable("temp_ref", "f8", ("temperature",))[:] = v["temp_ref"]
    f.createVariable("press_ref_trop", "f8", ())[...] = v["press_ref_trop"]
    f.createVariable("vmr_ref", "f8", ("temperature", "absorber_ext", "atmos_layer"))[:] = v["vmr_ref"]
    f.createVariable("kmajor", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["kmajor"]
    f.createVariable("totplnk", "f8", ("temperature_Planck", "bnd"))[:] = v["totplnk"]
    f.createVariable("plank_fraction", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["plank_fraction"]
    f.close()

    kd = KDistribution(path)
    assert kd.is_lw
    assert kd.gas_names == ["h2o", "co2"]
    assert kd.n_gpt == 4
    assert list(kd.gpt_band) == [0, 0, 1, 1]
    assert kd.press_ref_trop == 9000.0


def test_tau_constant_k():
    """With kmajor constant per g-point the trilinear weights must sum to
    one: tau == k0 * col_mix exactly, for both key-species bands."""
    kd = KDistribution.from_vars(synthetic_lw_vars())
    nlay = 6
    play = jnp.asarray(np.geomspace(9.8e4, 100., nlay))
    tlay = jnp.asarray(np.linspace(290., 210., nlay))
    qv = jnp.asarray(np.geomspace(8e-3, 1e-6, nlay))
    plev = jnp.asarray(np.geomspace(1.0e5, 80., nlay + 1))
    col_dry, cols = col_amounts(play, plev, qv, {"co2": 400e-6})
    idx = kd.interp_indices(play, tlay)

    # band 1 (g-points 2,3): h2o only -> col_mix = col_h2o
    tau_g2 = np.asarray(kd.tau_gpt(jnp.int32(2), idx, cols))
    expect = 1e-28 * np.asarray(cols["h2o"])
    assert np.allclose(tau_g2, expect, rtol=1e-12)

    # band 0 (g-points 0,1): h2o+co2 pair, col_mix = h2o + r*co2 with
    # r = vmr_ref ratio = 1/400e-6
    r = 1. / 400e-6
    cm = np.asarray(cols["h2o"]) + r * np.asarray(cols["co2"])
    tau_g0 = np.asarray(kd.tau_gpt(jnp.int32(0), idx, cols))
    assert np.allclose(tau_g0, 2e-28 * cm, rtol=1e-12)


def test_tau_temperature_interp():
    """kmajor linear in the temperature index: the interpolated k must be
    k0*(1 + slope*(jtemp + ftemp))."""
    kd = KDistribution.from_vars(synthetic_lw_vars(k_slope_t=0.1))
    nlay = 5
    play = jnp.asarray(np.geomspace(9e4, 200., nlay))
    tlay = jnp.asarray(np.linspace(300., 200., nlay))
    qv = jnp.full(nlay, 1e-3)
    plev = jnp.asarray(np.geomspace(1.0e5, 150., nlay + 1))
    _, cols = col_amounts(play, plev, qv, {"co2": 400e-6})
    idx = kd.interp_indices(play, tlay)
    jt = np.asarray(idx["jtemp"])
    ft = np.asarray(idx["ftemp"])
    tau = np.asarray(kd.tau_gpt(jnp.int32(2), idx, cols))
    expect = 1e-28 * (1. + 0.1 * (jt + ft)) * np.asarray(cols["h2o"])
    assert np.allclose(tau, expect, rtol=1e-10)


def _rad_model(tmp_path, dt_rad=0., with_tables=True):
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model

    ini = Ini("""
[grid]
itot=8
jtot=8
ktot=12
xsize=3200.
ysize=3200.
zsize=3000.
swspatialorder=2
[advec]
swadvec=2
cflmax=1.2
[diff]
swdiff=smag2
dnmax=0.3
[thermo]
swthermo=moist
swbasestate=anelastic
pbot=101325.
thvref0=300.
[radiation]
swradiation=rrtmgp
emis_sfc=0.97
sfc_alb_dir=0.2
sfc_alb_dif=0.2
swfixedsza=true
sza=0.5
t_sfc=290.
dt_rad=%s
swshortwave=false
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
endtime=3600
savetime=3600
dt=6.
""" % dt_rad)
    wd = str(tmp_path)
    # minimal input profiles (moist basestate needs thl/qt)
    from microhh_tpu.utils import nc as ncmod
    ktot, zsize = 12, 3000.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    fi = ncmod.Dataset(os.path.join(wd, "radcase_input.nc"), "w")
    fi.createDimension("z", ktot)
    fi.createVariable("z", "f8", ("z",))[:] = z
    gi = fi.createGroup("init")
    gi.createVariable("thl", "f8", ("z",))[:] = 290. + 0.003 * z
    gi.createVariable("qt", "f8", ("z",))[:] = 8e-3 * np.exp(-z / 2000.)
    fi.close()
    if with_tables:
        # synthetic tables into the case dir; the loader must pick them up
        import shutil
        from microhh_tpu.utils import nc
        v = synthetic_lw_vars()
        kd_path = os.path.join(wd, "coefficients_lw.nc")
        _write_lw_file(kd_path, v)
    m = Model(ini, "run", "radcase", workdir=wd)
    m.finish_setup()
    return m


def _write_lw_file(path, v):
    from microhh_tpu.utils import nc
    f = nc.Dataset(path, "w")
    dims = {"absorber": 2, "string_len": 32, "temperature": 4,
            "pressure": 8, "pressure1": 9, "mixing_fraction": 3, "gpt": 4,
            "bnd": 2, "pair": 2, "atmos_layer": 2, "absorber_ext": 3,
            "temperature_Planck": 200}
    for name, n in dims.items():
        f.createDimension(name, n)
    names = np.zeros((2, 32), dtype="S1")
    for i, g in enumerate(["h2o", "co2"]):
        for j, c in enumerate(g):
            names[i, j] = c.encode()
    f.createVariable("gas_names", "S1", ("absorber", "string_len"))[:] = names
    f.createVariable("key_species", "i4", ("bnd", "atmos_layer", "pair"))[:] = v["key_species"]
    f.createVariable("bnd_limits_gpt", "i4", ("bnd", "pair"))[:] = v["bnd_limits_gpt"]
    f.createVariable("press_ref", "f8", ("pressure",))[:] = v["press_ref"]
    f.createVariable("temp_ref", "f8", ("temperature",))[:] = v["temp_ref"]
    f.createVariable("press_ref_trop", "f8", ())[...] = v["press_ref_trop"]
    f.createVariable("vmr_ref", "f8", ("temperature", "absorber_ext", "atmos_layer"))[:] = v["vmr_ref"]
    f.createVariable("kmajor", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["kmajor"]
    f.createVariable("totplnk", "f8", ("temperature_Planck", "bnd"))[:] = v["totplnk"]
    f.createVariable("plank_fraction", "f8", ("temperature", "pressure1", "mixing_fraction", "gpt"))[:] = v["plank_fraction"]
    f.close()


def test_lw_table_isothermal_olr(tmp_path):
    """Isothermal column at T0 with a black surface at T0: every source
    equals sigma*T0^4, so the g-point-summed OLR must equal sigma*T0^4
    regardless of the optical depths — a closed-form check of the whole
    loader + interpolation + g-point solver chain."""
    m = _rad_model(tmp_path, with_tables=True)
    assert m.radiation.kdist_lw is not None
    m.radiation.emis_sfc = 1.0
    T0 = 280.
    m.radiation.t_sfc = T0
    # force an isothermal column: thl such that T == T0 via exner
    ctx = m.ctx
    ks, ke = ctx.ks, ctx.ke
    exn = np.asarray(m.thermo.exnref)[ks:ke]
    s = {n: jnp.zeros((m.grid.kcells, 8, 8)) for n in ("u", "v", "thl", "qt")}
    s["w"] = jnp.zeros((m.grid.kcells, 8, 8))
    s["thl"] = s["thl"].at[ks:ke].set(
        jnp.asarray((T0 / exn)[:, None, None] * np.ones((ke - ks, 8, 8))))
    s["qt"] = s["qt"].at[ks:ke].set(1e-3)
    # make the background column isothermal at T0 too
    m.radiation.bg["T"][:] = T0

    T, wv, dp, lwp, rho, dz, exn_j = m.radiation._domain_paths(ctx, s, m.thermo)
    up, dn = m.radiation._lw_table_flux(ctx, T, lwp, jnp.asarray(T0), m.thermo, s)
    olr = float(np.asarray(up[-1]).mean())
    # the domain-top OLR of an isothermal column below an isothermal
    # background is sigma*T0^4 (down-welling included in the balance)
    assert abs(olr - SIGMA * T0 ** 4) / (SIGMA * T0 ** 4) < 1e-6, olr
    # downward flux at the surface likewise approaches sigma*T0^4 times
    # the (1 - transmittance) emission; with the background it is bounded
    assert float(np.asarray(dn[0]).mean()) <= SIGMA * T0 ** 4 + 1e-6


def test_dt_rad_hold(tmp_path):
    """dt_rad gating: within one radiation interval the tendency is HELD
    (state changes do not change it); past the interval it refreshes."""
    m = _rad_model(tmp_path, dt_rad=600., with_tables=False)
    rad = m.radiation
    assert rad.dt_rad == 600.
    ctx = m.ctx
    ks, ke = ctx.ks, ctx.ke
    kc = m.grid.kcells

    def mkstate(pert):
        s = {n: jnp.zeros((kc, 8, 8)) for n in ("u", "v", "w", "thl", "qt")}
        s["thl"] = s["thl"].at[ks:ke].set(290. + pert)
        s["qt"] = s["qt"].at[ks:ke].set(5e-3)
        return s

    sfc = rad.init_state({}, ctx, np.float64)
    sfc = {k: jnp.asarray(v) for k, v in sfc.items()}
    t0 = {"thl": jnp.zeros((kc, 8, 8))}

    # first call at t=0 computes
    t1, sfc = rad.exec(ctx, mkstate(0.), dict(t0), sfc, {}, 0., m.thermo)
    tend1 = np.asarray(t1["thl"])
    # different state, still inside the interval -> held
    t2, sfc = rad.exec(ctx, mkstate(5.), dict(t0), sfc, {}, 300., m.thermo)
    tend2 = np.asarray(t2["thl"])
    assert np.array_equal(tend1, tend2)
    # past the interval -> recomputed, different
    t3, sfc = rad.exec(ctx, mkstate(5.), dict(t0), sfc, {}, 600., m.thermo)
    tend3 = np.asarray(t3["thl"])
    assert not np.array_equal(tend1, tend3)
