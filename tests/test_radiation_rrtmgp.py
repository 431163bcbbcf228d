"""Interactive radiation (rrtmgp component, two-band stand-in optics):
full-model coupling, heating-rate signs, LSM coupling through aux."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=8
jtot=8
ktot=24
xsize=1600.
ysize=1600.
zsize=2400.
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
pbot=101500.
thvref0=300.

[radiation]
swradiation=rrtmgp
emis_sfc=0.98
sfc_alb_dir=0.2
sfc_alb_dif=0.25
sza=0.5
t_sfc=293.

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=0.05
stop[thl]=0.003
sbot[qt]=4.e-5
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
dt=2.
dtmax=5.
adaptivestep=true
"""


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from microhh_tpu.utils import nc
    wd = str(tmp_path_factory.mktemp("rrtmgp"))
    ktot = 24
    z = np.linspace(50., 2350., ktot)
    f = nc.Dataset(os.path.join(wd, "rad_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.009 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    # background column above the domain top ('radiation' group)
    r = f.createGroup("radiation")
    nbg = 10
    r.createDimension("lay", nbg)
    p_lay = np.geomspace(7.0e4, 1.0e3, nbg)
    r.createVariable("p_lay", "f8", ("lay",))[:] = p_lay
    r.createVariable("t_lay", "f8", ("lay",))[:] = np.linspace(265., 220., nbg)
    r.createVariable("h2o", "f8", ("lay",))[:] = np.geomspace(3e-3, 3e-6, nbg)
    f.close()
    with open(os.path.join(wd, "rad.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "rad", workdir=wd)
    m.finish_setup()
    return m


def test_background_column_loaded(model):
    assert model.radiation.bg is not None
    assert len(model.radiation.bg["p"]) == 10
    fdn = model.radiation._bg_lw()
    assert 20. < fdn < 320., fdn  # downwelling from the column above 700 hPa
    assert 0.8 < model.radiation._bg_sw_trans() <= 1.


def test_radiative_tendency_and_surface_fluxes(model):
    m = model
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend
    rng = np.random.RandomState(1)
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    thl = 290. + 0.004 * np.asarray(g.z)
    s["thl"] = s["thl"] + jnp.asarray(thl[:, None, None])
    # well below saturation everywhere: this check is for the CLEAR-sky
    # fluxes (a saturated column would legitimately cut sw_dn via the
    # two-stream cloud reflection)
    s["qt"] = s["qt"] + 0.002

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    aux = {}
    t2, _sfc = m.radiation.exec(ctx, s, t, {}, aux, 43200., m.thermo)

    tend = np.asarray(t2["thl"])[ks:ke]
    assert np.isfinite(tend).all()
    # clear sky: LW cooling through most of the column
    assert tend.mean() != 0.
    # surface fluxes land in aux for the land-surface scheme
    for key in ("sw_flux_dn_sfc", "sw_flux_up_sfc",
                "lw_flux_dn_sfc", "lw_flux_up_sfc"):
        assert key in aux
    sw_dn = np.asarray(aux["sw_flux_dn_sfc"])
    lw_dn = np.asarray(aux["lw_flux_dn_sfc"])
    mu0 = float(np.cos(0.5))
    assert 0.3 * 1365 * mu0 < sw_dn.mean() < 1365 * mu0
    assert 200. < lw_dn.mean() < 450.
    # surface SW reflection consistent with the direct albedo ~0.2-0.25
    ratio = np.asarray(aux["sw_flux_up_sfc"]).mean() / sw_dn.mean()
    assert 0.15 < ratio < 0.3, ratio


def test_cloud_shades_the_surface(model):
    m = model
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend
    base = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
            for n in m.fields.prognostic_names}
    thl = 290. + 0.004 * np.asarray(g.z)
    base["thl"] = base["thl"] + jnp.asarray(thl[:, None, None])

    clear = dict(base)
    clear["qt"] = clear["qt"] + 0.002
    cloudy = dict(base)
    qt0 = np.full(g.kcells, 0.002)
    qt0[ks + 14:ks + 18] = 0.018          # saturated layer aloft
    cloudy["qt"] = cloudy["qt"] + jnp.asarray(qt0[:, None, None])
    ql, _ = m.thermo.get_ql_qi(ctx, cloudy)
    assert np.asarray(ql).max() > 1e-4

    t0 = {n: jnp.zeros_like(v) for n, v in base.items()}
    aux_c, aux_k = {}, {}
    m.radiation.exec(ctx, clear, dict(t0), {}, aux_c, 43200., m.thermo)
    m.radiation.exec(ctx, cloudy, dict(t0), {}, aux_k, 43200., m.thermo)
    sw_clear = np.asarray(aux_c["sw_flux_dn_sfc"]).mean()
    sw_cloud = np.asarray(aux_k["sw_flux_dn_sfc"]).mean()
    assert sw_cloud < 0.6 * sw_clear, (sw_clear, sw_cloud)


def test_full_model_run(model):
    m = model
    m.build_step()
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    thl = 290. + 0.004 * np.asarray(g.z)
    s["thl"] = s["thl"] + jnp.asarray(thl[:, None, None])
    s["qt"] = s["qt"] + 0.006
    sfc_np = m.boundary.init_surface_state()
    sfc = {k: jnp.asarray(v) for k, v in sfc_np.items()}
    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    dt = jnp.asarray(2.0)
    for step in range(5):
        s, sfc, aux = m._step_fn(s, sfc, m.pres_params, dt,
                                    jnp.asarray(43200.))
    assert np.isfinite(np.asarray(s["thl"])).all()
    assert np.isfinite(np.asarray(s["w"])).all()


def test_flux_profiles_and_clearsky(model):
    """flux_profiles: all-sky vs clear-sky stats profiles
    (swclearskystats, radiation_rrtmgp.cxx:590,628-642)."""
    m = model
    g = m.grid
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    thl = 290. + 0.004 * np.asarray(g.z)
    s["thl"] = s["thl"] + jnp.asarray(thl[:, None, None])
    # saturated blob -> cloud in part of the column
    qt = np.full((g.kcells, g.jtot, g.itot), 0.002)
    qt[g.kstart + 6:g.kstart + 9] = 0.02
    s["qt"] = jnp.asarray(qt)

    allsky = m.radiation.flux_profiles(m.ctx, s, 43200., m.thermo)
    clear = m.radiation.flux_profiles(m.ctx, s, 43200., m.thermo, clear=True)
    for k in ("lw_flux_up", "lw_flux_dn", "sw_flux_up", "sw_flux_dn",
              "sw_flux_dn_dir"):
        assert k in allsky and np.isfinite(np.asarray(allsky[k])).all()
        assert np.asarray(allsky[k]).shape == (g.ktot + 1,)
    # the cloud shades the surface: clear-sky sw_dn at the ground exceeds
    # all-sky; the cloud changes the LW fluxes (surface lw_dn rises under
    # a low warm cloud)
    assert float(clear["sw_flux_dn_clear"][0]) > float(allsky["sw_flux_dn"][0])
    assert float(allsky["lw_flux_dn"][0]) > float(clear["lw_flux_dn_clear"][0])


def test_diffuse_filter(tmp_path):
    """swfilterdiffuse: iterated Gaussian smoothing of the surface diffuse
    SW conserves the mean and reduces the variance
    (radiation_rrtmgp.cxx:948-990)."""
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ini_txt = INI.replace("t_sfc=293.",
                          "t_sfc=293.\nswfilterdiffuse=1\nsigma_filter=400.")
    ktot = 24
    z = np.linspace(50., 2350., ktot)
    f = nc.Dataset(os.path.join(wd, "rad_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.009 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "rad.ini"), "w") as fh:
        fh.write(ini_txt)
    m = Model(Ini(ini_txt), "run", "rad", workdir=wd)
    m.finish_setup()
    assert m.radiation.sw_diffuse_filter

    rng = np.random.RandomState(3)
    dif = jnp.asarray(100. + 50. * rng.rand(8, 8))
    out = np.asarray(m.radiation._filter_diffuse(dif))
    assert abs(out.mean() - np.asarray(dif).mean()) < 1e-8
    assert out.std() < np.asarray(dif).std()


def test_clearsky_stats_integration(tmp_path):
    """swclearskystats wires all-sky + clear-sky flux profiles into the
    stats NetCDF 'radiation' group."""
    from microhh_tpu.stats import Stats
    from microhh_tpu.utils import nc as ncmod
    wd = str(tmp_path)
    ini_txt = INI.replace("t_sfc=293.", "t_sfc=293.\nswclearskystats=1")
    ini_txt += """
[stats]
swstats=1
sampletime=30
"""
    ktot = 24
    z = np.linspace(50., 2350., ktot)
    f = ncmod.Dataset(os.path.join(wd, "rad_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.009 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "rad.ini"), "w") as fh:
        fh.write(ini_txt)
    m = Model(Ini(ini_txt), "init", "rad", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m2 = Model(Ini(ini_txt), "run", "rad", workdir=wd)
    m2.finish_setup()
    m2.stats = Stats(m2)
    m2.run()
    m2.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "rad.default.0000000.nc"), "r")
    rad = f.groups["radiation"]
    for name in ("lw_flux_up", "sw_flux_dn", "sw_flux_dn_dir",
                 "lw_flux_up_clear", "sw_flux_dn_clear"):
        assert name in rad.variables, name
        v = rad.variables[name][:]
        assert v.shape[-1] == ktot + 1
        assert np.isfinite(v).all(), name
    # no clouds in this run: clear-sky equals all-sky
    a = rad.variables["sw_flux_dn"][-1]
    c = rad.variables["sw_flux_dn_clear"][-1]
    assert np.allclose(a, c, rtol=1e-10)
    f.close()
