"""Interactive land surface: tiled SEB, soil diffusion, water reservoir."""

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
ktot=16
xsize=1600.
ysize=1600.
zsize=1600.
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
swradiation=prescribed
emis_sfc=0.97
sw_flux_dn=600.
sw_flux_up=120.
lw_flux_dn=340.
lw_flux_up=420.

[boundary]
swboundary=surface_lsm
mbcbot=noslip
mbctop=freeslip
sbcbot=dirichlet
sbctop=neumann
sbot=0.
stop=0.
z0m=0.075
z0h=0.003
swconstantz0=1

[land_surface]
swhomogeneous=1
swfreedrainage=1
swwater=0
ktot=4
gD=0.
c_veg=0.95
lai=2.6
rs_veg_min=100.
rs_soil_min=50.
lambda_stable=10.
lambda_unstable=10.
cs_veg=0.

[fields]
visc=1.e-5
svisc=1.e-5

[time]
starttime=0
endtime=60
savetime=60
dt=5.
dtmax=10.
adaptivestep=true
rkorder=3
"""

Z_SOIL = np.array([-1.945, -0.64, -0.175, -0.035])


def write_input(wd, name):
    from microhh_tpu.utils import nc
    ktot = 16
    z = np.linspace(50., 1550., ktot)
    f = nc.Dataset(os.path.join(wd, "%s_input.nc" % name), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.006 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.008 - 2e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 4.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    s = f.createGroup("soil")
    s.createDimension("z", 4)
    s.createVariable("z", "f8", ("z",))[:] = Z_SOIL
    s.createVariable("t_soil", "f8", ("z",))[:] = [286., 287., 288., 289.]
    s.createVariable("theta_soil", "f8", ("z",))[:] = [0.35, 0.30, 0.25, 0.24]
    s.createVariable("index_soil", "i8", ("z",))[:] = [1, 1, 1, 1]  # medium
    s.createVariable("root_frac", "f8", ("z",))[:] = [0.05, 0.2, 0.4, 0.35]
    f.close()


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("lsm"))
    write_input(wd, "lsm")
    with open(os.path.join(wd, "lsm.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "init", "lsm", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m2 = Model(Ini(INI), "run", "lsm", workdir=wd)
    m2.finish_setup()
    return m2


def test_soil_grid(model):
    sg = model.soil_grid
    assert sg.ktot == 4
    assert np.all(sg.dz > 0)
    assert sg.zh[-1] == 0.
    assert np.isclose(sg.zh[3], -0.07)      # 2*0.035 below the surface


def test_cold_start_state(model):
    s = model.load_state()
    assert s["t_soil"].shape == (4, 8, 8)
    assert s["theta_soil"].shape == (4, 8, 8)
    assert s["wl"].shape == (8, 8)
    assert np.allclose(s["t_soil"][3], 289.)
    assert np.allclose(s["wl"], 0.)


def test_daytime_seb_fluxes(model):
    """Strong insolation over moist vegetation: upward H and LE, skin warms
    above the soil, G heats the soil."""
    m = model
    ctx = m.ctx
    state_np = m.load_state()
    s, t, sfc = m.as_device_state(state_np)
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    sfc2, t2 = m.boundary.exec_lsm(ctx, s, t, sfc, {}, 2.0)

    H = np.asarray(sfc2["H"])
    LE = np.asarray(sfc2["LE"])
    G = np.asarray(sfc2["G"])
    Qnet = 600. - 120. + 340. - 420.
    assert H.mean() > 0., "daytime sensible heat flux must be upward"
    assert LE.mean() > 0., "daytime evaporation must be positive"
    assert (np.abs(H + LE + G) < 1.5 * Qnet).all(), "fluxes bounded by forcing"
    assert np.asarray(sfc2["thl_fluxbot"]).mean() > 0.
    assert np.asarray(sfc2["qt_fluxbot"]).mean() > 0.
    # soil temperature tendency at the top level follows G
    assert np.asarray(t2["t_soil"])[3].mean() * np.sign(G.mean()) > 0.
    # evaporation dries the soil: column water tendency negative
    dz = m.soil_grid.dz[:, None, None]
    dwater = (np.asarray(t2["theta_soil"]) * dz).sum(axis=0)
    assert dwater.mean() < 0.


def test_rain_interception_and_infiltration(model):
    m = model
    ctx = m.ctx
    state_np = m.load_state()
    s, t, sfc = m.as_device_state(state_np)
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    aux = {"rr_bot": jnp.full((8, 8), 2e-3)}   # heavy rain, kg m-2 s-1
    sfc2, t2 = m.boundary.exec_lsm(ctx, s, t, sfc, aux, 2.0)
    assert np.asarray(t2["wl"]).mean() > 0., "interception fills the reservoir"
    assert np.asarray(sfc2["throughfall"]).mean() < 0.
    assert np.asarray(sfc2["infiltration"]).mean() < 0., "rain infiltrates"
    # infiltration adds water somewhere in the column vs the no-rain case
    _, t_norain = m.boundary.exec_lsm(ctx, s, t, sfc, {}, 2.0)
    dz = m.soil_grid.dz[:, None, None]
    dw_rain = (np.asarray(t2["theta_soil"]) * dz).sum(axis=0).mean()
    dw_dry = (np.asarray(t_norain["theta_soil"]) * dz).sum(axis=0).mean()
    assert dw_rain > dw_dry


def test_full_model_steps(model):
    """The full jitted RK3 step runs with the LSM and stays finite."""
    m = model
    m.build_step()
    state_np = m.load_state()
    s, t, sfc = m.as_device_state(state_np)
    dt = jnp.asarray(2.0)
    tz = jnp.asarray(0.0)
    for _ in range(5):
        s, sfc, aux = m._step_fn(s, sfc, m.pres_params, dt, tz)
    for name in ("u", "w", "thl", "qt", "t_soil", "theta_soil", "wl"):
        a = np.asarray(s[name])
        assert np.isfinite(a).all(), name
    # the skin has warmed the near-surface air over 10 s of strong sun
    assert np.asarray(sfc["thl_bot"]).mean() > 290.


@pytest.fixture(scope="module")
def het_model(tmp_path_factory):
    """Heterogeneous surface (swhomogeneous=0) with an open-water strip
    (swwater=1): c_veg 0.2 on the west half / 0.95 east, water in the two
    easternmost columns at 300 K."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "python"))
    from lsm_input import LSM_input

    wd = str(tmp_path_factory.mktemp("lsm_het"))
    write_input(wd, "lsmh")
    ini = INI.replace("swhomogeneous=1", "swhomogeneous=0")
    ini = ini.replace("swwater=0", "swwater=1")
    with open(os.path.join(wd, "lsmh.ini"), "w") as fh:
        fh.write(ini)

    lsm = LSM_input(8, 8, 4, sw_water=True, dtype=np.float64)
    f = lsm.fields
    f["gD"][:] = 0.
    f["c_veg"][:, :4] = 0.2
    f["c_veg"][:, 4:] = 0.95
    f["lai"][:] = 2.6
    f["rs_veg_min"][:] = 100.
    f["rs_soil_min"][:] = 50.
    f["lambda_stable"][:] = 10.
    f["lambda_unstable"][:] = 10.
    f["cs_veg"][:] = 0.
    f["water_mask"][:, 6:] = 1.
    f["t_bot_water"][:] = 300.
    f["index_soil"][:] = 1.
    f["root_frac"][:] = np.array([0.05, 0.2, 0.4, 0.35])[:, None, None]
    f["t_soil"][:] = np.array([286., 287., 288., 289.])[:, None, None]
    f["theta_soil"][:] = np.array([0.35, 0.30, 0.25, 0.24])[:, None, None]
    lsm.save(wd)

    m = Model(Ini(ini), "init", "lsmh", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m2 = Model(Ini(ini), "run", "lsmh", workdir=wd)
    m2.finish_setup()
    return m2


def test_heterogeneous_properties_and_water(het_model):
    m = het_model
    ctx = m.ctx
    state_np = m.load_state()
    s, t, sfc = m.as_device_state(state_np)
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    sfc2, t2 = m.boundary.exec_lsm(ctx, s, t, sfc, {}, 2.0)

    # tile fractions follow the c_veg map on land
    c_veg = np.asarray(sfc2["c_veg"])
    assert np.allclose(c_veg[:, :4], 0.2, atol=1e-12)
    assert np.allclose(c_veg[:, 4:6], 0.95, atol=1e-12)
    # water points: all-wet, no soil heat flux
    assert np.allclose(np.asarray(sfc2["c_wet"])[:, 6:], 1.)
    assert np.allclose(c_veg[:, 6:], 0.)
    assert np.allclose(np.asarray(sfc2["G"])[:, 6:], 0.)
    # prescribed water temperature sets the wet-tile saturation humidity
    from microhh_tpu.ops.thermo_moist import qsat
    ph = float(m.thermo.prefh[m.grid.kstart])
    qt_wet = np.asarray(sfc2["qt_bot_wet"])[:, 6:]
    assert np.allclose(qt_wet, float(qsat(ph, 300.)), rtol=1e-10)
    # warm water under 290 K air drives upward heat flux
    assert np.asarray(sfc2["H"])[:, 6:].mean() > 0.
    # soil tendencies stay finite everywhere (water points inactive but valid)
    assert np.isfinite(np.asarray(t2["theta_soil"])).all()


def test_heterogeneous_full_step(het_model):
    m = het_model
    m.build_step()
    s, t, sfc = m.as_device_state(m.load_state())
    dt = jnp.asarray(2.0)
    s, sfc, aux = m._step_fn(s, sfc, m.pres_params, dt, jnp.asarray(0.0))
    for name in ("u", "thl", "qt", "t_soil", "theta_soil", "wl"):
        assert np.isfinite(np.asarray(s[name])).all(), name


def test_restart_files_roundtrip(model, tmp_path):
    m = model
    m.build_step()
    state_np = m.load_state()
    s, t, sfc = m.as_device_state(state_np)
    dt = jnp.asarray(2.0)
    tz = jnp.asarray(0.0)
    s, sfc, aux = m._step_fn(s, sfc, m.pres_params, dt, tz)
    wd = str(tmp_path)
    st = {n: np.asarray(s[n]) for n in m.fields.all_prognostic_names}
    m.fields.save(st, 7, wd)
    m.boundary.save({k: np.asarray(v) for k, v in sfc.items()}, 7, wd)
    st2 = m.fields.load(7, wd)
    ks, ke = m.grid.kstart, m.grid.kend
    for n in ("t_soil", "theta_soil", "wl"):
        assert np.array_equal(st[n], st2[n]), n
    for n in ("u", "thl"):
        assert np.array_equal(st[n][ks:ke], st2[n][ks:ke]), n
    sfc0 = m.boundary.init_surface_state()
    sfc2 = m.boundary.load(sfc0, 7, wd)
    assert np.array_equal(np.asarray(sfc["thl_bot_veg"]), sfc2["thl_bot_veg"])


def test_tile_column_stats_and_soil_cross(tmp_path):
    """[land_surface] swtilestats_column: per-tile surface series at the
    column points (boundary_surface_lsm.cxx:270,1650-1668); [cross] xy_soil:
    soil-level xy planes (cross.cxx:283,462-488)."""
    from microhh_tpu.utils import nc as ncmod
    wd = str(tmp_path)
    ini_txt = INI + """
[column]
swcolumn=1
sampletime=30
coordinates[x]=300.
coordinates[y]=500.

[cross]
swcross=1
sampletime=30
crosslist=t_soil,theta_soil
xy_soil=-0.05,-0.7
"""
    ini_txt = ini_txt.replace("swhomogeneous=1",
                              "swhomogeneous=1\nswtilestats_column=1")
    write_input(wd, "lsmc")
    with open(os.path.join(wd, "lsmc.ini"), "w") as fh:
        fh.write(ini_txt)
    m = Model(Ini(ini_txt), "init", "lsmc", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    from microhh_tpu.output import Column, Cross
    m2 = Model(Ini(ini_txt), "run", "lsmc", workdir=wd)
    m2.finish_setup()
    m2.column = Column(m2)
    m2.cross = Cross(m2)
    m2.run()
    m2.column.file.close()

    # column file holds the tile series
    f = ncmod.Dataset(os.path.join(wd, "lsmc.column.0000000.nc"), "r")
    for name in ("H", "LE", "G", "H_veg", "c_veg", "obuk_soil",
                 "thl_bot_wet"):
        assert name in f.variables, name
        assert np.isfinite(f.variables[name][:]).all(), name
    # tile fractions at the point sum to ~1
    csum = (f.variables["c_veg"][-1] + f.variables["c_soil"][-1]
            + f.variables["c_wet"][-1])
    assert abs(float(csum) - 1.) < 1e-6
    f.close()

    # soil crosses: one file per requested level, plane-sized, finite
    files = sorted(fn for fn in os.listdir(wd) if fn.startswith("t_soil.xy."))
    assert len(files) >= 2, files
    for fn in files:
        a = np.fromfile(os.path.join(wd, fn), dtype=np.float64)
        assert a.size == 8 * 8
        assert np.isfinite(a).all()
        assert 270. < a.mean() < 310.
