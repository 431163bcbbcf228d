"""Statistics NetCDF output: layout + physics content (reference
``src/stats.cxx`` layout; read back like the reference's own analysis
scripts do)."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc

from test_drycblles import setup_case


def test_stats_output(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=24, endtime=600.)

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items["stats"]["sampletime"][""] = "300"
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    path = os.path.join(wd, "drycblles.default.0000000.nc")
    assert os.path.exists(path)
    f = nc.Dataset(path, "r")

    ktot = m.grid.ktot
    # layout like the reference: z/zh/time at root, profiles in groups
    assert f.variables["z"].shape == (ktot,)
    assert f.variables["zh"].shape == (ktot + 1,)
    ntime = f.variables["time"].shape[0]
    assert ntime == 3  # t=0, 300, 600

    default = f.groups["default"]
    th = default.variables["th"][:]
    assert th.shape == (ntime, ktot)

    # initial profile is the linear stratification
    z = f.variables["z"][:]
    assert np.allclose(th[0], 300. + 0.003 * z, atol=1e-3)

    # heating increases mean th over time
    assert th[-1].mean() > th[0].mean()

    # resolved + diffusive th flux at the surface equals the imposed 0.1
    th_flux = default.variables["th_flux"][:]
    assert th_flux.shape == (ntime, ktot + 1)
    assert abs(th_flux[-1, 0] - 0.1) < 0.02, th_flux[-1, 0]

    # variance exists and is positive after spinup
    th_2 = default.variables["th_2"][:]
    assert th_2[-1].max() > 0.

    # surface time series
    assert default.variables["ustar"][:].shape == (ntime,)
    assert np.all(default.variables["obuk"][1:] < 0.)

    # zi in the thermo group grows with time
    zi = f.groups["thermo"].variables["zi"][:]
    assert zi[-1] >= zi[0]
    f.close()


MOIST_INI = """
[grid]
itot=8
jtot=8
ktot=16
xsize=800.
ysize=800.
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
swupdatebasestate=0
pbot=101500.
thvref0=295.
[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=0.05
sbot[qt]=5e-5
sbot=0.
stop=0.
z0m=0.1
z0h=0.1
[fields]
visc=1.e-5
svisc=1.e-5
[stats]
swstats=1
sampletime=60
[time]
starttime=0
endtime=60
savetime=60
dt=2.
dtmax=5.
"""


def test_cloud_stats(tmp_path):
    """ql/qi mean, frac profile, path and cover (thermo_moist.cxx:1791-1805):
    internally consistent on a state with a saturated upper layer."""
    import jax.numpy as jnp
    from microhh_tpu.utils import nc as ncmod

    wd = str(tmp_path)
    ktot = 16
    z = np.linspace(50., 1550., ktot)
    f = ncmod.Dataset(os.path.join(wd, "mst_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 292. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.010 - 1e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 2.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "mst.ini"), "w") as fh:
        fh.write(MOIST_INI)

    m = Model(Ini(MOIST_INI), "init", "mst", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(MOIST_INI), "run", "mst", workdir=wd)
    m.finish_setup()
    state = m.load_state()
    # saturate half the columns in levels 10-13
    state["qt"][m.grid.kstart + 10:m.grid.kstart + 13, :, :4] += 0.006
    s, t, sfc = m.as_device_state(state)

    m.stats = Stats(m)
    m.stats._diag = m.stats._build_diag(m)
    out = m.stats._diag(s, t, sfc, None)
    ql = np.asarray(m.thermo.get_ql(m.ctx, s))
    assert (ql > 0).any(), "test setup must produce cloud"
    np.testing.assert_allclose(np.asarray(out["ql"]),
                               ql.mean(axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["ql_frac"]),
                               (ql > 0).mean(axis=(1, 2)), rtol=1e-6)
    # cover: fraction of columns with any cloud (half the domain)
    want_cover = (ql > 0).any(axis=0).mean()
    assert abs(float(out["ql_cover"]) - want_cover) < 1e-6
    # path: rho-weighted integral
    ks, ke = m.grid.kstart, m.grid.kend
    rho = m.fields.rhoref[ks:ke][:, None, None]
    dz = m.grid.dz[ks:ke][:, None, None]
    want_path = (rho * ql * dz).sum(axis=0).mean()
    np.testing.assert_allclose(float(out["ql_path"]), want_path, rtol=1e-6)
    # warm clouds only here: qi zero, qlqi == ql
    assert float(np.asarray(out["qi"]).max()) == 0.
    np.testing.assert_allclose(np.asarray(out["qlqi"]),
                               np.asarray(out["ql"]), rtol=1e-12)
    m.stats.close()
