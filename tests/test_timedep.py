"""Time-dependent surface BC (GABLS1-style cooling ramp)."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=8
jtot=8
ktot=16
xsize=400.
ysize=400.
zsize=400.
swspatialorder=2

[advec]
swadvec=2
cflmax=1.2

[diff]
swdiff=smag2
dnmax=0.3

[thermo]
swthermo=dry
swbasestate=boussinesq
thref0=263.5
pbot=100000.

[force]
swlspres=geo
fc=1.39e-4

[boundary]
swboundary=surface
swtimedep=1
timedeplist=th_sbot
mbcbot=noslip
mbctop=freeslip
sbcbot=dirichlet
sbctop=neumann
sbot[th]=265.
stop[th]=0.01
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[time]
starttime=0
endtime=600
savetime=600
dt=4.
dtmax=10.
adaptivestep=true
rkorder=3
"""


def make_case(tmp_path):
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ktot, zsize = 16, 400.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    f = nc.Dataset(os.path.join(wd, "gab_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    for name, prof in (("th", np.where(z < 100., 265., 265. + 0.01 * (z - 100.))),
                       ("u", np.full(ktot, 8.)), ("v", np.zeros(ktot)),
                       ("u_geo", np.full(ktot, 8.)), ("v_geo", np.zeros(ktot))):
        g.createVariable(name, "f8", ("z",))[:] = prof
    td = f.createGroup("timedep")
    td.createDimension("time_surface", 3)
    td.createVariable("time_surface", "f8", ("time_surface",))[:] = [0., 3600., 32400.]
    # GABLS1: surface cools at 0.25 K/h
    td.createVariable("th_sbot", "f8", ("time_surface",))[:] = [265., 264.75, 262.75]
    f.close()
    with open(os.path.join(wd, "gab.ini"), "w") as fh:
        fh.write(INI)
    return wd


def test_timedep_interpolation():
    from microhh_tpu.timedep import Timedep

    class FakeVar:
        def __init__(self, d):
            self.d = np.asarray(d, dtype=np.float64)

        def __getitem__(self, k):
            return self.d[k]

    class FakeGroup:
        def __init__(self):
            self.variables = {"time_surface": FakeVar([0., 100., 200.]),
                              "x_sbot": FakeVar([1., 3., 2.])}

    class FakeNC:
        groups = {"timedep": FakeGroup()}

    td = Timedep(FakeNC(), "x_sbot")
    assert td.interpolate(0) == 1.
    assert abs(td.interpolate(int(50e9)) - 2.) < 1e-12
    assert abs(td.interpolate(int(150e9)) - 2.5) < 1e-12


def _sbot2d_case(tmp_path, extra, maps):
    """Case with [boundary] sbot_2d_list=th and the given <iotime>: map files."""
    wd = make_case(tmp_path)
    ini = INI.replace("swtimedep=1\ntimedeplist=th_sbot\n", "")
    ini = ini.replace("sbcbot=dirichlet", "sbcbot=dirichlet\nsbot_2d_list=th" + extra)
    with open(os.path.join(wd, "gab.ini"), "w") as fh:
        fh.write(ini)
    for iotime, fld in maps.items():
        fld.astype(np.float64).tofile(
            os.path.join(wd, "th_bot_in.%07d" % iotime))
    return wd, ini


def test_sbot_2d_static(tmp_path):
    """[boundary] sbot_2d_list: a spatially-varying Dirichlet map replaces the
    scalar sbot (boundary.cxx:636-660)."""
    x_map = 265. + np.tile(np.arange(8.), (8, 1))  # varies in x
    wd, ini = _sbot2d_case(tmp_path, "", {0: x_map})
    m = Model(Ini(ini), "init", "gab", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(ini), "run", "gab", workdir=wd)
    m.finish_setup()
    m.run(max_iters=2)
    got = np.asarray(m.final_sfc["th_bot"])
    assert np.allclose(got, x_map), np.abs(got - x_map).max()


def test_sbot_2d_timedep(tmp_path):
    """swtimedep_sbot_2d: host-side linear interpolation between map files
    spaced sbot_2d_loadtime apart (boundary.cxx:482-540)."""
    m0 = np.full((8, 8), 265.)
    m300 = np.full((8, 8), 264.)
    m600 = np.full((8, 8), 266.)
    m900 = np.full((8, 8), 267.)
    wd, ini = _sbot2d_case(
        tmp_path, "\nswtimedep_sbot_2d=1\nsbot_2d_loadtime=300",
        {0: m0, 300: m300, 600: m600, 900: m900})
    m = Model(Ini(ini), "init", "gab", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(ini), "run", "gab", workdir=wd)
    m.finish_setup()
    m.run()
    # endtime=600: the final BC is exactly the t=600 map (no read past it)
    got = np.asarray(m.final_sfc["th_bot"])
    assert np.allclose(got, m600), got.mean()


def test_gabls1_cooling_ramp(tmp_path):
    wd = make_case(tmp_path)
    m = Model(Ini(INI), "init", "gab", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    m = Model(Ini(INI), "run", "gab", workdir=wd)
    m.finish_setup()
    s, t = m.run()

    # surface temperature BC followed the ramp: at t=600s, 265 - 0.25*600/3600
    expected = 265. - 0.25 * 600. / 3600.
    got = float(np.asarray(m.final_sfc["th_bot"]).mean())
    assert abs(got - expected) < 1e-6, (got, expected)

    # stable stratification develops: obuk > 0 (stable) near the end
    assert float(np.asarray(m.final_sfc["obuk"]).mean()) > 0.
    assert np.all(np.isfinite(np.asarray(s["th"])))
