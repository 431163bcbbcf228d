"""Time-dependent large-scale forcings (force.cxx:354-415,744-756) and
surface pressure (thermo_moist.cxx:1041,1407-1410)."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.timeloop import IFACTOR

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
thref0=300.
pbot=100000.

[force]
swlspres=geo
fc=1.0e-4
swtimedep_geo=1
swwls=mean
swtimedep_wls=1
swls=1
lslist=th
swnudge=1
nudgelist=th
swtimedep_nudge=1
timedeplist_nudge=th

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[th]=0.01
stop[th]=0.003
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[time]
starttime=0
endtime=400
savetime=400
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
    f = nc.Dataset(os.path.join(wd, "ftd_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    for name, prof in (("th", 300. + 0.003 * z),
                       ("u", np.full(ktot, 5.)), ("v", np.zeros(ktot)),
                       ("u_geo", np.full(ktot, 5.)),
                       ("v_geo", np.zeros(ktot)),
                       ("w_ls", np.full(ktot, -0.01)),
                       ("th_ls", np.full(ktot, 1e-5)),
                       ("nudgefac", np.full(ktot, 1. / 7200.)),
                       ("th_nudge", 300. + 0.003 * z)):
        g.createVariable(name, "f8", ("z",))[:] = prof
    td = f.createGroup("timedep")
    td.createDimension("time_ls", 2)
    td.createVariable("time_ls", "f8", ("time_ls",))[:] = [0., 800.]
    for name, p0, p1 in (("u_geo", 5., 7.), ("v_geo", 0., 1.),
                         ("w_ls", -0.01, -0.03),
                         ("th_nudge", 300., 302.)):
        v = td.createVariable(name, "f8", ("time_ls", "z"))
        v[0, :] = np.full(ktot, p0)
        v[1, :] = np.full(ktot, p1)
    f.close()
    with open(os.path.join(wd, "ftd.ini"), "w") as fh:
        fh.write(INI)
    return wd


def test_force_timedep_interpolation(tmp_path):
    wd = make_case(tmp_path)
    m = Model(Ini(INI), "init", "ftd", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(INI), "run", "ftd", workdir=wd)
    m.finish_setup()
    assert m.force.has_timedep
    # halfway through [0, 800] every profile is the arithmetic mean
    sfc = m.force.update_timedep({}, int(400 * IFACTOR))
    assert np.allclose(np.asarray(sfc["__geo_u"]), 6.)
    assert np.allclose(np.asarray(sfc["__geo_v"]), 0.5)
    assert np.allclose(np.asarray(sfc["__wls"]), -0.02)
    assert np.allclose(np.asarray(sfc["__nudge_th"]), 301.)
    # at t=0 the start columns come back exactly
    sfc0 = m.force.update_timedep({}, 0)
    assert np.allclose(np.asarray(sfc0["__geo_u"]), 5.)
    assert np.allclose(np.asarray(sfc0["__nudge_th"]), 300.)


def test_force_timedep_run(tmp_path):
    """Integration: the timedep force profiles ride through the jitted step
    without retrace churn and the run stays finite."""
    wd = make_case(tmp_path)
    m = Model(Ini(INI), "init", "ftd", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(INI), "run", "ftd", workdir=wd)
    m.finish_setup()
    s, t = m.run(max_iters=3)
    for n in ("u", "v", "w", "th"):
        assert np.all(np.isfinite(np.asarray(s[n]))), n


def test_nudge_galilean_offset(tmp_path):
    """Nudging targets for u/v carry the -utrans/-vtrans Galilean offset
    (force.cxx:529-559)."""
    wd = make_case(tmp_path)
    ini_txt = INI.replace("nudgelist=th", "nudgelist=th,u")
    ini_txt = ini_txt.replace("swspatialorder=2",
                              "swspatialorder=2\nutrans=2.0")
    from microhh_tpu.utils import nc
    f = nc.Dataset(os.path.join(wd, "ftd_input.nc"), "a")
    g = f.groups["init"]
    ktot = 16
    g.createVariable("u_nudge", "f8", ("z",))[:] = np.full(ktot, 5.)
    f.close()
    with open(os.path.join(wd, "ftd.ini"), "w") as fh:
        fh.write(ini_txt)
    m = Model(Ini(ini_txt), "run", "ftd", workdir=wd)
    m.finish_setup()
    assert np.allclose(np.asarray(m.force.nudge_profs["u"]), 5. - 2.)


MOIST_INI = INI.replace(
    """swthermo=dry
swbasestate=boussinesq
thref0=300.
pbot=100000.""",
    """swthermo=moist
swbasestate=anelastic
pbot=100000.
swupdatebasestate=1
swtimedep_pbot=1""").replace("sbot[th]=0.01", "sbot[thl]=0.01\nsbot[qt]=1e-5"
                             ).replace("stop[th]=0.003",
                                       "stop[thl]=0.003\nstop[qt]=0.")


def _strip_force(txt):
    return txt.replace("""swlspres=geo
fc=1.0e-4
swtimedep_geo=1
swwls=mean
swtimedep_wls=1
swls=1
lslist=th
swnudge=1
nudgelist=th
swtimedep_nudge=1
timedeplist_nudge=th""", "swlspres=0")


def test_timedep_pbot(tmp_path):
    """swtimedep_pbot: the traced base-state update consumes the
    interpolated surface pressure from the carried state."""
    from microhh_tpu.utils import nc
    ini_txt = _strip_force(MOIST_INI)
    wd = str(tmp_path)
    ktot, zsize = 16, 400.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    f = nc.Dataset(os.path.join(wd, "ftd_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    for name, prof in (("thl", 300. + 0.003 * z),
                       ("qt", np.full(ktot, 5e-3)),
                       ("u", np.zeros(ktot)), ("v", np.zeros(ktot))):
        g.createVariable(name, "f8", ("z",))[:] = prof
    td = f.createGroup("timedep")
    td.createDimension("time_surface", 2)
    td.createVariable("time_surface", "f8", ("time_surface",))[:] = [0., 800.]
    td.createVariable("p_sbot", "f8", ("time_surface",))[:] = [100000., 99200.]
    f.close()
    with open(os.path.join(wd, "ftd.ini"), "w") as fh:
        fh.write(ini_txt)
    m = Model(Ini(ini_txt), "init", "ftd", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(ini_txt), "run", "ftd", workdir=wd)
    m.finish_setup()
    assert m.thermo.tdep_pbot is not None
    sfc = m.thermo.update_timedep({}, int(400 * IFACTOR))
    assert abs(float(sfc["__pbot"]) - 99600.) < 1e-6
    # the traced basestate update sees it: prefh[ks] equals the carried pbot
    import jax.numpy as jnp
    s = {n: jnp.asarray(v) for n, v in m.load_state().items()}
    aux = m.thermo.update_basestate(m.ctx, s, {}, sfc)
    assert abs(float(aux["prefh"][m.ctx.ks]) - 99600.) < 1e-6
    s2, t2 = m.run(max_iters=2)
    assert np.all(np.isfinite(np.asarray(s2["thl"])))
