"""Cross/dump output, bitwise restarts, post-processing mode."""

import os
import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model, run_case

INI = """
[grid]
itot=16
jtot=8
ktot=8
xsize=1.
ysize=1.
zsize=0.5
swspatialorder=2

[fields]
visc=0.0001
rndamp=0.01
rndseed=7
slist=s1

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.

[time]
starttime=0
endtime=0.4
savetime=0.2
dt=0.01
dtmax=0.02
adaptivestep=true
outputiter=5
rkorder=3
postproctime=0.2
iotimeprec=-1

[advec]
cflmax=0.5

[diff]
dnmax=0.2

[cross]
swcross=1
crosslist=u,w,p
sampletime=0.2
xz=0.3
xy=0.25

[dump]
swdump=1
sampletime=0.2
dumplist=u,s1
"""


def run_cli(wd, mode, ini_text):
    with open(os.path.join(wd, "tcase.ini"), "w") as f:
        f.write(ini_text)
    m = Model(Ini(ini_text), mode, "tcase", workdir=wd)
    m.finish_setup()
    if mode == "init":
        m.save_initial_state()
        return m
    from microhh_tpu.output import Cross, Dump, Column
    m.cross = Cross(m)
    m.dump = Dump(m)
    m.column = Column(m)
    if mode == "run":
        m.run()
    else:
        m.post()
    return m


def test_cross_and_dump_files(tmp_path):
    wd = str(tmp_path)
    run_cli(wd, "init", INI)
    m = run_cli(wd, "run", INI)
    g = m.grid
    # cross files at t=0.2 and 0.4 (iotime suffix is integer seconds*10^-iotimeprec=1)
    # iotimeprec=0 -> iiotimeprec=1e9 -> iotime = itime/1e9 = 0 (0.2s < 1s)!
    # => with sub-second sampling everything lands on iotime 0; the reference
    # would require iotimeprec=-1. Check at least one file set exists.
    xz = [f for f in os.listdir(wd) if ".xz." in f]
    xy = [f for f in os.listdir(wd) if ".xy." in f]
    assert any(f.startswith("u.xz.") for f in xz)
    assert any(f.startswith("w.xy.") for f in xy)
    # slice sizes
    f_u = sorted(f for f in xz if f.startswith("u.xz."))[0]
    raw = np.fromfile(os.path.join(wd, f_u), dtype=np.float64)
    assert raw.size == g.ktot * g.itot
    # dump of s1: full interior
    dumps = [f for f in os.listdir(wd) if f.startswith("s1.")]
    assert dumps
    raw = np.fromfile(os.path.join(wd, sorted(dumps)[0]), dtype=np.float64)
    assert raw.size == g.ktot * g.jtot * g.itot


def test_restart_bitwise(tmp_path):
    """REAL two-leg restart: run 0 -> 0.4 in one go, then restart a second
    leg at 0.2 from the mid-time files; the 0.4 restart files must be
    bitwise identical (reference run_restart + compare_bitwise,
    microhh_tools.py:1004-1040)."""
    wd1 = str(tmp_path / "full")
    wd2 = str(tmp_path / "restart")
    os.makedirs(wd1)
    os.makedirs(wd2)

    run_cli(wd1, "init", INI)
    run_cli(wd1, "run", INI)

    # stage leg 2 from the mid-time save (iotimeprec=-1 -> iotime 2 = 0.2 s)
    import shutil
    for f in os.listdir(wd1):
        if f.endswith(".0000002") or f.startswith("grid."):
            shutil.copy(os.path.join(wd1, f), wd2)
    ini2 = INI.replace("starttime=0", "starttime=0.2")
    run_cli(wd2, "run", ini2)

    nchecked = 0
    for name in ("u", "v", "w", "s1", "time"):
        f = name + ".0000004"
        assert os.path.exists(os.path.join(wd2, f)), f
        a = open(os.path.join(wd1, f), "rb").read()
        b = open(os.path.join(wd2, f), "rb").read()
        assert a == b, "restart file %s differs between legs" % f
        nchecked += 1
    assert nchecked == 5


def test_post_mode(tmp_path):
    wd = str(tmp_path)
    run_cli(wd, "init", INI)
    run_cli(wd, "run", INI)
    # remove cross files, then post-process regenerates dumps from restarts
    for f in list(os.listdir(wd)):
        if ".xz." in f or ".xy." in f:
            os.remove(os.path.join(wd, f))
    run_cli(wd, "post", INI)
    assert any(".xz." in f for f in os.listdir(wd))


MOIST_CROSS_INI = """
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
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[cross]
swcross=1
crosslist=ql,qi,qlqi,b,T,qsat,qlbase,qltop,qlpath
sampletime=30
xy=800.
xz=800.

[time]
starttime=0
endtime=30
savetime=30
dt=2.
dtmax=5.
adaptivestep=true
"""


def test_thermo_diagnostic_crosses(tmp_path):
    """The reference's thermo cross variables (thermo_moist.cxx:1860-1866):
    b/ql/qi/qlqi/T/qsat slices, ql path, and cloud base/top height maps."""
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ktot = 16
    z = np.linspace(50., 1550., ktot)
    f = nc.Dataset(os.path.join(wd, "mcr_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    grp = f.createGroup("init")
    grp.createVariable("thl", "f8", ("z",))[:] = 289. + 0.004 * z
    # saturated mid-column: guarantees some cloud
    qt = np.full(ktot, 0.004)
    qt[6:10] = 0.02
    grp.createVariable("qt", "f8", ("z",))[:] = qt
    grp.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 2.)
    grp.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "mcr.ini"), "w") as fh:
        fh.write(MOIST_CROSS_INI)
    m = Model(Ini(MOIST_CROSS_INI), "init", "mcr", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    from microhh_tpu.output import Cross
    m2 = Model(Ini(MOIST_CROSS_INI), "run", "mcr", workdir=wd)
    m2.finish_setup()
    m2.cross = Cross(m2)
    m2.run()

    files = os.listdir(wd)
    for base in ("ql", "qi", "qlqi", "b", "T", "qsat"):
        assert any(fn.startswith(base + ".xy.") for fn in files), base
        assert any(fn.startswith(base + ".xz.") for fn in files), base
    for plane in ("qlbase", "qltop", "qlpath"):
        assert any(fn.startswith(plane + ".xy") for fn in files), plane
    # physics sanity on the final planes
    dt = np.float32
    T = np.fromfile(os.path.join(
        wd, sorted(fn for fn in files if fn.startswith("T.xy."))[-1]),
        dtype=np.float64)
    assert 240. < T.mean() < 310.
    base_map = np.fromfile(os.path.join(
        wd, sorted(fn for fn in files if fn.startswith("qlbase.xy"))[-1]),
        dtype=np.float64)
    top_map = np.fromfile(os.path.join(
        wd, sorted(fn for fn in files if fn.startswith("qltop.xy"))[-1]),
        dtype=np.float64)
    cloudy = np.isfinite(base_map)
    assert cloudy.any()
    assert np.all(top_map[cloudy] >= base_map[cloudy])


RAD_CROSS_INI = """
[grid]
itot=8
jtot=8
ktot=24
xsize=6400.
ysize=6400.
zsize=12000.
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
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[radiation]
swradiation=rrtmgp
swlongwave=1
swshortwave=1
t_sfc=300.
emis_sfc=1.
sza=0.5
sfc_alb_dir=0.07
sfc_alb_dif=0.07
swclearskystats=1

[cross]
swcross=1
crosslist=lw_flux_up,lw_flux_dn,sw_flux_up,sw_flux_dn,sw_flux_dn_dir,lw_flux_dn_clear,w500hpa
sampletime=30
xy=0,11500.
xz=3200.

[column]
swcolumn=1
sampletime=30
coordinates[x]=3200.
coordinates[y]=3200.

[time]
starttime=0
endtime=30
savetime=30
dt=2.
dtmax=5.
adaptivestep=true
"""


def test_radiation_flux_and_w500hpa_crosses(tmp_path):
    """Radiation flux crosses are full 3-D half-level fields sliced at the
    cross levels (radiation_rrtmgp.cxx exec_all_stats), and w500hpa is w
    at the first half level above 500 hPa (thermo_moist.cxx:299)."""
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ktot = 24
    z = np.linspace(250., 11750., ktot)
    f = nc.Dataset(os.path.join(wd, "rcr_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    grp = f.createGroup("init")
    grp.createVariable("thl", "f8", ("z",))[:] = 295. + 0.005 * z
    qt = 0.012 * np.exp(-z / 2500.)
    qt[8:12] += 0.01    # saturated band: some cloud in the all-sky path
    grp.createVariable("qt", "f8", ("z",))[:] = qt
    grp.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 2.)
    grp.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "rcr.ini"), "w") as fh:
        fh.write(RAD_CROSS_INI)
    m = Model(Ini(RAD_CROSS_INI), "init", "rcr", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    from microhh_tpu.output import Cross, Column
    m2 = Model(Ini(RAD_CROSS_INI), "run", "rcr", workdir=wd)
    m2.finish_setup()
    m2.cross = Cross(m2)
    m2.column = Column(m2)
    m2.run()
    m2.column.close()

    files = os.listdir(wd)
    for base in ("lw_flux_up", "lw_flux_dn", "sw_flux_up", "sw_flux_dn",
                 "sw_flux_dn_dir", "lw_flux_dn_clear"):
        assert any(fn.startswith(base + ".xy.") for fn in files), base
        assert any(fn.startswith(base + ".xz.") for fn in files), base
    assert any(fn.startswith("w500hpa.xy") for fn in files)

    # physics sanity: downwelling SW at the surface level is positive and
    # no larger than TOA; clear-sky LW down <= all-sky LW down (cloud
    # emission only adds)
    def last(base):
        fn = sorted(f2 for f2 in files if f2.startswith(base))[-1]
        return np.fromfile(os.path.join(wd, fn), dtype=np.float64)

    sw_dn_sfc = last("sw_flux_dn.xy.00000.")
    assert np.all(sw_dn_sfc > 0.)
    assert np.all(sw_dn_sfc < 1365.)
    lw_dn = last("lw_flux_dn.xy.00000.")
    lw_dn_clear = last("lw_flux_dn_clear.xy.00000.")
    assert np.all(lw_dn_clear <= lw_dn + 1e-9)
    # the plane files hold exactly jtot*itot values
    assert sw_dn_sfc.size == 64 and last("w500hpa.xy").size == 64

    # radiation flux profiles ride the column output too
    # (exec_all_stats -> column.calc_column)
    from microhh_tpu.utils import nc as ncmod
    col = sorted(f2 for f2 in files if ".column." in f2)
    assert col, "column file missing"
    cf = ncmod.Dataset(os.path.join(wd, col[-1]), "r")
    lw_col = np.asarray(cf.variables["lw_flux_up"][:])
    assert lw_col.shape[-1] == 25          # ktot+1 half levels
    assert np.all(lw_col[np.isfinite(lw_col)] >= 0.)
    cf.close()
