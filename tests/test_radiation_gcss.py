"""GCSS radiation flux output: stats profiles, crosses and columns
(radiation_gcss.cxx get_radiation_field / create_stats / create_cross /
create_column)."""

import os

import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

GCSS_INI = """
[grid]
itot=8
jtot=8
ktot=16
xsize=1600.
ysize=1600.
zsize=1500.
swspatialorder=2

[advec]
swadvec=2
cflmax=1.2

[diff]
swdiff=smag2
dnmax=0.3

[thermo]
swthermo=moist
swbasestate=boussinesq
pbot=101780.
thvref0=289.

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=0.01
stop[thl]=0.003
sbot[qt]=4.e-5
stop[qt]=0.
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[radiation]
swradiation=gcss
xka=85.
fr0=70.
fr1=22.
div=3.75e-6
lat=31.5
lon=-122.

[stats]
swstats=1
sampletime=30

[cross]
swcross=1
crosslist=sflx,lflx
sampletime=30
xy=750.
xz=800.

[column]
swcolumn=1
sampletime=30
coordinates[x]=800.
coordinates[y]=800.

[time]
starttime=0
endtime=30
savetime=30
dt=2.
dtmax=5.
adaptivestep=true
"""


def _cloudy_setup(wd):
    from microhh_tpu.utils import nc
    ktot = 16
    z = np.linspace(50., 1450., ktot)
    f = nc.Dataset(os.path.join(wd, "gr_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    grp = f.createGroup("init")
    grp.createVariable("thl", "f8", ("z",))[:] = 289. + 0.002 * z
    # DYCOMS-like: well-mixed moist layer capped below 850 m -> stratus
    qt = np.where(z < 850., 9.5e-3, 1.5e-3)
    qt[10:13] += 0.006
    grp.createVariable("qt", "f8", ("z",))[:] = qt
    grp.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    grp.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()


def test_gcss_flux_stats_cross_column(tmp_path):
    wd = str(tmp_path)
    _cloudy_setup(wd)
    with open(os.path.join(wd, "gr.ini"), "w") as fh:
        fh.write(GCSS_INI)
    m = Model(Ini(GCSS_INI), "init", "gr", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    from microhh_tpu.output import Cross, Column
    from microhh_tpu.stats import Stats
    m2 = Model(Ini(GCSS_INI), "run", "gr", workdir=wd)
    m2.finish_setup()
    m2.cross = Cross(m2)
    m2.column = Column(m2)
    m2.stats = Stats(m2)
    m2.run()
    m2.column.close()
    m2.stats.close()

    files = os.listdir(wd)
    for base in ("sflx", "lflx"):
        assert any(fn.startswith(base + ".xy.") for fn in files), base
        assert any(fn.startswith(base + ".xz.") for fn in files), base

    # LW flux is positive and bounded by fr0+fr1+cooling term; the xy
    # plane at 750 m sits inside the cloud deck
    lw = np.fromfile(os.path.join(wd, sorted(
        fn for fn in files if fn.startswith("lflx.xy."))[-1]),
        dtype=np.float64)
    assert lw.size == 64
    assert np.all(lw >= 0.) and np.all(lw < 500.)

    # stats carry the profiles (radiation group)
    from microhh_tpu.utils import nc
    sf = nc.Dataset(os.path.join(wd, "gr.default.0000000.nc"), "r")
    grp = sf.groups.get("radiation", sf)
    lflx_p = np.asarray(grp.variables["lflx"][:])
    sflx_p = np.asarray(grp.variables["sflx"][:])
    assert lflx_p.shape[-1] == 16
    assert np.all(np.isfinite(lflx_p)) and np.all(np.isfinite(sflx_p))
    # LW flux increases monotonically through the cloud layer upward
    assert lflx_p[-1].max() > 0.
    sf.close()

    # column file has both profiles on z
    col = sorted(fn for fn in files if ".column." in fn)
    assert col
    cf = nc.Dataset(os.path.join(wd, col[-1]), "r")
    assert np.asarray(cf.variables["lflx"][:]).shape[-1] == 16
    cf.close()
