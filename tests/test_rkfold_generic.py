"""Generic-path RK fold (moist + microphysics + limiter + ls/subsidence,
the bomex/rico class): one step with MICROHH_RKFOLD=1 must match the
separate-op pipeline (MICROHH_RKFOLD=0) to f64 roundoff, including the
limiter (applied as the s*-clamp it is algebraically equal to) and the
reordered additive forcings."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=16
jtot=16
ktot=24
xsize=3200.
ysize=3200.
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
swbasestate=boussinesq
thvref0=300.
pbot=100000.

[micro]
swmicro=2mom_warm
Nc0=70e6
cflmax=2.0

[force]
swlspres=geo
fc=1.e-4
swls=1
lslist=thl,qt
swwls=1

[limiter]
limitlist=qt,qr,nr

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=0.05
sbot[qt]=4.e-5
sbot[qr]=0.
sbot[nr]=0.
stop[thl]=0.003
stop[qt]=0.
stop[qr]=0.
stop[nr]=0.
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5
svisc[qr]=1.e-5
svisc[nr]=1.e-5

[buffer]
swbuffer=1
zstart=2000.
sigma=0.00223
beta=2.

[time]
starttime=0
endtime=60
savetime=60
dt=2.
dtmax=5.
"""


def _make_input(wd, ktot=24, zsize=2400.):
    from microhh_tpu.utils import nc
    z = np.linspace(zsize / ktot / 2., zsize - zsize / ktot / 2., ktot)
    f = nc.Dataset(os.path.join(wd, "rkg_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 298.7 + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = np.maximum(
        0.016 - 5e-6 * z, 0.004)
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, -5.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("u_geo", "f8", ("z",))[:] = np.full(ktot, -8.)
    g.createVariable("v_geo", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("thl_ls", "f8", ("z",))[:] = np.full(ktot, -2. / 86400.)
    g.createVariable("qt_ls", "f8", ("z",))[:] = np.full(ktot, -1.2e-8)
    g.createVariable("w_ls", "f8", ("z",))[:] = -0.005 * z / zsize
    f.close()


def _one_step(wd, rkfold, seed=5, ini=None):
    os.environ["MICROHH_RKFOLD"] = rkfold
    try:
        m = Model(Ini(ini or INI), "run", "rkg", workdir=wd)
        m.force_fused = True
        m.finish_setup()
        m.build_step()
        if rkfold == "1":
            assert m._use_rkfold_generic, "generic rkfold did not engage"
            assert m._fused is not None and m._fused.generic
        else:
            assert not getattr(m, "_use_rkfold_generic", False)
        g = m.grid
        rng = np.random.RandomState(seed)
        st = m.fields.create(m.input_nc, dtype=m.dtype)
        # rain so the 2mom conversions + limiter clamp engage
        st["qr"][g.kstart:g.kend] = np.abs(
            1e-4 * rng.randn(g.ktot, g.jtot, g.itot))
        st["nr"][g.kstart:g.kend] = 1e4 * np.abs(
            rng.randn(g.ktot, g.jtot, g.itot))
        st["qt"][g.kstart:g.kend] += 1e-3 * rng.randn(g.ktot, g.jtot, g.itot)
        s, t, sfc = m.as_device_state(st)
        dt = jnp.asarray(2.0, dtype=m.dtype)
        # jit so dt is TRACED, as in production (model jits step with dt as
        # an argument) — catches concrete-cast bugs eager calls would hide
        out = jax.jit(m._step_raw)(s, sfc, m.pres_params, dt,
                                   jnp.asarray(0.0, dtype=m.dtype))
        ks, ke = g.kstart, g.kend
        return m, {n: np.asarray(out[0][n])[ks:ke] for n in out[0]}
    finally:
        os.environ.pop("MICROHH_RKFOLD", None)


def test_generic_rkfold_matches_pipeline(tmp_path):
    wd = str(tmp_path)
    _make_input(wd)
    m1, ref = _one_step(wd, "0")
    m2, got = _one_step(wd, "1")
    for name in ref:
        scale = max(np.abs(ref[name]).max(), 1e-30)
        err = np.abs(got[name] - ref[name]).max() / scale
        # additive-op reordering reassociates f64 sums -> roundoff-level
        assert err < 1e-11, (name, err)


def test_generic_rkfold_2i5_advec(tmp_path):
    """2i* schemes ride the fold too: advection runs as an upstream XLA
    op while the kernels carry diffusion + the column folds + the RK
    update (fused.no_advec) — must match the separate-op pipeline."""
    wd = str(tmp_path)
    _make_input(wd)
    ini = INI.replace("swadvec=2\n", "swadvec=2i5\n")
    m1, ref = _one_step(wd, "0", ini=ini)
    m2, got = _one_step(wd, "1", ini=ini)
    assert m2._fused is not None and m2._fused.no_advec
    for name in ref:
        scale = max(np.abs(ref[name]).max(), 1e-30)
        err = np.abs(got[name] - ref[name]).max() / scale
        assert err < 1e-11, (name, err)


def test_generic_rkfold_limiter_clamps(tmp_path):
    """The folded limiter must keep the limited scalars non-negative."""
    wd = str(tmp_path)
    _make_input(wd)
    _m, got = _one_step(wd, "1", seed=11)
    for name in ("qt", "qr", "nr"):
        assert got[name].min() >= 0., (name, got[name].min())
