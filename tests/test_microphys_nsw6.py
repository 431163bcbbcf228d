"""Tomita NSW6 6-class ice microphysics: phase-transfer sign patterns,
availability limiting, sedimentation mass budget, dt limit."""

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
ktot=32
xsize=1600.
ysize=1600.
zsize=6400.
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

[micro]
swmicro=nsw6
Nc0=70e6
cflmax=1.2

[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot[thl]=8.e-3
stop[thl]=0.
sbot[qt]=5.2e-5
stop[qt]=0.
swboundary=surface
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[limiter]
limitlist=qt,qr,qs,qg

[time]
starttime=0
endtime=60
savetime=60
dt=2.
dtmax=5.
adaptivestep=true
rkorder=3
"""


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from microhh_tpu.utils import nc
    wd = str(tmp_path_factory.mktemp("nsw6"))
    ktot, zsize = 32, 6400.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    f = nc.Dataset(os.path.join(wd, "n6_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    thl = 298. + 0.003 * z
    qt = np.where(z < 2000., 0.016 - 3e-6 * z, 0.002)
    for name, prof in (("thl", thl), ("qt", qt),
                       ("u", np.zeros(ktot)), ("v", np.zeros(ktot))):
        g.createVariable(name, "f8", ("z",))[:] = prof
    f.close()
    with open(os.path.join(wd, "n6.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "n6", workdir=wd)
    m.finish_setup()
    return m


def _zero_state(m):
    g = m.grid
    return {n: jnp.zeros((g.kcells, g.jtot, g.itot))
            for n in m.fields.prognostic_names}


def test_fields_registered(model):
    assert {"qr", "qs", "qg"} <= set(model.fields.sp.keys())


def test_warm_cloud_forms_rain(model):
    """T > T0 cloud layer: autoconversion+accretion move qt -> qr and warm
    thl; no snow/graupel production without ice."""
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _zero_state(m)
    s["thl"] = s["thl"] + 292.
    qt0 = np.full(g.kcells, 1e-6)  # dry aloft so the cold top stays clear
    qt0[ks + 2:ks + 8] = 0.022     # warm saturated layer near the surface
    s["qt"] = jnp.asarray(np.broadcast_to(qt0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())
    qr0 = np.zeros(g.kcells)
    qr0[ks + 2:ks + 8] = 1e-5      # rain only in the warm layer (elsewhere
    s["qr"] = jnp.asarray(np.broadcast_to(  # it would freeze to graupel)
        qr0[:, None, None], (g.kcells, g.jtot, g.itot)).copy())

    ql, qi = m.thermo.get_ql_qi(ctx, s)
    assert np.asarray(ql).max() > 1e-4
    assert np.asarray(qi).max() == 0.

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, aux = m.micro.exec(ctx, s, t, {}, 2.0)
    cloudy = np.asarray(ql) > 1e-5
    qrt = np.asarray(t2["qr"])[ks:ke]
    assert (qrt[cloudy] > 0).mean() > 0.9
    assert np.asarray(t2["qt"])[ks:ke][cloudy].max() < 0.
    assert np.asarray(t2["thl"])[ks:ke][cloudy].min() > 0.
    # no ice-phase production in the warm layer interior (sedimentation of
    # qs/qg is zero because both are zero)
    assert np.abs(np.asarray(t2["qs"])[ks:ke]).max() < 1e-12
    assert np.abs(np.asarray(t2["qg"])[ks:ke]).max() < 1e-12


def test_cold_ice_to_snow(model):
    """A cold (T << T0) icy layer autoconverts cloud ice to snow."""
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _zero_state(m)
    # cold aloft: thl such that T ~ 250 K at upper levels
    s["thl"] = s["thl"] + 255.
    qt0 = np.full(g.kcells, 1e-4)
    qt0[ks + 20:ks + 28] = 0.004   # supersaturated cold layer
    s["qt"] = jnp.asarray(np.broadcast_to(qt0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())

    ql, qi = m.thermo.get_ql_qi(ctx, s)
    assert np.asarray(qi).max() > 1e-5, "cold layer must hold cloud ice"

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, _ = m.micro.exec(ctx, s, t, {}, 2.0)
    icy = np.asarray(qi) > 1e-6
    qst = np.asarray(t2["qs"])[ks:ke]
    assert (qst[icy] > 0).all(), "P_saut must move ice to snow"


def test_snow_melts_to_rain(model):
    """Snow falling into a warm layer melts: qs down, qr up, thl cools."""
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _zero_state(m)
    s["thl"] = s["thl"] + 295.     # warm everywhere, subsaturated
    s["qt"] = s["qt"] + 0.005
    qs0 = np.zeros(g.kcells)
    qs0[ks + 4:ks + 10] = 5e-4
    s["qs"] = jnp.asarray(np.broadcast_to(qs0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, _ = m.micro.exec(ctx, s, t, {}, 2.0)
    snowy = qs0[ks:ke] > 0
    # conversion part: rain gains where snow melts
    assert np.asarray(t2["qr"])[ks:ke][snowy].max() > 0.
    assert np.asarray(t2["thl"])[ks:ke][snowy].min() < 0.


def test_availability_limiter(model):
    """The source-availability clamp bounds each transfer by source/dt: with
    a long dt the cloud-water sink (and hence the qt tendency) cannot exceed
    ql/dt.  (Strict positivity of the combined conversion+sedimentation RHS
    is the Limiter op's job, as in the reference.)"""
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _zero_state(m)
    s["thl"] = s["thl"] + 292.
    qt0 = np.full(g.kcells, 1e-6)
    qt0[ks + 2:ks + 8] = 0.022
    s["qt"] = jnp.asarray(np.broadcast_to(qt0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())
    s["qr"] = s["qr"] + 1e-9

    ql, _ = m.thermo.get_ql_qi(ctx, s)
    dt = 500.0
    qtt, thlt, qrt, qst, qgt = m.micro._conversion(ctx, s, dt)
    bound = np.asarray(ql) / dt
    assert (np.asarray(qtt) >= -bound * (1. + 1e-12) - 1e-20).all()


def test_sedimentation_mass_budget(model):
    """Column-integrated sedimentation tendency equals the surface flux for
    each falling species (no interior mass creation)."""
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _zero_state(m)
    s["thl"] = s["thl"] + 295.
    s["qt"] = s["qt"] + 1e-4      # subsaturated: no ql/qi, pure fallout
    prof = np.zeros(g.kcells)
    prof[ks + 6:ks + 16] = 4e-4
    for n in ("qr", "qs", "qg"):
        s[n] = jnp.asarray(np.broadcast_to(prof[:, None, None],
                                           (g.kcells, g.jtot, g.itot)).copy())

    dt = 2.0
    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, aux = m.micro.exec(ctx, s, t, {}, dt)
    # subtract the conversion part (evaporation/melting are active) to
    # isolate the sedimentation flux divergence
    qtt, thlt, qrt, qst, qgt = m.micro._conversion(ctx, s, dt)
    conv = {"qr": qrt, "qs": qst, "qg": qgt}
    rho = np.asarray(ctx.rhoref)[ks:ke][:, None, None]
    dz = np.asarray(ctx.dz)[ks:ke][:, None, None]
    for n, bot in (("qr", "rr_bot"), ("qs", "rs_bot"), ("qg", "rg_bot")):
        sed = np.asarray(t2[n])[ks:ke] - np.asarray(conv[n])
        col = (rho * dz * sed).sum(axis=0)
        flux = np.asarray(aux[bot])
        assert flux.min() >= 0.
        assert np.allclose(-col, flux, rtol=1e-6, atol=1e-12), n


def test_time_limit_rate(model):
    m = model
    ctx, g = m.ctx, m.grid
    s = _zero_state(m)
    s["thl"] = s["thl"] + 295.
    rate0 = float(m.micro.get_time_limit_rate(ctx, s))
    s["qr"] = s["qr"] + 1e-3
    rate1 = float(m.micro.get_time_limit_rate(ctx, s))
    assert rate1 > rate0
    assert rate1 > 0.
