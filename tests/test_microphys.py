"""2-moment warm microphysics: conversion-term physics + moist-case smoke."""

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

[micro]
swmicro=2mom_warm
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
limitlist=qt,qr,nr

[time]
starttime=0
endtime=60
savetime=60
dt=2.
dtmax=5.
adaptivestep=true
rkorder=3
"""


def build_model(tmp_path):
    from microhh_tpu.utils import nc
    import os
    wd = str(tmp_path)
    ktot, zsize = 24, 2400.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    f = nc.Dataset(os.path.join(wd, "mp_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    thl = 298. + 0.002 * z
    qt = np.where(z < 1500., 0.017 - 4e-6 * z, 0.004)
    for name, prof in (("thl", thl), ("qt", qt), ("u", np.zeros(ktot)), ("v", np.zeros(ktot))):
        g.createVariable(name, "f8", ("z",))[:] = prof
    f.close()
    with open(os.path.join(wd, "mp.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "mp", workdir=wd)
    m.finish_setup()
    return m


def test_autoconversion_forms_rain(tmp_path):
    """A supersaturated cloudy layer must convert cloud water to rain with
    the correct sign pattern: qr up, qt down, thl up (latent heating)."""
    m = build_model(tmp_path)
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend

    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot)) for n in m.fields.prognostic_names}
    thl0 = 290.
    qt0 = np.zeros(g.kcells)
    qt0[ks:ke] = 0.001
    qt0[ks + 8:ks + 14] = 0.02  # deep saturated layer
    s["thl"] = s["thl"].at[:].set(thl0)
    s["qt"] = jnp.asarray(np.broadcast_to(qt0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())
    s["qr"] = s["qr"] + 1e-5
    s["nr"] = s["nr"] + 1e3

    ql = np.asarray(m.thermo.get_ql(ctx, s))
    assert ql.max() > 1e-4, "setup must produce cloud water"

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, aux = m.micro.exec(ctx, s, t, {}, 2.0)

    qrt = np.asarray(t2["qr"])[ks:ke]
    qtt = np.asarray(t2["qt"])[ks:ke]
    thlt = np.asarray(t2["thl"])[ks:ke]
    cloudy = ql > 1e-5

    assert (qrt[cloudy] != 0).any()
    # in the cloud interior (away from sedimentation sinks) qr grows
    k_mid = 10
    assert qrt[k_mid].mean() > 0.
    assert qtt[k_mid].mean() < 0.
    assert thlt[k_mid].mean() > 0.
    # rain falls: surface rain rate non-negative
    assert float(jnp.min(aux["rr_bot"])) >= 0.


def test_sedimentation_conserves_mass(tmp_path):
    """Without conversions (no cloud), sedimentation redistributes qr and
    removes mass only through the surface: column-integrated tendency equals
    -rr_bot."""
    m = build_model(tmp_path)
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot)) for n in m.fields.prognostic_names}
    s["thl"] = s["thl"] + 300.
    s["qt"] = s["qt"] + 1e-4  # dry: no cloud
    qr0 = np.zeros(g.kcells)
    qr0[ks + 10:ks + 16] = 1e-4
    s["qr"] = jnp.asarray(np.broadcast_to(qr0[:, None, None],
                                          (g.kcells, g.jtot, g.itot)).copy())
    s["nr"] = s["qr"] * 1e7

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t2, aux = m.micro.exec(ctx, s, t, {}, 2.0)
    rho = m.fields.rhoref[ks:ke][:, None, None]
    dz = m.grid.dz[ks:ke][:, None, None]
    col = np.asarray(t2["qr"])[ks:ke] * rho * dz
    # evaporation also removes qr; sedimentation part balances rr_bot.
    # column tendency integral + rr_bot = evaporation sink (negative)
    residual = col.sum(axis=0) + np.asarray(aux["rr_bot"])
    assert np.all(residual <= 1e-12)


@pytest.mark.slow
def test_micro_run_smoke(tmp_path):
    m = build_model(tmp_path)
    wd = m.workdir
    mi = Model(Ini(INI), "init", "mp", workdir=wd)
    mi.finish_setup()
    state = mi.fields.create(mi.input_nc, dtype=mi.dtype)
    # no input profiles wired through save path here; just use run via files
    mi.save_initial_state()
    m2 = Model(Ini(INI), "run", "mp", workdir=wd)
    m2.finish_setup()
    s, t = m2.run()
    for n in m2.fields.prognostic_names:
        assert np.all(np.isfinite(np.asarray(s[n]))), n
    ks, ke = m2.grid.kstart, m2.grid.kend
    assert np.asarray(s["qr"])[ks:ke].min() >= 0.
