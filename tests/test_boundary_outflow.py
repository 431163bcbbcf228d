"""Open lateral boundaries for scalars: a plume advected through an east
outflow edge must leave the domain instead of wrapping periodically, and the
west inflow edge must pull in the prescribed inflow profile."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=32
jtot=4
ktot=8
xsize=32.
ysize=4.
zsize=8.
swspatialorder=2

[advec]
swadvec=2
cflmax=1.0

[diff]
swdiff=0

[pres]
swpres=0

[fields]
visc=0.
svisc=0.
slist=s1

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
scalar_outflow=s1
flow_direction[west]=inflow
flow_direction[east]=outflow
flow_direction[south]=outflow
flow_direction[north]=outflow

[time]
starttime=0
endtime=8
savetime=8
dt=0.25
dtmax=0.25
adaptivestep=false
"""


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from microhh_tpu.utils import nc
    wd = str(tmp_path_factory.mktemp("outflow"))
    ktot = 8
    z = np.linspace(0.5, 7.5, ktot)
    f = nc.Dataset(os.path.join(wd, "of_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("u", "f8", ("z",))[:] = np.ones(ktot)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("s1", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("s1_inflow", "f8", ("z",))[:] = np.full(ktot, 0.25)
    f.close()
    with open(os.path.join(wd, "of.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "of", workdir=wd)
    m.finish_setup()
    m.build_step()
    return m


def test_plume_exits_without_wrap(model):
    m = model
    g, ctx = m.grid, m.ctx
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    s["u"] = s["u"].at[ks:ke].set(1.0)
    x = np.arange(g.itot) + 0.5
    blob = np.exp(-0.5 * ((x - 24.) / 2.) ** 2)   # near the east edge
    s["s1"] = s["s1"].at[ks:ke].set(jnp.asarray(blob)[None, None, :])

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    sfc = {}
    dt = jnp.asarray(0.25)
    tz = jnp.asarray(0.0)
    total0 = float(jnp.sum(s["s1"][ks:ke]))
    for _ in range(64):  # 16 time units: blob advects ~16 m, fully exits
        out = m._step_fn(s, sfc, m.pres_params, dt, tz)
        s, t, sfc = out[0], out[1], out[2]
    s1 = np.asarray(s["s1"])[ks:ke]

    # west third of the domain must hold only the inflow value (0.25), not
    # the wrapped plume (peak 1.0)
    west = s1[:, :, :10]
    assert west.max() < 0.6, "plume wrapped around the periodic seam"
    # inflow value propagates in from the west edge
    assert abs(s1[:, :, 0].mean() - 0.25) < 0.15
    # the blob (amplitude 1) left: domain total is now dominated by the
    # inflow plateau, strictly below initial blob total + inflow influx cap
    assert s1.max() < 1.05


def test_periodic_control_wraps(tmp_path):
    """Same setup WITHOUT scalar_outflow: the plume must wrap (sanity check
    that the outflow correction is what prevented it above)."""
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ktot = 8
    ini_text = INI.replace("scalar_outflow=s1\n", "") \
                  .replace("flow_direction[west]=inflow\n", "") \
                  .replace("flow_direction[east]=outflow\n", "") \
                  .replace("flow_direction[south]=outflow\n", "") \
                  .replace("flow_direction[north]=outflow\n", "")
    z = np.linspace(0.5, 7.5, ktot)
    f = nc.Dataset(os.path.join(wd, "ofp_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("u", "f8", ("z",))[:] = np.ones(ktot)
    f.close()
    with open(os.path.join(wd, "ofp.ini"), "w") as fh:
        fh.write(ini_text)
    m = Model(Ini(ini_text), "run", "ofp", workdir=wd)
    m.finish_setup()
    m.build_step()
    g_, ctx = m.grid, m.ctx
    ks, ke = g_.kstart, g_.kend
    s = {n: jnp.zeros((g_.kcells, g_.jtot, g_.itot))
         for n in m.fields.prognostic_names}
    s["u"] = s["u"].at[ks:ke].set(1.0)
    x = np.arange(g_.itot) + 0.5
    blob = np.exp(-0.5 * ((x - 24.) / 2.) ** 2)
    s["s1"] = s["s1"].at[ks:ke].set(jnp.asarray(blob)[None, None, :])
    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    dt = jnp.asarray(0.25)
    tz = jnp.asarray(0.0)
    for _ in range(64):
        out = m._step_fn(s, {}, m.pres_params, dt, tz)
        s, t = out[0], out[1]
    s1 = np.asarray(s["s1"])[ks:ke]
    assert s1[:, :, :10].max() > 0.5, "periodic control should wrap"
