"""Parity of the fused 4th-order Pallas producer (ops/o4_pallas) with the
XLA advec_4/advec_4m + diff_4 pair (themselves oracle-pinned in test_oracle_o4),
f64 interpret mode; plus a whole-step integration check through the model
wiring (conservation-ghost w for advection, plain for diffusion)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=16
jtot=16
ktot=%(ktot)d
xsize=2.
ysize=2.
zsize=1.
swspatialorder=4

[advec]
swadvec=%(swadvec)s
cflmax=1.

[diff]
swdiff=4

[pres]
swpres=0

[thermo]
swthermo=buoy

[fields]
visc=1e-3
svisc=2e-3

[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=flux
sbctop=neumann
sbot=0.005
stop=3.

[time]
starttime=0
endtime=1.
savetime=1.
dt=0.01
"""


def _build(ktot=16, swadvec="4"):
    m = Model(Ini(INI % {"ktot": ktot, "swadvec": swadvec}), "run", "o4")
    m.force_fused = True
    m.finish_setup()
    return m


def _rand_state(m, rng):
    ctx = m.ctx
    g = m.grid
    shp = (g.kcells, ctx.jtot, ctx.itot)
    names = ("u", "v", "w") + tuple(ctx.scalar_names)
    s = {n: jnp.asarray(rng.standard_normal(shp)) for n in names}
    t = {n: jnp.asarray(0.1 * rng.standard_normal(shp)) for n in names}
    return s, t


@pytest.mark.parametrize("swadvec", ["4", "4m"])
@pytest.mark.parametrize("ktot", [16, 6])
def test_producer_parity(ktot, swadvec):
    """advec_4/4m + diff_4 vs the fused kernel on fully random fields
    and ghosts (parity holds for ANY ghost contents — both paths read the
    same arrays)."""
    m = _build(ktot, swadvec)
    ctx = m.ctx
    rng = np.random.default_rng(ktot)
    s, t = _rand_state(m, rng)
    # distinct w arrays for advec (cons ghosts) vs diff, as the model wires
    s_cons = dict(s)
    s_cons["w"] = jnp.asarray(rng.standard_normal(np.asarray(s["w"]).shape))

    t_ref = m.advec.exec(ctx, s_cons, dict(t), {})
    t_ref = m.diff.exec(ctx, s, t_ref, {}, None)

    o4 = m._maybe_build_o4_fused()
    assert o4 is not None
    t_pal = o4.exec(ctx, s_cons, s, dict(t), {})

    for n in t:
        a, b = np.asarray(t_ref[n]), np.asarray(t_pal[n])
        scale = max(np.abs(a).max(), 1.)
        err = np.abs(a - b).max() / scale
        assert err < 1e-12, (n, ktot, err)


def test_step_integration():
    """Whole _step_raw with the fused producer on vs off (same ini, same
    state) — catches the model wiring (s_cons routing, accumulation
    order)."""
    rng = np.random.default_rng(3)

    def run(o4_on):
        os.environ["MICROHH_O4_FUSED"] = "1" if o4_on else "0"
        try:
            m = _build()
            m.build_step()
            if o4_on:
                assert m._o4_fused is not None
            else:
                assert m._o4_fused is None
            st = m.fields.create(None, dtype=m.dtype)
            g = m.grid
            r2 = np.random.default_rng(9)
            for n in ("u", "v", "b"):
                st[n][g.kstart:g.kend] += 0.1 * r2.standard_normal(
                    (g.ktot, g.jtot, g.itot))
            s, t, sfc = m.as_device_state(st)
            out = m._step_raw(s, sfc, m.pres_params,
                              jnp.asarray(0.01, dtype=m.dtype),
                              jnp.asarray(0.0, dtype=m.dtype))
            return {n: np.asarray(out[0][n]) for n in out[0]}
        finally:
            os.environ.pop("MICROHH_O4_FUSED", None)

    ref = run(False)
    fus = run(True)
    for n in ref:
        scale = max(np.abs(ref[n]).max(), 1.)
        err = np.abs(ref[n] - fus[n]).max() / scale
        assert err < 1e-12, (n, err)


def test_sharded_parity():
    """2x4-mesh shard_map run (ADV_HALO ppermute halo pad) matches the
    single-device o4 kernels to roundoff."""
    from microhh_tpu.parallel import mesh as pmesh
    from microhh_tpu.ops.o4_pallas import O4FusedPallas

    ini_txt = (INI % {"ktot": 8, "swadvec": "4"}
               ).replace("itot=16", "itot=32").replace("jtot=16",
                                                       "jtot=32")
    m2 = Model(Ini(ini_txt), "run", "o4sh")
    m2.force_fused = True
    m2.finish_setup()
    ctx = m2.ctx
    rng = np.random.default_rng(5)
    s, t = _rand_state(m2, rng)
    s_cons = dict(s)
    s_cons["w"] = jnp.asarray(rng.standard_normal(np.asarray(s["w"]).shape))

    o1 = O4FusedPallas(m2.advec, m2.diff, ctx, np.float64, interpret=True)
    t1 = o1.exec(ctx, s_cons, s, dict(t), {})

    mesh = pmesh.make_mesh(2, 4)
    o2 = O4FusedPallas(m2.advec, m2.diff, ctx, np.float64, interpret=True,
                       mesh=mesh, jtot_global=ctx.jtot)
    with mesh:
        t2 = o2.exec(ctx, s_cons, s, dict(t), {})
    for n in t1:
        a, b = np.asarray(t1[n]), np.asarray(t2[n])
        scale = max(np.abs(a).max(), 1.)
        assert np.abs(a - b).max() / scale < 1e-13, (
            n, np.abs(a - b).max() / scale)
