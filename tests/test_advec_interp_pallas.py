"""Parity of the fused Pallas 2i* advection (advec_interp_pallas) with the
XLA scheme classes (advec_interp), f64 interpret mode.

Covers all four schemes, the vertical ladder rungs (tall and short kt),
an anelastic-like rho profile (exercises the density prescaling in the
weight tables), tendency accumulation through the aliased carry, and the
Koren fluxlimit fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops.advec_interp_pallas import AdvecInterpPallas

INI = """
[grid]
itot=%(itot)d
jtot=%(jtot)d
ktot=%(ktot)d
xsize=1.
ysize=1.
zsize=1.
swspatialorder=2

[advec]
swadvec=%(swadvec)s
cflmax=1.
%(fluxlimit)s

[diff]
swdiff=0

[pres]
swpres=0

[fields]
visc=0.
slist=s1,s2,s3

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.

[time]
starttime=0
endtime=1.
savetime=1.
dt=0.01
"""


def _build(scheme, ktot, fluxlimit="", itot=8, jtot=8):
    ini = Ini(INI % {"swadvec": scheme, "ktot": ktot,
                     "fluxlimit": fluxlimit, "itot": itot, "jtot": jtot})
    m = Model(ini, "run", "adv")
    m.finish_setup()
    ctx = m.ctx
    # anelastic-like profiles so the rho prescaling is exercised
    kc = len(np.asarray(ctx.rhoref))
    z = np.linspace(0., 1., kc)
    ctx.rhoref = jnp.asarray(1.2 - 0.5 * z)
    ctx.rhorefh = jnp.asarray(1.25 - 0.45 * z)
    ctx.np_rhoref = np.asarray(ctx.rhoref)    # table builders read np_*
    ctx.np_rhorefh = np.asarray(ctx.rhorefh)
    return m


def _rand_state(m, rng):
    ctx = m.ctx
    kc = len(np.asarray(ctx.rhoref))
    shp = (kc, ctx.jtot, ctx.itot)
    s = {n: jnp.asarray(rng.standard_normal(shp))
         for n in ("u", "v", "w") + tuple(ctx.scalar_names)}
    # wall-consistent w (zero at the walls like the solver maintains)
    w = np.asarray(s["w"]).copy()
    w[ctx.ks] = 0.
    w[ctx.ke] = 0.
    s["w"] = jnp.asarray(w)
    t = {n: jnp.asarray(0.1 * rng.standard_normal(shp)) for n in s}
    return s, t


@pytest.mark.parametrize("scheme", ["2i4", "2i5", "2i53", "2i62"])
@pytest.mark.parametrize("ktot", [16, 6])
def test_parity(scheme, ktot):
    m = _build(scheme, ktot)
    ctx = m.ctx
    rng = np.random.default_rng(hash((scheme, ktot)) % 2**31)
    s, t = _rand_state(m, rng)

    t_ref = m.advec.exec(ctx, s, {n: a for n, a in t.items()}, {})
    ap = AdvecInterpPallas(m.advec, ctx, np.float64, interpret=True)
    t_pal = ap.exec(ctx, s, {n: a for n, a in t.items()}, {})

    for n in t:
        a, b = np.asarray(t_ref[n]), np.asarray(t_pal[n])
        scale = max(np.abs(a).max(), 1.)
        assert np.abs(a - b).max() / scale < 1e-12, (
            "%s %s kt=%d: %.3e" % (scheme, n, ktot,
                                   np.abs(a - b).max() / scale))


def test_parity_small_kt():
    # kt=4: 2i5's 6th-order rungs vanish, WS rows collide at the middle
    m = _build("2i5", 4)
    ctx = m.ctx
    rng = np.random.default_rng(7)
    s, t = _rand_state(m, rng)
    t_ref = m.advec.exec(ctx, s, dict(t), {})
    ap = AdvecInterpPallas(m.advec, ctx, np.float64, interpret=True)
    t_pal = ap.exec(ctx, s, dict(t), {})
    for n in t:
        assert np.allclose(np.asarray(t_ref[n]), np.asarray(t_pal[n]),
                           rtol=0, atol=1e-12)


def test_fluxlimit_fallback():
    m = _build("2i5", 16, fluxlimit="fluxlimit_list=s2")
    ctx = m.ctx
    assert m.advec.fluxlimit_list == ["s2"]
    rng = np.random.default_rng(3)
    s, t = _rand_state(m, rng)
    t_ref = m.advec.exec(ctx, s, dict(t), {})
    ap = AdvecInterpPallas(m.advec, ctx, np.float64, interpret=True)
    t_pal = ap.exec(ctx, s, dict(t), {})
    for n in t:
        assert np.allclose(np.asarray(t_ref[n]), np.asarray(t_pal[n]),
                           rtol=0, atol=1e-12), n


def test_sharded_parity():
    """2x4-mesh shard_map run (ADV_HALO ppermute halo pad) matches the
    single-device kernels to roundoff."""
    from microhh_tpu.parallel import mesh as pmesh

    m = _build("2i5", 8, itot=32, jtot=32)
    ctx = m.ctx
    rng = np.random.default_rng(11)
    s, t = _rand_state(m, rng)

    ap1 = AdvecInterpPallas(m.advec, ctx, np.float64, interpret=True)
    t1 = ap1.exec(ctx, s, dict(t), {})

    mesh = pmesh.make_mesh(2, 4)
    ap2 = AdvecInterpPallas(m.advec, ctx, np.float64, interpret=True,
                            mesh=mesh)
    with mesh:
        t2 = ap2.exec(ctx, s, dict(t), {})
    for n in t1:
        a, b = np.asarray(t1[n]), np.asarray(t2[n])
        scale = max(np.abs(a).max(), 1.)
        assert np.abs(a - b).max() / scale < 1e-13, (
            n, np.abs(a - b).max() / scale)
