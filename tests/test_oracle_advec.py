"""Reference-discretization parity: interpolated advection family.

Each scheme's JAX operator must reproduce the literal transliteration of the
reference kernel (tests/oracle_ref/advec_interp_ref.py) on random fields with
a non-trivial anelastic density profile, pointwise at f64 ~1e-12.  This is
the oracle the conservation tests cannot provide: a perturbed interpolation
coefficient anywhere fails here."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

from oracle_ref import advec_interp_ref as ref
from oracle_ref.interp import pad_xy

INI = """
[grid]
itot=12
jtot=10
ktot=%(ktot)d
xsize=2.7
ysize=1.9
zsize=3.1
swspatialorder=2

[advec]
swadvec=%(swadvec)s
cflmax=1.
%(extra)s

[diff]
swdiff=0

[pres]
swpres=0

[fields]
visc=0.
slist=s1

[boundary]
mbcbot=noslip
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

GC = 3


def build(swadvec, ktot=16, extra=""):
    ini = Ini(INI % {"swadvec": swadvec, "ktot": ktot, "extra": extra})
    m = Model(ini, "run", "oradv")
    m.finish_setup()
    # non-trivial anelastic-like density profile to catch rho/dz misindexing
    kc = m.grid.kcells
    zfull = np.linspace(-0.5, float(kc), kc)
    m.ctx.rhoref = jnp.asarray(np.exp(-0.03 * zfull))
    m.ctx.rhorefh = jnp.asarray(np.exp(-0.03 * (zfull - 0.4)))
    return m


def rand_state(m, seed):
    g = m.grid
    rng = np.random.RandomState(seed)
    s = {}
    for name in m.fields.prognostic_names:
        s[name] = rng.randn(g.kcells, g.jtot, g.itot)
    s["w"][g.kstart] = 0.
    s["w"][g.kend] = 0.
    return s


def run_mine(m, s):
    sj = {k: jnp.asarray(v) for k, v in s.items()}
    t = {n: jnp.zeros_like(v) for n, v in sj.items()}
    t = m.advec.exec(m.ctx, sj, t, {})
    return {k: np.asarray(v) for k, v in t.items()}


def run_oracle(m, s, scheme):
    g = m.grid
    ks, ke = g.kstart, g.kend
    it, jt = g.itot, g.jtot
    i0, i1 = GC, GC + it
    j0, j1 = GC, GC + jt
    u, v, w = pad_xy(s["u"], GC), pad_xy(s["v"], GC), pad_xy(s["w"], GC)
    s1 = pad_xy(s["s1"], GC)
    dzi = np.asarray(m.ctx.dzi)
    dzhi = np.asarray(m.ctx.dzhi)
    rho = np.asarray(m.ctx.rhoref)
    rhoh = np.asarray(m.ctx.rhorefh)
    args = (dzi, g.dx, g.dy, rho, rhoh, i0, i1, j0, j1, ks, ke)
    t = {n: np.zeros_like(u) for n in ("u", "v", "w", "s1")}
    ref.advec_cell(scheme, t["u"], u, u, v, w, *args, da=(-1, 0, 0))
    ref.advec_cell(scheme, t["v"], v, u, v, w, *args, da=(0, -1, 0))
    ref.advec_cell(scheme, t["s1"], s1, u, v, w, *args, da=None)
    ref.advec_w(scheme, t["w"], u, v, w, dzhi, g.dx, g.dy, rho, rhoh,
                i0, i1, j0, j1, ks, ke)
    return {n: a[:, j0:j1, i0:i1] for n, a in t.items()}


@pytest.mark.parametrize("scheme", ["2i4", "2i5", "2i53", "2i62"])
@pytest.mark.parametrize("ktot", [8, 16])
def test_advec_matches_reference_kernels(scheme, ktot):
    m = build(scheme, ktot)
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = rand_state(m, seed=hash((scheme, ktot)) % 2**31)
    mine = run_mine(m, s)
    orac = run_oracle(m, s, scheme)
    for name in ("u", "v", "s1"):
        np.testing.assert_allclose(
            mine[name][ks:ke], orac[name][ks:ke], rtol=0, atol=1e-11,
            err_msg="%s %s tendency" % (scheme, name))
    np.testing.assert_allclose(
        mine["w"][ks + 1:ke], orac["w"][ks + 1:ke], rtol=0, atol=1e-11,
        err_msg="%s w tendency" % scheme)
    # wall rows of w must be untouched
    assert np.all(mine["w"][ks] == 0.) and np.all(mine["w"][ke] == 0.)


def test_koren_limiter_matches_reference():
    m = build("2i5", 16, extra="fluxlimit_list=s1")
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = rand_state(m, seed=1234)
    # Koren limiter is branchy: keep values away from exact ties
    s["s1"] = s["s1"] + 0.01 * np.arange(g.itot)[None, None, :]
    mine = run_mine(m, s)

    i0, i1 = GC, GC + g.itot
    j0, j1 = GC, GC + g.jtot
    u, v, w = pad_xy(s["u"], GC), pad_xy(s["v"], GC), pad_xy(s["w"], GC)
    s1 = pad_xy(s["s1"], GC)
    st = np.zeros_like(s1)
    ref.advec_s_lim(st, s1, u, v, w, np.asarray(m.ctx.dzi), g.dx, g.dy,
                    np.asarray(m.ctx.rhoref), np.asarray(m.ctx.rhorefh),
                    i0, i1, j0, j1, ks, ke)
    np.testing.assert_allclose(
        mine["s1"][ks:ke], st[ks:ke, j0:j1, i0:i1], rtol=0, atol=1e-11)


@pytest.mark.parametrize("scheme", ["2i4", "2i5", "2i53", "2i62"])
def test_oracle_detects_perturbation(scheme):
    """Sanity check on the oracle itself: a 1e-6 coefficient perturbation in
    the operator under test must be caught (i.e. the tolerance is tight
    enough to catch coefficient bugs)."""
    m = build(scheme, 8)
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = rand_state(m, seed=7)
    mine = run_mine(m, s)
    orac = run_oracle(m, s, scheme)
    diff = np.abs(mine["s1"][ks:ke] - orac["s1"][ks:ke]).max()
    assert diff < 1e-11
    # emulate a coefficient bug by scaling the tendency of one level
    bad = mine["s1"].copy()
    bad[ks + 2] *= (1. + 1e-6)
    assert np.abs(bad[ks:ke] - orac["s1"][ks:ke]).max() > 1e-9
