"""4th-order stack vs transliterated reference kernels (oracle_ref/o4_ref):
advec_4, advec_4m, diff_4, the 4th-order vertical ghost fills, and the
pres_4 heptadiagonal band setup — on random fields over a STRETCHED grid,
so every boundary ladder row and every dz index is pinned at 1e-12."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.ops import advec_4 as a4
from microhh_tpu.ops.advec_4m import Advec4m
from microhh_tpu.ops import diff_4 as d4
from microhh_tpu.ops import boundary as bnd
from microhh_tpu.ops.pres_4 import Pres4
from tests.oracle_ref import o4_ref as ref

GC = 3
KTOT, JTOT, ITOT = 12, 6, 8
KC = KTOT + 2 * GC


class _Ctx:
    pass


def make_ctx(seed=0):
    rng = np.random.default_rng(seed)
    ctx = _Ctx()
    ctx.ks, ctx.ke = GC, GC + KTOT
    ctx.kcells = KC
    ctx.itot, ctx.jtot, ctx.ktot = ITOT, JTOT, KTOT
    ctx.dtype = np.float64
    ctx.dxi, ctx.dyi = 1.7, 2.3
    ctx.spatial_order = 4
    ctx.scalar_names = ("s1",)
    # stretched grid metrics: positive, non-uniform, with ghost rows
    ctx.dzi4 = jnp.asarray(0.8 + 0.4 * rng.random(KC))
    ctx.dzhi4 = jnp.asarray(0.9 + 0.5 * rng.random(KC + 1))
    ctx.z = jnp.asarray(np.linspace(-0.3, 1.3, KC) ** 2 + 0.1)
    return ctx


def rand_fields(seed):
    rng = np.random.default_rng(seed)
    return {n: rng.normal(size=(KC, JTOT, ITOT)) for n in "uvws"}


def _oargs(ctx, which="dzi4"):
    dz = np.asarray(getattr(ctx, which))
    return dz, float(ctx.dxi), float(ctx.dyi), ctx.ks, ctx.ke


@pytest.mark.parametrize("dim3", [True, False])
def test_advec4_matches_reference(dim3):
    ctx = make_ctx()
    f = rand_fields(11)
    u, v, w, s = (jnp.asarray(f[n]) for n in "uvws")
    ks, ke = ctx.ks, ctx.ke

    got_u = np.asarray(a4.advec_u(ctx, u, v, w, dim3))
    got_v = np.asarray(a4.advec_v(ctx, u, v, w, dim3))
    got_w = np.asarray(a4.advec_w(ctx, u, v, w, dim3))
    got_s = np.asarray(a4.advec_s(ctx, s, u, v, w, dim3))

    want_u = ref.advec4_u(f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)
    want_v = ref.advec4_v(f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)
    want_w = ref.advec4_w(f["u"], f["v"], f["w"], *_oargs(ctx, "dzhi4"), dim3=dim3)
    want_s = ref.advec4_s(f["s"], f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)

    np.testing.assert_allclose(got_u, want_u[ks:ke], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_v, want_v[ks:ke], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_w, want_w[ks + 1:ke], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_s, want_s[ks:ke], rtol=0, atol=1e-12)


@pytest.mark.parametrize("dim3", [True, False])
def test_advec4m_matches_reference(dim3):
    ctx = make_ctx()
    f = rand_fields(13)
    s = {n: jnp.asarray(f[m]) for n, m in
         (("u", "u"), ("v", "v"), ("w", "w"), ("s1", "s"))}
    ks, ke = ctx.ks, ctx.ke

    adv = object.__new__(Advec4m)
    adv.jtot = JTOT if dim3 else 1
    t0 = {n: jnp.zeros((KC, JTOT, ITOT)) for n in s}
    t = adv.exec(ctx, s, t0, {})

    want_u = ref.advec4m_u(f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)
    want_w = ref.advec4m_w(f["u"], f["v"], f["w"], *_oargs(ctx, "dzhi4"), dim3=dim3)
    want_s = ref.advec4m_s(f["s"], f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)

    want_v = ref.advec4m_v(f["u"], f["v"], f["w"], *_oargs(ctx), dim3=dim3)
    np.testing.assert_allclose(np.asarray(t["u"]), want_u, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t["v"]), want_v, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t["w"]), want_w, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t["s1"]), want_s, rtol=0, atol=1e-12)


@pytest.mark.parametrize("dim3", [True, False])
def test_diff4_matches_reference(dim3):
    ctx = make_ctx()
    f = rand_fields(17)
    visc = 0.37
    ks, ke = ctx.ks, ctx.ke
    dzi4 = np.asarray(ctx.dzi4)
    dzhi4 = np.asarray(ctx.dzhi4)
    dxidxi, dyidyi = float(ctx.dxi) ** 2, float(ctx.dyi) ** 2

    got_c = np.asarray(d4.diff_c(ctx, jnp.asarray(f["u"]), visc, dim3))
    got_w = np.asarray(d4.diff_w(ctx, jnp.asarray(f["w"]), visc, dim3))
    want_c = ref.diff4_c(f["u"], visc, dxidxi, dyidyi, dzi4, dzhi4, ks, ke, dim3)
    want_w = ref.diff4_w(f["w"], visc, dxidxi, dyidyi, dzi4, dzhi4, ks, ke, dim3)
    np.testing.assert_allclose(got_c, want_c[ks:ke], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_w, want_w[ks + 1:ke], rtol=0, atol=1e-12)


@pytest.mark.parametrize("btype", ["dirichlet", "neumann", "flux"])
def test_ghost4_matches_reference(btype):
    ctx = make_ctx()
    rng = np.random.default_rng(19)
    a = rng.normal(size=(KC, JTOT, ITOT))
    botv = rng.normal(size=(JTOT, ITOT))
    topv = rng.normal(size=(JTOT, ITOT))
    visc = 0.21
    bc = bnd.BC.__new__(bnd.BC)
    bc.bcbot, bc.bot = btype, jnp.asarray(botv)
    bc.bctop, bc.top = btype, jnp.asarray(topv)

    got = np.asarray(bnd.set_ghost_cells_field(ctx, jnp.asarray(a), bc, visc))

    z = np.asarray(ctx.z)
    rbt = "dirichlet" if btype == "dirichlet" else "neumann"
    gb = botv if btype != "flux" else -botv / visc
    gt = topv if btype != "flux" else -topv / visc
    want = ref.ghost4_bot(a, z, rbt, gb, ctx.ks)
    want = ref.ghost4_top(want, z, rbt, gt, ctx.ke)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("cons", [True, False])
def test_ghost4_w_matches_reference(cons):
    ctx = make_ctx()
    rng = np.random.default_rng(23)
    w = rng.normal(size=(KC, JTOT, ITOT))
    got = np.asarray(bnd.set_ghost_cells_w(ctx, jnp.asarray(w), conservation=cons))
    want = ref.ghost4_w(w, ctx.ks, ctx.ke, cons)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_pres4_band_setup_matches_reference():
    ctx = make_ctx()

    class _G:
        pass

    g = _G()
    g.itot, g.jtot, g.ktot, g.kstart = ITOT, JTOT, KTOT, GC
    g.dx, g.dy = 1. / float(ctx.dxi), 1. / float(ctx.dyi)
    g.dzi4 = np.asarray(ctx.dzi4)
    g.dzhi4 = np.asarray(ctx.dzhi4)
    p = Pres4.__new__(Pres4)
    p.grid, p.fields, p.dtype, p._built, p.mesh = g, None, np.float64, False, None
    p.set_values()

    want_m = ref.pres4_bands(g.dzi4, g.dzhi4, KTOT, GC)
    np.testing.assert_allclose(p._mk_np, want_m, rtol=1e-14, atol=1e-16)

    want_bi = ref.pres4_bmat(ITOT, 1. / g.dx ** 2)[:ITOT // 2 + 1]
    want_bj = ref.pres4_bmat(JTOT, 1. / g.dy ** 2)
    np.testing.assert_allclose(p._bmati_np, want_bi, rtol=1e-14)
    np.testing.assert_allclose(p._bmatj_np, want_bj, rtol=1e-14)


def test_o4_oracle_detects_perturbation():
    """The tolerance must catch a 1e-6 coefficient-scale error in any row,
    including the boundary ladders (pattern of test_oracle_advec.py)."""
    ctx = make_ctx()
    f = rand_fields(29)
    u, v, w = (jnp.asarray(f[n]) for n in "uvw")
    ks, ke = ctx.ks, ctx.ke
    got = np.asarray(a4.advec_u(ctx, u, v, w, True))
    want = ref.advec4_u(f["u"], f["v"], f["w"], *_oargs(ctx))[ks:ke]
    assert np.abs(got - want).max() < 1e-12
    for row in (0, KTOT // 2, KTOT - 1):   # wall + interior rows
        bad = got.copy()
        bad[row] *= (1. + 1e-6)
        assert np.abs(bad - want).max() > 1e-9, row
