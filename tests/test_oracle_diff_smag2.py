"""Reference-discretization parity: Smagorinsky strain², eddy viscosity,
and the variable-viscosity diffusion stencils, vs the literal transliteration
of diff_smag2.cxx (tests/oracle_ref/diff_smag2_ref.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

from oracle_ref import diff_smag2_ref as ref
from oracle_ref.interp import pad_xy

GC = 3

INI_SURFACE = """
[grid]
itot=12
jtot=10
ktot=12
xsize=1600.
ysize=1200.
zsize=900.
swspatialorder=2

[advec]
swadvec=2

[diff]
swdiff=smag2
cs=0.23
tPr=0.3333333333333333

[pres]
swpres=0

[fields]
visc=1.e-4
svisc=1.1e-4
slist=s1

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot=0.1
stop=0.
z0m=0.1
z0h=0.01

[time]
starttime=0
endtime=10.
savetime=10.
dt=1.
"""

INI_RESOLVED = INI_SURFACE.replace("swboundary=surface", "swboundary=default") \
                          .replace("mbcbot=noslip", "mbcbot=noslip")


class FakeThermo:
    scalars = ("s1",)

    def __init__(self, n2):
        self.n2 = n2

    def get_n2(self, ctx, s):
        return self.n2


def build(ini_text):
    m = Model(Ini(ini_text), "run", "osmag")
    m.finish_setup()
    kc = m.grid.kcells
    zfull = np.linspace(-0.5, float(kc), kc)
    m.ctx.rhoref = jnp.asarray(np.exp(-0.0003 * zfull))
    m.ctx.rhorefh = jnp.asarray(np.exp(-0.0003 * (zfull - 0.4)))
    return m


def rand_fields(m, seed):
    g = m.grid
    rng = np.random.RandomState(seed)
    s = {n: rng.randn(g.kcells, g.jtot, g.itot)
         for n in ("u", "v", "w", "s1")}
    s["w"][g.kstart] = 0.
    s["w"][g.kend] = 0.
    sfc = {
        "dudz_mo": rng.randn(g.jtot, g.itot),
        "dvdz_mo": rng.randn(g.jtot, g.itot),
        "dbdz_mo": rng.rand(g.jtot, g.itot) * 1e-4,
        "u_fluxbot": rng.randn(g.jtot, g.itot) * 0.1,
        "v_fluxbot": rng.randn(g.jtot, g.itot) * 0.1,
        "s1_fluxbot": rng.randn(g.jtot, g.itot) * 0.1,
    }
    n2 = rng.rand(g.ktot, g.jtot, g.itot) * 1e-4
    return s, sfc, n2


@pytest.mark.parametrize("surface", [True, False])
def test_smag2_matches_reference_kernels(surface):
    m = build(INI_SURFACE if surface else INI_RESOLVED)
    g = m.grid
    ks, ke = g.kstart, g.kend
    it, jt = g.itot, g.jtot
    i0, i1, j0, j1 = GC, GC + it, GC, GC + jt
    assert m.diff.surface == surface

    s, sfc, n2 = rand_fields(m, seed=42 + surface)
    m.diff.thermo = FakeThermo(jnp.asarray(n2))
    sj = {k: jnp.asarray(v) for k, v in s.items()}
    sfcj = {k: jnp.asarray(v) for k, v in sfc.items()}

    # --- strain2 ---
    mine_s2 = np.asarray(m.diff.calc_strain2(m.ctx, sj, sfcj))
    u, v, w = (pad_xy(s[n], GC) for n in ("u", "v", "w"))
    s2 = np.zeros_like(u)
    dzi, dzhi = np.asarray(m.ctx.dzi), np.asarray(m.ctx.dzhi)
    ref.calc_strain2(s2, u, v, w, pad_xy(sfc["dudz_mo"][None], GC)[0],
                     pad_xy(sfc["dvdz_mo"][None], GC)[0],
                     np.asarray(m.ctx.z), dzi, dzhi, g.dxi, g.dyi,
                     i0, i1, j0, j1, ks, ke, surface)
    np.testing.assert_allclose(mine_s2, s2[ks:ke, j0:j1, i0:i1],
                               rtol=1e-13, atol=1e-15)

    # --- evisc ---
    aux = m.diff.exec_viscosity(m.ctx, sj, sfcj, {})
    mine_ev = np.asarray(aux["evisc"])
    ev = s2.copy()
    n2p = np.zeros_like(ev)
    n2p[ks:ke, j0:j1, i0:i1] = n2
    ref.calc_evisc(ev, n2p, pad_xy(sfc["dbdz_mo"][None], GC)[0],
                   np.asarray(m.ctx.z), g.dz, m.diff.z0m, g.dx, g.dy,
                   m.diff.cs, m.diff.tPr, i0, i1, j0, j1, ks, ke, surface)
    np.testing.assert_allclose(mine_ev[ks:ke], ev[ks:ke, j0:j1, i0:i1],
                               rtol=1e-12, atol=1e-16)

    # --- diffusion tendencies (feed both sides the same evisc array) ---
    t = {n: jnp.zeros_like(v) for n, v in sj.items()}
    t = m.diff.exec(m.ctx, sj, t, aux, sfcj)
    mine_t = {k: np.asarray(a) for k, a in t.items()}

    evp = pad_xy(mine_ev, GC)   # includes the mirrored ghost levels
    rho, rhoh = np.asarray(m.ctx.rhoref), np.asarray(m.ctx.rhorefh)
    zero2d = np.zeros((jt + 2 * GC, it + 2 * GC))
    fb = {k: pad_xy(sfc[k][None], GC)[0] for k in
          ("u_fluxbot", "v_fluxbot", "s1_fluxbot")}
    args_uv = (dzi, dzhi, g.dxi, g.dyi, evp)
    ut = np.zeros_like(u)
    ref.diff_u(ut, u, v, w, *args_uv, fb["u_fluxbot"], zero2d, rho, rhoh,
               m.diff.visc, i0, i1, j0, j1, ks, ke, surface)
    vt = np.zeros_like(u)
    ref.diff_v(vt, u, v, w, *args_uv, fb["v_fluxbot"], zero2d, rho, rhoh,
               m.diff.visc, i0, i1, j0, j1, ks, ke, surface)
    wt = np.zeros_like(u)
    ref.diff_w(wt, u, v, w, dzi, dzhi, g.dxi, g.dyi, evp, rho, rhoh,
               m.diff.visc, i0, i1, j0, j1, ks, ke)
    st = np.zeros_like(u)
    ref.diff_c(st, pad_xy(s["s1"], GC), dzi, dzhi, g.dxi ** 2, g.dyi ** 2,
               evp, fb["s1_fluxbot"], zero2d, rho, rhoh, m.diff.tPr,
               m.diff.viscs["s1"], i0, i1, j0, j1, ks, ke, surface)

    for name, orac in (("u", ut), ("v", vt), ("s1", st)):
        np.testing.assert_allclose(
            mine_t[name][ks:ke], orac[ks:ke, j0:j1, i0:i1],
            rtol=0, atol=1e-12, err_msg="diff %s (surface=%s)" % (name, surface))
    np.testing.assert_allclose(
        mine_t["w"][ks + 1:ke], wt[ks + 1:ke, j0:j1, i0:i1],
        rtol=0, atol=1e-12, err_msg="diff w (surface=%s)" % surface)

    # --- diffusion-number limit ---
    mine_dn = float(m.diff.get_dn(m.ctx, sj, aux))
    orac_dn = ref.calc_dnmul(evp, dzi, g.dxi ** 2, g.dyi ** 2, m.diff.tPr,
                             i0, i1, j0, j1, ks, ke)
    assert mine_dn == pytest.approx(orac_dn, rel=1e-13)
