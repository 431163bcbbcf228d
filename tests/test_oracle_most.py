"""Reference-discretization parity: Monin-Obukhov surface layer.

Checks microhh_tpu.ops.most + BoundarySurface.exec against the literal
transliteration of monin_obukhov.h / boundary_surface_kernels.h /
boundary_surface.cxx (tests/oracle_ref/most_ref.py).  The Obukhov solve
itself is a Newton iteration (TPU redesign of the reference's LUT walk), so
it is validated through the defining relation's residual; everything
downstream (ustar, surfm, surfs, MO gradients) is exact-parity vs the oracle
given the same obuk."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops import most
from microhh_tpu import constants as cst

from oracle_ref import most_ref as ref

GC = 2   # surfm/surfs/dutot stencils reach at most 2 cells

INI = """
[grid]
itot=12
jtot=10
ktot=8
xsize=1200.
ysize=1000.
zsize=800.
swspatialorder=2

[advec]
swadvec=2

[diff]
swdiff=smag2

[pres]
swpres=0

[fields]
visc=1.e-5
svisc=1.e-5
slist=th

[boundary]
swboundary=surface
mbcbot=%(mbcbot)s
mbctop=freeslip
sbcbot=%(sbcbot)s
sbctop=neumann
sbot=%(sbot)s
stop=0.
z0m=0.1
z0h=0.01
%(extra)s

[time]
starttime=0
endtime=10.
savetime=10.
dt=1.
"""


class FakeThermo:
    scalars = ("th",)

    def __init__(self, bfluxbot, b=None, bbot=None, db_ref=0.01):
        self._bflux = bfluxbot
        self._b, self._bbot, self._db = b, bbot, db_ref

    def get_buoyancy_fluxbot(self, ctx, s, sfc):
        return self._bflux

    def get_buoyancy_surf(self, ctx, s, sfc):
        return self._b, self._bbot

    def get_db_ref(self):
        return self._db


def pad2(a):
    return np.pad(np.asarray(a, np.float64), GC, mode="wrap")


def build(mbcbot, sbcbot, sbot="0.1", extra=""):
    ini = Ini(INI % dict(mbcbot=mbcbot, sbcbot=sbcbot, sbot=sbot, extra=extra))
    m = Model(ini, "run", "omost")
    m.finish_setup()
    return m


def rand_inputs(m, seed):
    g = m.grid
    rng = np.random.RandomState(seed)
    s = {n: rng.randn(g.kcells, g.jtot, g.itot) for n in ("u", "v", "w", "th")}
    s["u"] += 2.0   # mean wind so dutot is mostly > minval
    sfc = m.boundary.init_surface_state()
    sfc["obuk"][:] = np.where(rng.rand(g.jtot, g.itot) > 0.5, -30., 80.)
    bflux = rng.randn(g.jtot, g.itot) * 0.01
    bflux = np.where(np.abs(bflux) < 1e-4, 1e-4, bflux)
    b = rng.randn(g.jtot, g.itot) * 0.02
    bbot = rng.randn(g.jtot, g.itot) * 0.02
    return s, sfc, bflux, b, bbot


def test_fm_fh_function_parity():
    L = np.concatenate([-np.logspace(-2, 8, 200), np.logspace(-2, 8, 200),
                        [-cst.dbig, cst.dbig]])
    zsl, z0m, z0h = 12.5, 0.1, 0.01
    np.testing.assert_allclose(np.asarray(most.fm(zsl, z0m, jnp.asarray(L))),
                               ref.fm(zsl, z0m, L), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(most.fh(zsl, z0h, jnp.asarray(L))),
                               ref.fh(zsl, z0h, L), rtol=1e-12)
    zeta = np.concatenate([-np.logspace(-4, 2, 100), np.logspace(-4, 2, 100)])
    np.testing.assert_allclose(np.asarray(most.phim(jnp.asarray(zeta))),
                               ref.phim(zeta), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(most.phih(jnp.asarray(zeta))),
                               ref.phih(zeta), rtol=1e-13)


@pytest.mark.parametrize("case", ["noslip_flux", "ustar_flux", "noslip_dirichlet"])
def test_surface_scheme_matches_reference(case):
    mbcbot = "ustar" if case == "ustar_flux" else "noslip"
    sbcbot = "dirichlet" if case == "noslip_dirichlet" else "flux"
    extra = "ustar=0.25" if mbcbot == "ustar" else ""
    m = build(mbcbot, sbcbot, extra=extra)
    g = m.grid
    ks = g.kstart
    zsl = float(g.z[ks])
    z0m, z0h = m.boundary.z0m, m.boundary.z0h

    s, sfc, bflux, b, bbot = rand_inputs(m, seed=11)
    m.boundary.thermo = FakeThermo(jnp.asarray(bflux), jnp.asarray(b),
                                   jnp.asarray(bbot))
    sj = {k: jnp.asarray(v) for k, v in s.items()}
    sfcj = {k: jnp.asarray(v) for k, v in sfc.items()}
    out = m.boundary.exec(m.ctx, sj, sfcj, {})
    out = {k: np.asarray(v) for k, v in out.items()}

    i0, i1, j0, j1 = GC, GC + g.itot, GC, GC + g.jtot
    args = (i0, i1, j0, j1)
    u0, v0 = pad2(s["u"][ks]), pad2(s["v"][ks])
    ubot, vbot = pad2(sfc["u_bot"]), pad2(sfc["v_bot"])

    # dutot
    dutot_o = ref.calc_dutot(u0, v0, ubot, vbot, *args)
    dutot_m = np.asarray(m.boundary._calc_dutot(m.ctx, sj, sfcj))
    np.testing.assert_allclose(dutot_m, dutot_o, rtol=1e-12)

    obuk, ustar = out["obuk"], out["ustar"]
    if case == "ustar_flux":
        np.testing.assert_allclose(obuk, ref.obuk_ustar_flux(0.25 * np.ones_like(bflux), bflux),
                                   rtol=1e-13)
        np.testing.assert_allclose(ustar, 0.25)
    else:
        # Newton-solved obuk must satisfy the defining relation; points the
        # solver clamped (no root on the stable branch) are excluded.
        zL = zsl / obuk
        if case == "noslip_flux":
            Ri = -cst.kappa * bflux * zsl / dutot_o ** 3
            resid = zL * ref.fm(zsl, z0m, obuk) ** 3 - Ri
        else:
            db = b - bbot + 0.01
            Ri = cst.kappa * db * zsl / dutot_o ** 2
            resid = zL * ref.fm(zsl, z0m, obuk) ** 2 / ref.fh(zsl, z0h, obuk) - Ri
        ok = zL < 0.9 * cst.zL_max
        assert ok.mean() > 0.4   # both regimes must actually be exercised
        assert np.abs(resid[ok]).max() < 1e-8, np.abs(resid[ok]).max()
        # ustar from the reference formula given the same obuk
        np.testing.assert_allclose(ustar, dutot_o * ref.fm(zsl, z0m, obuk),
                                   rtol=1e-12)

    # surfm — same obuk/ustar on both sides
    obuk_p, ustar_p = pad2(obuk), pad2(ustar)
    if mbcbot == "ustar":
        ufb, vfb, ugb, vgb = ref.surfm_ustar(u0, v0, ubot, vbot, ustar_p,
                                             zsl, *args)
    else:
        ufb, vfb, ugb, vgb = ref.surfm_dirichlet(u0, v0, ubot, vbot, ustar_p,
                                                 obuk_p, z0m, zsl, *args)
    np.testing.assert_allclose(out["u_fluxbot"], ufb, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(out["v_fluxbot"], vfb, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(out["u_gradbot"], ugb, rtol=1e-12)
    np.testing.assert_allclose(out["v_gradbot"], vgb, rtol=1e-12)

    # surfs
    th0 = s["th"][ks]
    if sbcbot == "dirichlet":
        flx, grd = ref.surfs_dirichlet(th0, sfc["th_bot"], ustar, obuk, z0h, zsl)
        np.testing.assert_allclose(out["th_fluxbot"], flx, rtol=1e-11, atol=1e-14)
    else:
        tb, grd = ref.surfs_flux(th0, sfc["th_fluxbot"], ustar, obuk, z0h, zsl)
        np.testing.assert_allclose(out["th_bot"], tb, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(out["th_gradbot"], grd, rtol=1e-11, atol=1e-14)

    # MO gradients for the SGS model
    dudz, dvdz = ref.calc_duvdz_mo(u0, v0, ubot, vbot, ustar_p, obuk_p,
                                   z0m, zsl, *args)
    np.testing.assert_allclose(out["dudz_mo"], dudz, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(out["dvdz_mo"], dvdz, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(out["dbdz_mo"],
                               ref.calc_dbdz_mo(bflux, ustar, obuk, zsl),
                               rtol=1e-11, atol=1e-14)
