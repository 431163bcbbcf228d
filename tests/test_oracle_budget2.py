"""Reference-discretization parity: every budget_2 term vs the literal
transliteration (tests/oracle_ref/budget2_ref.py) on random fields.  This is
the oracle the closure test cannot provide: each term must match the
reference kernel's horizontal mean at f64 roundoff, row by row including
the wall rows."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.budget import budget2_profiles

from oracle_ref import budget2_ref as ref
from oracle_ref.interp import pad_xy

GC = 2

INI = """
[grid]
itot=10
jtot=8
ktot=12
xsize=2.3
ysize=1.7
zsize=2.9
swspatialorder=2

[advec]
swadvec=2

[diff]
swdiff=2

[pres]
swpres=0

[thermo]
swthermo=0

[fields]
visc=1.3e-3
svisc=1.1e-3
slist=s1

[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.

[time]
starttime=0
endtime=1
savetime=1
dt=0.01
"""


class FakeThermo:
    scalars = ("s1",)

    def __init__(self, b):
        self._b = b

    def get_buoyancy(self, ctx, s):
        return self._b


def test_budget2_matches_reference_kernels():
    m = Model(Ini(INI), "run", "obud")
    m.finish_setup()
    g = m.grid
    ks, ke = g.kstart, g.kend
    kt = g.ktot
    rng = np.random.RandomState(17)
    shape = (g.kcells, g.jtot, g.itot)
    s = {n: rng.randn(*shape) for n in ("u", "v", "w", "s1")}
    s["u"] += 1.5
    s["w"][ks] = 0.
    s["w"][ke] = 0.
    p = rng.randn(*shape)
    b = rng.randn(*shape) * 0.1
    fc = 1.2e-4
    visc = m.fields.visc
    svisc = m.fields.sp["s1"].visc

    sj = {k: jnp.asarray(v) for k, v in s.items()}
    prof = budget2_profiles(m.ctx, sj, {"p": jnp.asarray(p)},
                            FakeThermo(jnp.asarray(b)), visc,
                            svisc=svisc, fc=fc, utrans=0.3, vtrans=-0.2)
    prof = {k: np.asarray(v) for k, v in prof.items()}

    # oracle on padded arrays
    up, vp_, wp_ = (pad_xy(s[n], GC) for n in ("u", "v", "w"))
    pp = pad_xy(p, GC)
    bp = pad_xy(b, GC)
    i0, i1, j0, j1 = GC, GC + g.itot, GC, GC + g.jtot
    args = (i0, i1, j0, j1, ks, ke)
    dzi, dzhi = np.asarray(m.ctx.dzi), np.asarray(m.ctx.dzhi)
    dxi, dyi = g.dxi, g.dyi

    def mean_k(arr, k):
        return arr[k, j0:j1, i0:i1].mean()

    umean = np.array([mean_k(up, k) for k in range(g.kcells)])
    vmean = np.array([mean_k(vp_, k) for k in range(g.kcells)])
    wmean = np.array([mean_k(wp_, k) for k in range(g.kcells)])
    bmean = np.array([mean_k(bp, k) for k in range(g.kcells)])
    pmean = np.array([mean_k(pp, k) for k in range(g.kcells)])
    wx = np.zeros_like(wp_)
    wy = np.zeros_like(wp_)
    wx[:, :, 1:] = 0.5 * (wp_[:, :, 1:] + wp_[:, :, :-1])
    wx[:, :, 0] = 0.5 * (wp_[:, :, 0] + wp_[:, :, -1])
    wy[:, 1:, :] = 0.5 * (wp_[:, 1:, :] + wp_[:, :-1, :])
    wy[:, 0, :] = 0.5 * (wp_[:, 0, :] + wp_[:, -1, :])

    terms = {}
    terms.update(ref.shear_terms(up, vp_, wp_, umean, vmean, wmean, wx, wy,
                                 dzi, dzhi, *args))
    terms.update(ref.turb_terms(up, vp_, wp_, umean, vmean, wmean, wx, wy,
                                dzi, dzhi, *args))
    terms.update(ref.coriolis_terms(up, vp_, wp_, umean, vmean, wmean, fc,
                                    *args))
    terms.update(ref.pressure_transport_terms(up, vp_, wp_, pp, umean, vmean,
                                              wmean, dzi, dzhi, dxi, dyi,
                                              *args))
    terms.update(ref.pressure_redistribution_terms(up, vp_, wp_, pp, umean,
                                                   vmean, wmean, dzi, dzhi,
                                                   dxi, dyi, *args))
    terms.update(ref.diffusion_transport_terms_dns(up, vp_, wp_, umean, vmean,
                                                   wmean, wx, dzi, dzhi,
                                                   dxi, dyi, visc, *args))
    terms.update(ref.diffusion_dissipation_terms_dns(up, vp_, wp_, umean,
                                                     vmean, wmean, dzi, dzhi,
                                                     dxi, dyi, visc, *args))
    terms.update(ref.buoyancy_terms(up, vp_, wp_, bp, umean, vmean, wmean,
                                    bmean, *args))
    ad = ref.advection_terms_scalar(wp_, bp, bmean, dzi, dzhi, *args)
    terms["b2_shear"] = ad["s2_shear"]
    terms["b2_turb"] = ad["s2_turb"]
    terms["bw_shear"] = ad["sw_shear"]
    terms["bw_turb"] = ad["sw_turb"]
    terms["bw_buoy"] = ref.buoyancy_terms_scalar(bp, bp, bmean, bmean, *args)
    terms.update(ref.diffusion_terms_scalar_dns(wp_, bp, bmean, dzi, dzhi,
                                                dxi, dyi, visc, svisc, *args))
    prs = ref.pressure_terms_scalar(bp, pp, bmean, pmean, dzi, dzhi, *args)
    terms["bw_pres"] = prs["sw_pres"]
    terms["bw_rdstr"] = prs["sw_rdstr"]

    FULL = ["u2_shear", "v2_shear", "tke_shear",
            "u2_turb", "v2_turb", "tke_turb",
            "u2_cor", "v2_cor", "tke_pres",
            "u2_rdstr", "v2_rdstr",
            "u2_visc", "v2_visc", "tke_visc",
            "u2_diss", "v2_diss", "tke_diss",
            "tke_buoy", "b2_shear", "b2_turb", "b2_visc", "b2_diss"]
    HALF_ALLK = ["w2_turb", "uw_turb", "vw_turb",
                 "w2_visc", "uw_visc", "w2_diss", "uw_diss", "bw_visc",
                 "bw_diss"]
    HALF_NOTOP = ["uw_shear", "vw_shear", "uw_pres", "vw_pres",
                  "uw_rdstr", "vw_rdstr", "bw_shear", "bw_turb", "bw_buoy",
                  "bw_pres", "bw_rdstr"]
    HALF_INTERIOR = ["uw_cor", "vw_cor", "w2_buoy", "uw_buoy", "vw_buoy"]
    HALF_NOTOP_PLUSBOT = ["w2_pres", "w2_rdstr"]

    def want_half(name, lo, hi):
        return np.array([mean_k(terms[name], ks + h) for h in range(lo, hi)])

    for name in FULL:
        want = np.array([mean_k(terms[name], k) for k in range(ks, ke)])
        scale = max(np.abs(want).max(), 1e-14)
        np.testing.assert_allclose(prof[name], want, rtol=0,
                                   atol=1e-12 * scale, err_msg=name)
    for name, (lo, hi) in ([(n, (0, kt + 1)) for n in HALF_ALLK]
                           + [(n, (0, kt)) for n in HALF_NOTOP]
                           + [(n, (1, kt)) for n in HALF_INTERIOR]
                           + [(n, (0, kt)) for n in HALF_NOTOP_PLUSBOT]):
        want = want_half(name, lo, hi)
        scale = max(np.abs(want).max(), 1e-14)
        np.testing.assert_allclose(prof[name][lo:hi], want, rtol=0,
                                   atol=1e-12 * scale, err_msg=name)

    # kinetic energy
    ket = np.zeros(shape)
    tket = np.zeros(shape)
    for k in range(ks, ke):
        U = lambda di=0: np.roll(s["u"][k], -di, axis=-1)
        V = lambda dj=0: np.roll(s["v"][k], -dj, axis=-2)
        u2 = (0.5 * (s["u"][k] + 0.3 + np.roll(s["u"][k], -1, -1) + 0.3)) ** 2
        v2 = (0.5 * (s["v"][k] - 0.2 + np.roll(s["v"][k], -1, -2) - 0.2)) ** 2
        w2 = (0.5 * (s["w"][k] + s["w"][k + 1])) ** 2
        ket[k] = 0.5 * (u2 + v2 + w2)
        u2p = (0.5 * (s["u"][k] - umean[k] + np.roll(s["u"][k], -1, -1) - umean[k])) ** 2
        v2p = (0.5 * (s["v"][k] - vmean[k] + np.roll(s["v"][k], -1, -2) - vmean[k])) ** 2
        w2p = (0.5 * (s["w"][k] - wmean[k] + s["w"][k + 1] - wmean[k + 1])) ** 2
        tket[k] = 0.5 * (u2p + v2p + w2p)
    np.testing.assert_allclose(prof["ke"], ket[ks:ke].mean(axis=(1, 2)),
                               rtol=1e-12)
    np.testing.assert_allclose(prof["tke"], tket[ks:ke].mean(axis=(1, 2)),
                               rtol=1e-12)
