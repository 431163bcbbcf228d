"""2-moment warm-rain microphysics vs the scalar transliteration oracle
(tests/oracle_ref/microphys_2mom_ref.py): conversion tendencies per cell
and the SS08 sedimentation per column, pinned at 1e-12 relative — incl.
the reference quirks (tanh2 mu_r, mr_min=2.6e-10, the cc advance reading
c at the cell just left, and the nr loop's dzi-at-output-row)."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.ops.microphys import Microphys2momWarm
from tests.oracle_ref import microphys_2mom_ref as ref

GC = 3
KTOT, JTOT, ITOT = 16, 4, 6
KC = KTOT + 2 * GC
KS, KE = GC, GC + KTOT


class _Ctx:
    pass


class _FakeThermo:
    def __init__(self, ql, p, exn):
        self._ql = ql
        self._p = p
        self._exn = exn

    def get_ql(self, ctx, s, aux):
        return self._ql

    def _p_profiles(self, ctx, aux):
        return self._p, self._exn, None, None


def _setup(seed):
    rng = np.random.default_rng(seed)
    ctx = _Ctx()
    ctx.ks, ctx.ke = KS, KE
    ctx.dtype = np.float64
    dz = 25. * (1. + 0.3 * rng.random(KC))
    ctx.dz = jnp.asarray(dz)
    ctx.dzi = jnp.asarray(1. / dz)
    rho = np.exp(-0.08 * np.arange(KC))
    ctx.rhoref = jnp.asarray(rho)

    p = 1.0e5 * np.exp(-0.06 * np.arange(KC))
    exn = (p / 1.0e5) ** (287.04 / 1005.)

    # fields spanning the scheme's branches: dry cells, cloud-only, rain-only,
    # cloud+rain, large drops (breakup branch)
    ql = np.where(rng.random((KTOT, JTOT, ITOT)) < 0.5, 0.,
                  2e-3 * rng.random((KTOT, JTOT, ITOT)))
    qr = np.where(rng.random((KTOT, JTOT, ITOT)) < 0.4, 0.,
                  1.5e-3 * rng.random((KTOT, JTOT, ITOT)))
    nr = np.where(qr > 0., 10. ** rng.uniform(2., 7., (KTOT, JTOT, ITOT)), 0.)
    qt = ql + 5e-3 + 5e-3 * rng.random((KTOT, JTOT, ITOT))
    thl = 285. + 10. * rng.random((KTOT, JTOT, ITOT))

    s = {}
    for name, interior in (("qt", qt), ("thl", thl), ("qr", qr), ("nr", nr)):
        full = np.zeros((KC, JTOT, ITOT))
        full[KS:KE] = interior
        # zero-gradient ghosts (what the scalar BC fill produces)
        full[:KS] = full[KS]
        full[KE:] = full[KE - 1]
        s[name] = full
    return ctx, s, ql, p, exn, rho, dz


def _run_mine(ctx, s, ql, p, exn, dt, nc0):
    micro = object.__new__(Microphys2momWarm)
    micro.Nc0 = nc0
    micro.cflmax = 2.
    micro.thermo = _FakeThermo(jnp.asarray(ql), jnp.asarray(p),
                               jnp.asarray(exn))
    sj = {k: jnp.asarray(v) for k, v in s.items()}
    t0 = {n: jnp.zeros((KC, JTOT, ITOT)) for n in ("qt", "thl", "qr", "nr")}
    t, aux = micro.exec(ctx, sj, t0, {}, dt)
    return ({n: np.asarray(t[n][KS:KE]) for n in t},
            np.asarray(aux["rr_bot"]))


def test_2mom_warm_matches_reference():
    dt = 4.0
    nc0 = 70e6
    ctx, s, ql, p, exn, rho, dz = _setup(31)
    mine, rr_bot = _run_mine(ctx, s, ql, p, exn, dt, nc0)

    conv = {n: np.zeros((KTOT, JTOT, ITOT)) for n in ("qt", "thl", "qr", "nr")}
    for k in range(KTOT):
        for j in range(JTOT):
            for i in range(ITOT):
                qrt, nrt, qtt, thlt = ref.conversion_cell(
                    s["qr"][KS + k, j, i], s["nr"][KS + k, j, i],
                    s["qt"][KS + k, j, i], s["thl"][KS + k, j, i],
                    ql[k, j, i], rho[KS + k], exn[KS + k], p[KS + k], nc0)
                conv["qr"][k, j, i] = qrt
                conv["nr"][k, j, i] = nrt
                conv["qt"][k, j, i] = qtt
                conv["thl"][k, j, i] = thlt

    sed_qr = np.zeros((KTOT, JTOT, ITOT))
    sed_nr = np.zeros((KTOT, JTOT, ITOT))
    rr_o = np.zeros((JTOT, ITOT))
    dzi = 1. / dz
    for j in range(JTOT):
        for i in range(ITOT):
            qrt, nrt, rr = ref.sedimentation_column(
                s["qr"][:, j, i], s["nr"][:, j, i], rho, dzi, dz, dt, KS, KE)
            sed_qr[:, j, i] = qrt
            sed_nr[:, j, i] = nrt
            rr_o[j, i] = rr

    want = {"qt": conv["qt"], "thl": conv["thl"],
            "qr": conv["qr"] + sed_qr, "nr": conv["nr"] + sed_nr}
    for name in ("qt", "thl", "qr", "nr"):
        scale = max(np.abs(want[name]).max(), 1e-30)
        err = np.abs(mine[name] - want[name]).max() / scale
        assert err < 1e-12, (name, err)
    np.testing.assert_allclose(rr_bot, rr_o, rtol=1e-12,
                               atol=1e-14 * max(rr_o.max(), 1e-30))

    # branch coverage
    qr_i = s["qr"][KS:KE]
    mr = np.clip(rho[KS:KE, None, None] * qr_i / np.maximum(s["nr"][KS:KE], 1.),
                 ref.MR_MIN, ref.MR_MAX)
    dr = (mr / ref.PIRHOW) ** (1. / 3.)
    assert ((ql > ref.QL_MIN) & (qr_i > ref.QR_MIN)).any()
    assert (dr[qr_i > ref.QR_MIN] > 0.35e-3).any()      # breakup active


def test_2mom_warm_oracle_detects_perturbation():
    dt = 4.0
    ctx, s, ql, p, exn, rho, dz = _setup(37)
    mine, _ = _run_mine(ctx, s, ql, p, exn, dt, 70e6)
    bad = mine["qr"].copy()
    bad[KTOT // 2] *= (1. + 1e-6)
    assert np.abs(bad - mine["qr"]).max() > 1e-12


def test_2mom_warm_multicell_sedimentation():
    """CFL > 1 paths: the unrolled sweep must match the reference while
    loop when drops cross more than one cell per step."""
    dt = 5.0    # pushes the sedimentation CFL past 1 on 25 m cells
    ctx, s, ql, p, exn, rho, dz = _setup(41)
    s["qr"][KS:KE] = np.maximum(s["qr"][KS:KE], 5e-4)
    s["nr"][KS:KE] = np.maximum(s["nr"][KS:KE], 1e3)
    s["qr"][:KS] = s["qr"][KS]
    s["qr"][KE:] = s["qr"][KE - 1]
    s["nr"][:KS] = s["nr"][KS]
    s["nr"][KE:] = s["nr"][KE - 1]
    mine, rr_bot = _run_mine(ctx, s, ql, p, exn, dt, 70e6)

    dzi = 1. / dz
    for j in range(JTOT):
        for i in range(ITOT):
            qrt, nrt, rr = ref.sedimentation_column(
                s["qr"][:, j, i], s["nr"][:, j, i], rho, dzi, dz, dt, KS, KE)
            conv = np.zeros((KTOT, 4))
            for k in range(KTOT):
                conv[k] = ref.conversion_cell(
                    s["qr"][KS + k, j, i], s["nr"][KS + k, j, i],
                    s["qt"][KS + k, j, i], s["thl"][KS + k, j, i],
                    ql[k, j, i], rho[KS + k], exn[KS + k], p[KS + k], 70e6)
            want_qr = conv[:, 0] + qrt
            want_nr = conv[:, 1] + nrt
            scale = max(np.abs(want_qr).max(), 1e-30)
            assert np.abs(mine["qr"][:, j, i] - want_qr).max() / scale < 1e-12
            scale = max(np.abs(want_nr).max(), 1e-30)
            assert np.abs(mine["nr"][:, j, i] - want_nr).max() / scale < 1e-12
    # confirm the test actually exercised multi-cell crossings
    from microhh_tpu.ops.microphys import calc_rain_props
    qr_i = jnp.asarray(s["qr"][KS:KE])
    nr_i = jnp.asarray(s["nr"][KS:KE])
    _, _, mur, lamr = calc_rain_props(qr_i, nr_i, rho[KS:KE, None, None])
    w = np.asarray(jnp.clip(jnp.sqrt(1.2 / rho[KS:KE, None, None]) * 9.65
                            - 9.65 * np.exp(600 * 25e-6)
                            * (1. + 600. / lamr) ** (-(mur + 4.)), 0.1, 9.65))
    cfl = w * dzi[KS:KE, None, None] * dt
    assert (cfl > 1.2).any() and cfl.max() <= 2.0   # in-envelope multi-cell
