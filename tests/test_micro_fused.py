"""Parity of the fused 2mom_warm Pallas kernel vs the jnp pipeline.

The kernel (ops/microphys_pallas.py) mirrors Microphys2momWarm.exec
expression-for-expression; in interpret mode on the f64 CPU backend the
two must agree to reassociation ulps (the limiter's cumsum runs as a
prefix tree in XLA and a sequential sweep in the kernel)."""

import numpy as np
import jax.numpy as jnp

from test_microphys import build_model


def _random_state(m, seed=7, rainy=True):
    g = m.grid
    rng = np.random.default_rng(seed)
    shape = (g.kcells, g.jtot, g.itot)
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros(shape) for n in m.fields.prognostic_names}
    thl = 292. + 0.003 * m.grid.z[:, None, None] + 0.3 * rng.standard_normal(shape)
    qt = np.clip(0.016 - 4e-6 * m.grid.z[:, None, None]
                 + 0.002 * rng.standard_normal(shape), 0., None)
    qr = np.zeros(shape)
    nr = np.zeros(shape)
    if rainy:
        # patchy rain shafts spanning several vertical cells, plus zeros
        # (the QR_MIN mask must agree between the paths)
        mask = rng.random(shape) > 0.5
        qr = np.where(mask, 10. ** rng.uniform(-8, -3, shape), 0.)
        nr = np.where(mask, qr * 10. ** rng.uniform(6.5, 7.5, shape), 0.)
    s["thl"] = jnp.asarray(thl)
    s["qt"] = jnp.asarray(qt)
    s["qr"] = jnp.asarray(qr)
    s["nr"] = jnp.asarray(nr)
    return s


def _compare(m, s, dt):
    ctx = m.ctx
    t0 = {n: jnp.asarray(np.random.default_rng(3).standard_normal(
        np.shape(v)) * 1e-6) for n, v in s.items()}

    m.micro.force_fused = False
    t_ref, aux_ref = m.micro.exec(ctx, s, dict(t0), {}, dt)

    m.micro.force_fused = True
    m.micro._fused = None
    t_k, aux_k = m.micro.exec(ctx, s, dict(t0), {}, dt)
    assert m.micro._fused is not None, "kernel path must have engaged"

    ks, ke = ctx.ks, ctx.ke
    for n in ("qr", "nr", "qt", "thl"):
        a = np.asarray(t_ref[n])[ks:ke]
        b = np.asarray(t_k[n])[ks:ke]
        scale = np.abs(a).max() + 1e-300
        err = np.abs(a - b).max() / scale
        assert err < 1e-11, (n, err)
        # ghost rows pass through untouched
        np.testing.assert_array_equal(np.asarray(t_k[n])[:ks],
                                      np.asarray(t0[n])[:ks])
    rr_a = np.asarray(aux_ref["rr_bot"])
    rr_b = np.asarray(aux_k["rr_bot"])
    scale = np.abs(rr_a).max() + 1e-300
    assert np.abs(rr_a - rr_b).max() / scale < 1e-11


def test_fused_micro_matches_jnp_rainy(tmp_path):
    m = build_model(tmp_path)
    _compare(m, _random_state(m, rainy=True), dt=2.0)


def test_fused_micro_matches_jnp_strong_sedimentation(tmp_path):
    """Large dt drives the sedimentation CFL toward cflmax so drops cross
    multiple cells: the ring-buffer gather and the cc-chain masks must
    match the unrolled jnp sweep exactly."""
    m = build_model(tmp_path)
    s = _random_state(m, seed=11, rainy=True)
    # heavy rain: high fall speeds
    s["qr"] = s["qr"] * 50.
    _compare(m, s, dt=8.0)


def test_fused_micro_matches_jnp_cloudfree(tmp_path):
    m = build_model(tmp_path)
    s = _random_state(m, seed=5, rainy=False)
    _compare(m, s, dt=2.0)
