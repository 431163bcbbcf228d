"""RK-folded fused kernels: tendencies_rk must reproduce the separate
fused_tendencies + XLA axpy/scale passes exactly, and the whole rkfold
step path (including the pressure exec_star split) must match the
regular substep pipeline to roundoff."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops.pallas_fused import (FusedLES2, fused_exec_viscosity,
                                          fused_tendencies,
                                          fused_tendencies_rk)

from tests.test_pallas_fused import INI, setup  # noqa: F401  (fixture)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("carry", [True, False])
@pytest.mark.parametrize("fold_ghosts", [False, True])
def test_rkfold_kernels_match(setup, tiled, carry, fold_ghosts):  # noqa: F811
    m, ctx, s, sfc, _ = setup
    fused = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=tiled, tj=8, fold_ghosts=fold_ghosts)
    aux = fused_exec_viscosity(fused, ctx, s, sfc, {})
    rng = np.random.RandomState(11)
    t0 = {n: jnp.asarray(np.pad(
        0.1 * rng.randn(ctx.ktot, ctx.jtot, ctx.itot),
        ((ctx.ks, s[n].shape[0] - ctx.ke), (0, 0), (0, 0))))
        for n in s}
    cbdt, can = 0.7, (-5. / 9. if carry else 0.)

    # reference: accumulate, then axpy + scale
    t_ref = fused_tendencies(fused, ctx, s, dict(t0), aux, sfc)
    s_ref = {n: s[n] + cbdt * t_ref[n] for n in s}
    t_ref_scaled = {n: can * t_ref[n] for n in s}

    s_star, t_s, rhs = fused_tendencies_rk(fused, ctx, s, dict(t0), aux, sfc,
                                           cbdt, can)
    assert rhs is None

    ks, ke = ctx.ks, ctx.ke
    for name in ("u", "v", "w", "th"):
        a = np.asarray(s_ref[name])[ks:ke]
        b = np.asarray(s_star[name])[ks:ke]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-12, ("s*", name, err)
    # w* wall rows exact
    assert np.asarray(s_star["w"])[ke].max() == 0.
    if carry:
        for name in ("u", "v", "w", "th"):
            a = np.asarray(t_ref_scaled[name])[ks:ke]
            b = np.asarray(t_s[name])[ks:ke]
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-12, ("t", name, err)
    else:
        assert t_s is None


@pytest.mark.parametrize("carry", [True, False])
@pytest.mark.parametrize("first", [False, True])
def test_rkfold_rhs_fold_matches_glue(setup, carry, first):  # noqa: F811
    """The Poisson rhs emitted by the tiled RK kernel sweep (rhs_dti)
    must equal PresGlue.rhs applied to the patched s* afterwards, and the
    s*/t outputs must be unchanged by the fold."""
    from microhh_tpu.ops.pallas_fused import PresGlue

    m, ctx, s, sfc, _ = setup
    fused = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=True, tj=8, fold_ghosts=True)
    aux = fused_exec_viscosity(fused, ctx, s, sfc, {})
    rng = np.random.RandomState(13)
    if first:
        t0 = {n: jnp.zeros_like(s[n]) for n in s}
    else:
        t0 = {n: jnp.asarray(np.pad(
            0.1 * rng.randn(ctx.ktot, ctx.jtot, ctx.itot),
            ((ctx.ks, s[n].shape[0] - ctx.ke), (0, 0), (0, 0))))
            for n in s}
    cbdt, can = 0.7, (-5. / 9. if carry else 0.)

    s_ref, t_ref, _ = fused_tendencies_rk(fused, ctx, s, dict(t0), aux, sfc,
                                          cbdt, can, first=first)
    glue = PresGlue(ctx, True)
    rhs_ref = glue.rhs(s_ref["u"], s_ref["v"], s_ref["w"], 1. / cbdt)

    s_star, t_s, rhs = fused_tendencies_rk(fused, ctx, s, dict(t0), aux, sfc,
                                           cbdt, can, first=first,
                                           rhs_dti=1. / cbdt)
    assert rhs is not None

    ks, ke = ctx.ks, ctx.ke
    for name in ("u", "v", "w", "th"):
        a = np.asarray(s_ref[name])[ks:ke]
        b = np.asarray(s_star[name])[ks:ke]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-12, ("s*", name, err)
        if carry:
            a = np.asarray(t_ref[name])[ks:ke]
            b = np.asarray(t_s[name])[ks:ke]
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-12, ("t", name, err)
    a, b = np.asarray(rhs_ref), np.asarray(rhs)
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    assert err < 1e-11, ("rhs", err)


def test_rkfold_step_matches():
    """Whole-step parity: MICROHH_RKFOLD=1 (with and without the Pallas
    pressure-glue kernels, full-plane AND j-tiled with the in-kernel
    Poisson rhs) vs =0 on the same drycbl-style model (CPU interpret
    mode)."""
    results = {}
    for rk, glue, variant in (("1", "1", ""), ("1", "0", ""),
                              ("0", "1", ""), ("1", "1", "tiled")):
        key = rk + glue + variant
        os.environ["MICROHH_RKFOLD"] = rk
        os.environ["MICROHH_PRES_FUSED"] = glue
        if variant:
            os.environ["MICROHH_FUSED_VARIANT"] = variant
        try:
            m = Model(Ini(INI), "run", "rkstep")
            m.finish_setup()
            m.force_fused = True
            m.build_step()
            assert m._use_rkfold == (rk == "1")
            if variant == "tiled":
                # the leg must actually take the in-kernel-rhs path
                assert m._fused.tiled and m._fused.fold_ghosts
            g = m.grid
            rng = np.random.RandomState(5)
            s = {}
            for name in m.fields.prognostic_names:
                a = np.zeros((g.kcells, g.jtot, g.itot))
                a[g.kstart:g.kend] = 0.3 * rng.randn(g.ktot, g.jtot, g.itot)
                s[name] = a
            s["th"][g.kstart:g.kend] += 300. + 0.003 * g.z[g.kstart:g.kend,
                                                           None, None]
            s["w"][g.kstart] = 0.
            s["w"][g.kend] = 0.
            s = {k: jnp.asarray(v) for k, v in s.items()}
            sfc_np = m.boundary.init_surface_state()
            sfc = {k: jnp.asarray(v) for k, v in sfc_np.items()}
            dt = jnp.asarray(2.0)
            tz = jnp.asarray(0.0)
            for _ in range(2):
                s, sfc, aux = m._step_raw(s, sfc, m.pres_params, dt, tz)
            results[key] = {n: np.asarray(v)[g.kstart:g.kend]
                            for n, v in s.items()}
            results[key]["p"] = np.asarray(aux["p"])[g.kstart:g.kend]
        finally:
            os.environ.pop("MICROHH_RKFOLD", None)
            os.environ.pop("MICROHH_PRES_FUSED", None)
            os.environ.pop("MICROHH_FUSED_VARIANT", None)
    for key in ("11", "10", "11tiled"):
        for name in results[key]:
            a, b = results["01"][name], results[key][name]
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-11, (key, name, err)
