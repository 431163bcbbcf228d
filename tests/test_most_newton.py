"""The Newton z/L solvers must agree with the reference LUT inversion."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.ops import most


def test_newton_flux_matches_lut():
    z0m = z0h = 0.1
    zsl = 25.
    zL_sl, f_sl = most.prepare_lut(z0m, z0h, zsl, True, True)
    zl64 = zL_sl.astype(np.float64)
    f64 = f_sl.astype(np.float64)

    # stay within the invertible range of the stable branch (the peak of
    # zL*fm^3 sits near zL~0.75 for this zsl/z0m)
    zL_true = np.array([-800., -30., -2., -0.2, -1e-3, 1e-3, 0.1, 0.5])
    Ri = np.interp(zL_true, zl64, f64)

    zL0 = jnp.full(zL_true.shape, -0.5)  # cold-ish start, wrong magnitudes
    out = np.asarray(most.solve_zL_flux(jnp.asarray(Ri), zL0, zsl, z0m, niter=15))
    assert np.allclose(out, zL_true, rtol=2e-3), np.abs(out / zL_true - 1)

    # beyond the peak: clamps to zL_max like the reference LUT walk
    out = np.asarray(most.solve_zL_flux(jnp.asarray([1e4]), jnp.asarray([0.5]),
                                        zsl, z0m))
    assert out[0] == most.cst.zL_max


def test_newton_dirichlet_matches_lut():
    z0m = z0h = 0.01
    zsl = 10.
    zL_sl, f_sl = most.prepare_lut(z0m, z0h, zsl, True, False)
    zl64 = zL_sl.astype(np.float64)
    f64 = f_sl.astype(np.float64)

    zL_true = np.array([-100., -5., -0.3, -1e-2, 1e-2, 0.3, 1.0])
    Ri = np.interp(zL_true, zl64, f64)
    zL0 = jnp.full(zL_true.shape, 0.3)
    out = np.asarray(most.solve_zL_dirichlet(jnp.asarray(Ri), zL0, zsl, z0m, z0h, niter=15))
    assert np.allclose(out, zL_true, rtol=2e-3), out / zL_true - 1


def test_newton_no_solution_clamps():
    out = np.asarray(most.solve_zL_dirichlet(jnp.asarray([0.5]), jnp.asarray([0.1]),
                                             10., 0.01, 0.01))
    assert out[0] == most.cst.zL_max


def test_newton_warm_start_converges_fast():
    """With a warm start near the root, few iterations give high accuracy."""
    z0m = 0.1
    zsl = 25.
    zL_true = np.array([-1.3])
    Ri = zL_true * np.asarray(most.fm(zsl, z0m, zsl / jnp.asarray(zL_true))) ** 3
    out = np.asarray(most.solve_zL_flux(jnp.asarray(Ri), jnp.asarray(zL_true * 1.05),
                                        zsl, z0m, niter=4))
    assert abs(out[0] / zL_true[0] - 1.) < 1e-6
