"""Banded einsum gas optics (_BandOptics) vs the per-g-point reference
path: the one-hot matmul interpolation must reproduce tau_gpt /
planck_gpt / rayleigh_gpt (which are oracle-tested against the
transliteration) to roundoff."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))

from microhh_tpu.ops.rrtmgp_optics import KDistribution, _BandOptics, \
    col_amounts


@pytest.fixture(scope="module")
def kds(tmp_path_factory):
    import make_rrtmgp_coefficients as mk
    wd = str(tmp_path_factory.mktemp("band_tabs"))
    mk.main(wd)
    return (KDistribution(os.path.join(wd, "coefficients_lw.nc")),
            KDistribution(os.path.join(wd, "coefficients_sw.nc")))


def _column(nlay=20, nx=4, seed=3):
    rng = np.random.default_rng(seed)
    p = np.geomspace(1.0e5, 2.0e3, nlay)
    play = jnp.asarray(p)[:, None, None] * jnp.ones((1, nx, nx))
    plev = jnp.concatenate([jnp.asarray([1.02e5]),
                            jnp.asarray(0.5 * (p[:-1] + p[1:])),
                            jnp.asarray([1.0e3])])[:, None, None] \
        * jnp.ones((1, nx, nx))
    tlay = jnp.asarray(288. - 60. * np.linspace(0., 1., nlay))[:, None, None] \
        + 2. * rng.standard_normal((nlay, nx, nx))
    qv = jnp.asarray(np.clip(
        0.01 * np.exp(-np.linspace(0., 3., nlay))[:, None, None]
        + 1e-3 * rng.standard_normal((nlay, nx, nx)), 1e-7, None))
    col_dry, cols = col_amounts(play, plev, qv,
                                {"co2": 4.0e-4, "o3": 5.0e-8})
    return play, tlay, col_dry, cols


def _compare(kd, want_planck, want_rayleigh):
    play, tlay, col_dry, cols = _column()
    idx = kd.interp_indices(play, tlay)
    bo = _BandOptics(kd, idx, cols, col_dry, play, tlay, jnp.float64)
    tsfc = jnp.broadcast_to(292., tlay.shape[1:])[None]
    idx0 = {k: v[:1] for k, v in idx.items()}
    cols0 = {k: v[:1] for k, v in cols.items()}
    for b in range(kd.band2gpt.shape[0]):
        res = bo.band_all(b, t_sfc=tsfc, want_planck=want_planck,
                          want_rayleigh=want_rayleigh)
        gp = bo.gpts(b)
        for i, g in enumerate(gp):
            tau_ref = np.asarray(kd.tau_gpt(
                int(g), idx, cols, col_dry, play, tlay, dtype=jnp.float64))
            got = np.asarray(res["tau"][..., i])
            scale = np.abs(tau_ref).max() + 1e-300
            assert np.abs(got - tau_ref).max() / scale < 1e-12, (b, g)
            if want_planck:
                src_ref = np.asarray(kd.planck_gpt(
                    int(g), idx, cols, tlay, dtype=jnp.float64))
                gots = np.asarray(res["lay_src"][..., i])
                s2 = np.abs(src_ref).max() + 1e-300
                assert np.abs(gots - src_ref).max() / s2 < 1e-12, (b, g)
                sfc_ref = np.asarray(kd.planck_gpt(
                    int(g), idx0, cols0, tsfc, dtype=jnp.float64))[0]
                gsfc = np.asarray(res["sfc_src"][..., i])
                assert np.abs(gsfc - sfc_ref).max() / s2 < 1e-12, (b, g)
            if want_rayleigh:
                ray_ref = np.asarray(kd.rayleigh_gpt(
                    int(g), idx, cols, col_dry, dtype=jnp.float64))
                gotr = np.asarray(res["kray"][..., i])
                s3 = np.abs(ray_ref).max() + 1e-300
                assert np.abs(gotr - ray_ref).max() / s3 < 1e-12, (b, g)


def test_banded_matches_per_g_lw(kds):
    _compare(kds[0], want_planck=True, want_rayleigh=False)


def test_banded_matches_per_g_sw(kds):
    _compare(kds[1], want_planck=False, want_rayleigh=True)
