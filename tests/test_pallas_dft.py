"""Fused radix-4 Pallas DFT kernels (ops/pallas_dft.py): f64 agreement
with numpy FFTs in the documented permuted mode order, roundtrip identity,
and whole-Poisson-solve parity against the direct DFT-by-matmul path.

CPU runs the kernels in interpret mode (the solve branch chooses it off-TPU
automatically); the TPU-compiled kernels are covered by the in-step
divergence checks (python/perf_step.py) and the pointwise parity sweep."""

import os

import numpy as np
import jax.numpy as jnp

from microhh_tpu.ops.pallas_dft import (build_pallas_dft_tables, dft2_fwd,
                                        dft2_inv, pallas_dft_ok,
                                        pallas_mode_perm_j,
                                        pallas_mode_perm_x, pallas_radix)


def _pp(itot, jtot):
    return {k: jnp.asarray(v)
            for k, v in build_pallas_dft_tables(itot, jtot,
                                                np.float64).items()}


def test_gate():
    assert pallas_dft_ok(512, 512) and pallas_dft_ok(1024, 512)
    assert pallas_dft_ok(384, 512) and pallas_dft_ok(384, 384)
    assert pallas_radix(384) == 3 and pallas_radix(768) == 3
    assert pallas_radix(1536) == 4  # %512 wins: shorter contractions
    assert not pallas_dft_ok(512, 256) and not pallas_dft_ok(640, 512)


import pytest


@pytest.mark.parametrize("itot,jtot", [(512, 512), (384, 384), (384, 512),
                                       (512, 384)])
def test_fwd_matches_numpy_permuted(itot, jtot):
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((2, jtot, itot))
    Yr, Yi = dft2_fwd(jnp.asarray(rhs), _pp(itot, jtot), None,
                      interpret=True)
    ref = np.fft.fft2(rhs, axes=(1, 2))
    ref = ref[:, pallas_mode_perm_j(jtot)][:, :, pallas_mode_perm_x(itot)]
    np.testing.assert_allclose(np.asarray(Yr), ref.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Yi), ref.imag, atol=1e-9)


@pytest.mark.parametrize("itot,jtot", [(512, 512), (384, 384),
                                       (512, 384)])
def test_roundtrip_identity(itot, jtot):
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((2, jtot, itot))
    pp = _pp(itot, jtot)
    Yr, Yi = dft2_fwd(jnp.asarray(rhs), pp, None, interpret=True)
    out = dft2_inv(Yr, Yi, pp, None, itot, interpret=True)
    np.testing.assert_allclose(np.asarray(out), rhs, atol=1e-11)


@pytest.mark.parametrize("itot,jtot", [(512, 512), (384, 384)])
def test_pres2_pallas_matches_direct(itot, jtot):
    """Whole Poisson solve: Pallas radix kernels + permuted eigen tables
    vs the direct DFT path (same eigen solve, dense tables)."""
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_2 import Pres2

    ini = Ini("""
[grid]
itot=%d
jtot=%d
ktot=8
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=2
[fields]
visc=1e-5
[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0
stop=0
[time]
endtime=1
savetime=1
dt=0.1
""" % (itot, jtot))
    g = Grid(ini)
    dz = g.zsize / g.ktot
    g.set_z(np.linspace(0.5 * dz, g.zsize - 0.5 * dz, g.ktot))
    f = Fields(ini, g)
    p2 = Pres2(ini, g, f, dtype=np.float64)
    p2.set_values()
    pp = p2.device_params()
    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(g.ktot, g.jtot, g.itot))

    class Ctx:
        pass

    os.environ["MICROHH_DFT_POISSON"] = "1"
    try:
        os.environ["MICROHH_DFT_PALLAS"] = "1"
        x_pl = np.asarray(p2.solve(Ctx(), rhs, pp))
        os.environ["MICROHH_DFT_PALLAS"] = "0"
        x_direct = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
        os.environ.pop("MICROHH_DFT_PALLAS", None)
    scale = np.abs(x_direct).max()
    assert np.abs(x_pl - x_direct).max() / scale < 1e-11, \
        np.abs(x_pl - x_direct).max() / scale
