"""Two-stage Cooley-Tukey DFT (ops/dft_split.py) vs numpy FFTs and vs the
direct DFT-by-matmul Poisson path — f64 roundoff agreement."""

import functools
import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.ops.dft_split import (build_split_tables, cdft_axis1,
                                       rdft_last_fwd, splittable)

e = functools.partial(jnp.einsum)


def _tabs(N, prefix):
    return {k: jnp.asarray(v)
            for k, v in build_split_tables(N, np.float64, prefix).items()}


def test_rdft_matches_numpy():
    N = 256
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8, N))
    tabs = _tabs(N, "dsx")
    ihalf = N // 2 + 1
    Xr, Xi = rdft_last_fwd(jnp.asarray(x), tabs, "dsx", N // 128, ihalf, e)
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(Xr), ref.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Xi), ref.imag, atol=1e-9)


@pytest.mark.parametrize("N", [256, 384, 512])
def test_cdft_fwd_inv_matches_numpy(N):
    rng = np.random.default_rng(1)
    xr = rng.normal(size=(3, N, 5))
    xi = rng.normal(size=(3, N, 5))
    tabs = _tabs(N, "dsy")
    n2 = N // 128
    Yr, Yi = cdft_axis1(jnp.asarray(xr), jnp.asarray(xi), tabs, "dsy",
                        n2, -1, e)
    ref = np.fft.fft(xr + 1j * xi, axis=1)
    np.testing.assert_allclose(np.asarray(Yr), ref.real, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Yi), ref.imag, atol=1e-8)

    Zr, Zi = cdft_axis1(Yr, Yi, tabs, "dsy", n2, +1, e)
    np.testing.assert_allclose(np.asarray(Zr) / N, xr, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Zi) / N, xi, atol=1e-8)


def test_splittable():
    assert splittable(256) and splittable(384) and splittable(512)
    assert not splittable(192) and not splittable(100)


def test_pres2_split_matches_direct():
    """Whole Poisson solve: split transforms vs direct DFT path."""
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_2 import Pres2

    ini = Ini("""
[grid]
itot=256
jtot=256
ktot=12
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
""")
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
        os.environ["MICROHH_DFT_SPLIT"] = "1"
        x_split = np.asarray(p2.solve(Ctx(), rhs, pp))
        os.environ["MICROHH_DFT_SPLIT"] = "0"
        x_direct = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
        os.environ.pop("MICROHH_DFT_SPLIT", None)
    scale = np.abs(x_direct).max()
    assert np.abs(x_split - x_direct).max() / scale < 1e-11, \
        np.abs(x_split - x_direct).max() / scale


@pytest.mark.parametrize("N", [256, 384, 512])
def test_cdft_j4_roundtrip_and_permutation(N):
    """Sublane-clean j-split: forward output is the numpy FFT in the
    documented permuted order p = g1*128 + g2 <-> g = g1 + N1*g2; the
    inverse consumes that order directly."""
    from microhh_tpu.ops.dft_split import build_j4_tables, cdft_j4, \
        j4_mode_perm
    rng = np.random.default_rng(4)
    xr = rng.normal(size=(3, N, 5))
    xi = rng.normal(size=(3, N, 5))
    tabs = {k: jnp.asarray(v)
            for k, v in build_j4_tables(N, np.float64).items()}
    Yr, Yi = cdft_j4(jnp.asarray(xr), jnp.asarray(xi), tabs, -1, e)
    ref = np.fft.fft(xr + 1j * xi, axis=1)[:, j4_mode_perm(N)]
    np.testing.assert_allclose(np.asarray(Yr), ref.real, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Yi), ref.imag, atol=1e-8)

    Zr, Zi = cdft_j4(Yr, Yi, tabs, +1, e)
    np.testing.assert_allclose(np.asarray(Zr) / N, xr, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Zi) / N, xi, atol=1e-8)


def test_pres2_j4_split_matches_direct():
    """Whole Poisson solve with MICROHH_DFT_SPLIT=y4 (permuted-mode eigen
    tables) vs the direct DFT path."""
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_2 import Pres2

    ini = Ini("""
[grid]
itot=96
jtot=256
ktot=12
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
""")
    g = Grid(ini)
    dz = g.zsize / g.ktot
    g.set_z(np.linspace(0.5 * dz, g.zsize - 0.5 * dz, g.ktot))
    f = Fields(ini, g)
    p2 = Pres2(ini, g, f, dtype=np.float64)
    p2.set_values()
    pp = p2.device_params()
    assert "dy4_mc" in pp and "eigbm_y4" in pp
    rng = np.random.RandomState(5)
    rhs = jnp.asarray(rng.randn(g.ktot, g.jtot, g.itot))

    class Ctx:
        pass

    os.environ["MICROHH_DFT_POISSON"] = "1"
    try:
        os.environ["MICROHH_DFT_SPLIT"] = "y4"
        x_split = np.asarray(p2.solve(Ctx(), rhs, pp))
        os.environ["MICROHH_DFT_SPLIT"] = "0"
        x_direct = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
        os.environ.pop("MICROHH_DFT_SPLIT", None)
    scale = np.abs(x_direct).max()
    assert np.abs(x_split - x_direct).max() / scale < 1e-11, \
        np.abs(x_split - x_direct).max() / scale


@pytest.mark.parametrize("foldj,foldi", [("1", "0"), ("0", "1"),
                                         ("1", "1")])
def test_pres2_fold_matches_direct(foldj, foldi):
    """Whole Poisson solve with the symmetry-folded j and/or i transforms
    vs the dense DFT path, including an odd-k grid and a non-square plane
    so the fold indexing is exercised off the power-of-two sweet spot."""
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_2 import Pres2

    ini = Ini("""
[grid]
itot=96
jtot=64
ktot=13
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
""")
    g = Grid(ini)
    dz = g.zsize / g.ktot
    g.set_z(np.linspace(0.5 * dz, g.zsize - 0.5 * dz, g.ktot))
    f = Fields(ini, g)
    p2 = Pres2(ini, g, f, dtype=np.float64)
    p2.set_values()
    pp = p2.device_params()
    assert "dfj_C" in pp and "eigbm_fj" in pp
    rng = np.random.RandomState(6)
    rhs = jnp.asarray(rng.randn(g.ktot, g.jtot, g.itot))

    class Ctx:
        pass

    os.environ["MICROHH_DFT_POISSON"] = "1"
    try:
        os.environ["MICROHH_DFT_FOLDJ"] = foldj
        os.environ["MICROHH_DFT_FOLDI"] = foldi
        x_fold = np.asarray(p2.solve(Ctx(), rhs, pp))
        os.environ["MICROHH_DFT_FOLDJ"] = "0"
        os.environ["MICROHH_DFT_FOLDI"] = "0"
        x_direct = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
        os.environ.pop("MICROHH_DFT_FOLDJ", None)
        os.environ.pop("MICROHH_DFT_FOLDI", None)
    scale = np.abs(x_direct).max()
    assert np.abs(x_fold - x_direct).max() / scale < 1e-11, \
        np.abs(x_fold - x_direct).max() / scale
