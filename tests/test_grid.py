import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.grid import Grid


def make_ini(order=2, itot=16, jtot=16, ktot=8, zsize=0.5):
    return Ini("""
[grid]
itot=%d
jtot=%d
ktot=%d
xsize=1.
ysize=1.
zsize=%f
swspatialorder=%d
""" % (itot, jtot, ktot, zsize, order))


def uniform_z(ktot, zsize):
    dz = zsize / ktot
    return np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)


def test_grid_2nd_uniform():
    g = Grid(make_ini(2), uniform_z(8, 0.5))
    ks, ke = g.kstart, g.kend
    dz = 0.5 / 8
    assert np.allclose(g.dz[ks:ke], dz)
    assert np.allclose(g.dzh[ks:ke + 1], dz)
    assert np.allclose(g.zh[ks], 0.0)
    assert np.allclose(g.zh[ke], 0.5)
    # ghost z mirrors (reference grid.cxx:267-268)
    assert np.isclose(g.z[ks - 1], -g.z[ks])
    assert np.isclose(g.z[ke], 2 * 0.5 - g.z[ke - 1])
    assert np.allclose(g.x, (np.arange(16) + 0.5) / 16.)
    assert np.allclose(g.xh, np.arange(16) / 16.)


def test_grid_4th_uniform():
    g = Grid(make_ini(4, ktot=16), uniform_z(16, 0.5))
    ks, ke = g.kstart, g.kend
    assert g.kgc == 3
    dz = 0.5 / 16
    assert np.allclose(g.dz[ks:ke], dz)
    # 4th-order metric arrays exist on the interior
    assert np.all(np.isfinite(g.dzi4[ks:ke]))
    assert np.allclose(g.dzi4[ks + 2:ke - 2], 1. / dz)
    assert np.allclose(g.dzhi4[ks + 2:ke - 1], 1. / dz)


def test_grid_save_load_roundtrip(tmp_path):
    g = Grid(make_ini(2), uniform_z(8, 0.5))
    path = str(tmp_path / "grid.0000000")
    g.save(path)
    g2 = Grid(make_ini(2))
    g2.load(path)
    assert np.allclose(g2.z, g.z)
    assert np.allclose(g2.dzhi, g.dzhi)


def test_grid_nonuniform():
    # stretched grid: metric identities must hold
    ktot = 32
    z = np.cumsum(np.linspace(1.0, 2.0, ktot))
    z = 0.5 * z / z[-1] * 0.98
    ini = make_ini(2, ktot=ktot)
    g = Grid(ini, z)
    ks, ke = g.kstart, g.kend
    assert np.allclose(g.dzh[ks + 1:ke], np.diff(z))
    assert np.allclose(g.dz[ks:ke], np.diff(g.zh[ks:ke + 1]))
    assert np.allclose(g.dzi[ks:ke] * g.dz[ks:ke], 1.0)
