import numpy as np

from microhh_tpu.utils import nc


def test_roundtrip_with_groups(tmp_path):
    path = str(tmp_path / "case_input.nc")
    f = nc.Dataset(path, "w")
    f.createDimension("z", 8)
    vz = f.createVariable("z", "f8", ("z",))
    vz[:] = np.arange(8) * 0.5

    g = f.createGroup("init")
    g.createDimension("z", 8)
    vu = g.createVariable("u", "f8", ("z",))
    vu[:] = np.linspace(0, 1, 8)
    f.close()

    f = nc.Dataset(path, "r")
    assert "z" in f.dimensions
    assert np.allclose(f.variables["z"][:], np.arange(8) * 0.5)
    assert "init" in f.groups
    assert np.allclose(f.groups["init"].variables["u"][:], np.linspace(0, 1, 8))
    f.close()


def test_unlimited_dimension(tmp_path):
    path = str(tmp_path / "stats.nc")
    f = nc.Dataset(path, "w")
    f.createDimension("time", None)
    f.createDimension("z", 4)
    t = f.createVariable("time", "f8", ("time",))
    p = f.createVariable("prof", "f8", ("time", "z"))
    for i in range(3):
        t[i] = i * 10.0
        p[i, :] = np.full(4, float(i))
    f.close()

    f = nc.Dataset(path, "r")
    assert f.variables["time"].shape == (3,)
    assert np.allclose(f.variables["prof"][:], np.arange(3)[:, None] * np.ones(4))
    f.close()


def test_attributes(tmp_path):
    path = str(tmp_path / "a.nc")
    f = nc.Dataset(path, "w")
    f.createDimension("z", 2)
    v = f.createVariable("q", "f4", ("z",))
    v.setncattr("units", "kg kg-1")
    v.long_name = "moisture"
    f.close()
    f = nc.Dataset(path, "r")
    assert f.variables["q"].getncattr("units") == "kg kg-1"
    assert f.variables["q"].long_name == "moisture"
    f.close()
