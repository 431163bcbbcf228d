"""Native async writer: roundtrip + fallback."""

import os
import numpy as np

from microhh_tpu.utils import fastio


def test_async_write_roundtrip(tmp_path):
    lib = fastio.get_lib()
    arr = np.arange(1000, dtype=np.float64).reshape(10, 100)
    path = str(tmp_path / "field.bin")
    fastio.write_array(path, arr)
    fastio.flush()
    back = np.fromfile(path, dtype=np.float64).reshape(10, 100)
    assert np.array_equal(arr, back)
    assert fastio.errors() == 0


def test_many_concurrent_writes(tmp_path):
    rng = np.random.RandomState(0)
    arrays = [rng.randn(64, 64) for _ in range(20)]
    for i, a in enumerate(arrays):
        fastio.write_array(str(tmp_path / ("f%03d.bin" % i)), a)
    fastio.flush()
    for i, a in enumerate(arrays):
        back = np.fromfile(str(tmp_path / ("f%03d.bin" % i))).reshape(64, 64)
        assert np.array_equal(a, back)
