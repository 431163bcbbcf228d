"""Per-shard restart I/O for multi-host runs.

The reference writes each restart field as ONE binary file in interior
(ktot, jtot, itot) C order via collective MPI-IO subarray writes
(``src/field3d_io.cxx:112-134``), so any rank count can read any rank
count's files.  This module keeps that exact on-disk layout: every process
writes only the (j, i) pencil rectangles of its addressable shards into
the shared file (disjoint regions -> safe concurrent POSIX writes), and
loads build the global jax.Array shard-by-shard without ever gathering a
full field on one host.

Single-host runs keep the simple gather path in fields.py; Model switches
to this module when the state is not fully addressable (multi-process) —
see model.save_restart.
"""

import os

import numpy as np
import jax


def _interior_index(idx, kslice):
    """Shard index (kcells, jtot, itot) -> interior (ktot, jtot, itot)."""
    kdim = idx[0]
    if kdim != slice(None) and kdim != slice(None, None, None):
        raise ValueError("k axis must be unsharded for restart IO")
    return (kslice,) + tuple(idx[1:])


def save_field_sharded(arr, fname, ktot, jtot, itot, kstart, dtype=None):
    """Write this process's shards of a (kcells, jtot, itot) device array
    into the reference-layout file.  Every process calls this; each writes
    disjoint (j, i) rectangles.  Ghost k levels are stripped."""
    dtype = np.dtype(dtype or arr.dtype)
    nbytes = ktot * jtot * itot * dtype.itemsize
    # idempotent create+size from every process
    fd = os.open(fname, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, nbytes)
    finally:
        os.close(fd)
    mm = np.memmap(fname, dtype=dtype, mode="r+",
                   shape=(ktot, jtot, itot))
    seen = set()
    for sh in arr.addressable_shards:
        key = sh.index[1:]  # replicated shards appear once per device
        skey = tuple((s.start, s.stop) for s in key)
        if skey in seen:
            continue
        seen.add(skey)
        data = np.asarray(sh.data)[kstart:kstart + ktot]
        mm[(slice(None),) + tuple(key)] = data.astype(dtype)
    mm.flush()
    del mm


def load_field_sharded(fname, sharding, kcells, ktot, jtot, itot, kstart,
                       dtype, file_dtype=np.float64):
    """Build a sharded (kcells, jtot, itot) jax.Array from the reference-
    layout file, reading only this process's shard rectangles."""
    mm = np.memmap(fname, dtype=np.dtype(file_dtype), mode="r",
                   shape=(ktot, jtot, itot))

    def cb(idx):
        sub = np.zeros((kcells,) + tuple(
            len(range(*s.indices(n))) for s, n in
            zip(idx[1:], (jtot, itot))), dtype=dtype)
        sub[kstart:kstart + ktot] = mm[(slice(None),) + tuple(idx[1:])]
        return sub

    arr = jax.make_array_from_callback((kcells, jtot, itot), sharding, cb)
    del mm
    return arr


def load_plane_sharded(fname, sharding, jtot, itot, dtype,
                       file_dtype=np.float64):
    """Build a sharded 2-D (jtot, itot) jax.Array from the reference-layout
    file, reading only this process's shard rectangles (surface/soil-skin
    state analogue of load_field_sharded)."""
    mm = np.memmap(fname, dtype=np.dtype(file_dtype), mode="r",
                   shape=(jtot, itot))

    def cb(idx):
        return np.asarray(mm[tuple(idx)], dtype=dtype)

    arr = jax.make_array_from_callback((jtot, itot), sharding, cb)
    del mm
    return arr


def plane_sharding(sharding):
    """Drop the leading (k) axis of a 3-D NamedSharding -> the matching
    2-D (j, i) sharding for surface planes."""
    from jax.sharding import NamedSharding, PartitionSpec
    spec = sharding.spec
    return NamedSharding(sharding.mesh, PartitionSpec(*tuple(spec)[1:]))


def save_plane_sharded(arr, fname, jtot, itot, dtype=None):
    """2-D (jtot, itot) surface-state analogue of save_field_sharded."""
    dtype = np.dtype(dtype or arr.dtype)
    fd = os.open(fname, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, jtot * itot * dtype.itemsize)
    finally:
        os.close(fd)
    mm = np.memmap(fname, dtype=dtype, mode="r+", shape=(jtot, itot))
    seen = set()
    for sh in arr.addressable_shards:
        skey = tuple((s.start, s.stop) for s in sh.index)
        if skey in seen:
            continue
        seen.add(skey)
        mm[tuple(sh.index)] = np.asarray(sh.data).astype(dtype)
    mm.flush()
    del mm


def local_np(arr):
    """Host copy of a replicated (or addressable) array without a gather."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    sh = arr.addressable_shards[0]
    if np.asarray(sh.data).shape == arr.shape:
        return np.asarray(sh.data)
    raise ValueError("array is sharded across processes and not replicated")


def state_is_addressable(s):
    """True when every field is fully addressable from this process (the
    single-host gather path in fields.py then applies)."""
    return all(getattr(v, "is_fully_addressable", True) for v in s.values())
