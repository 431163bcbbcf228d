"""Per-shard restart I/O (parallel/shard_io.py): the sharded writer must
produce byte-identical files to the single-host gather path, round-trip
through the sharded loader, and work across REAL process boundaries (a
2-process jax.distributed CPU run exercising init_distributed + the mesh
+ concurrent writes into one file)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from microhh_tpu.parallel import shard_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mesh22():
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ("y", "x"))


def test_sharded_write_matches_gather(tmp_path):
    ktot, jtot, itot, kgc = 6, 16, 32, 1
    kcells = ktot + 2 * kgc
    rng = np.random.default_rng(0)
    full = rng.normal(size=(kcells, jtot, itot))
    mesh = _mesh22()
    sh = NamedSharding(mesh, P(None, "y", "x"))
    arr = jax.device_put(jnp.asarray(full), sh)

    f_sharded = str(tmp_path / "u.sharded")
    shard_io.save_field_sharded(arr, f_sharded, ktot, jtot, itot, kgc)
    f_gather = str(tmp_path / "u.gather")
    np.asarray(full[kgc:kgc + ktot]).tofile(f_gather)
    assert open(f_sharded, "rb").read() == open(f_gather, "rb").read()


def test_sharded_roundtrip(tmp_path):
    ktot, jtot, itot, kgc = 6, 16, 32, 1
    kcells = ktot + 2 * kgc
    rng = np.random.default_rng(1)
    full = rng.normal(size=(kcells, jtot, itot))
    full[:kgc] = 0.
    full[kgc + ktot:] = 0.
    mesh = _mesh22()
    sh = NamedSharding(mesh, P(None, "y", "x"))
    arr = jax.device_put(jnp.asarray(full), sh)

    fname = str(tmp_path / "w.rt")
    shard_io.save_field_sharded(arr, fname, ktot, jtot, itot, kgc)
    back = shard_io.load_field_sharded(fname, sh, kcells, ktot, jtot, itot,
                                       kgc, np.float64)
    assert back.sharding == sh
    np.testing.assert_array_equal(np.asarray(back), full)


def test_plane_sharded_write(tmp_path):
    jtot, itot = 16, 32
    rng = np.random.default_rng(2)
    plane = rng.normal(size=(jtot, itot))
    mesh = _mesh22()
    sh = NamedSharding(mesh, P("y", "x"))
    arr = jax.device_put(jnp.asarray(plane), sh)
    fname = str(tmp_path / "ustar.p")
    shard_io.save_plane_sharded(arr, fname, jtot, itot)
    np.testing.assert_array_equal(
        np.fromfile(fname).reshape(jtot, itot), plane)


def test_plane_sharded_roundtrip(tmp_path):
    jtot, itot = 16, 32
    rng = np.random.default_rng(3)
    plane = rng.normal(size=(jtot, itot))
    mesh = _mesh22()
    sh3 = NamedSharding(mesh, P(None, "y", "x"))
    sh2 = shard_io.plane_sharding(sh3)
    assert sh2.spec == P("y", "x")
    arr = jax.device_put(jnp.asarray(plane), sh2)
    fname = str(tmp_path / "wl.p")
    shard_io.save_plane_sharded(arr, fname, jtot, itot)
    back = shard_io.load_plane_sharded(fname, sh2, jtot, itot, np.float64)
    assert back.sharding == sh2
    np.testing.assert_array_equal(np.asarray(back), plane)


def test_soil_sharded_roundtrip(tmp_path):
    """Soil fields carry no ghost k levels: kcells == ktot, kstart == 0."""
    ktot, jtot, itot = 4, 16, 32
    rng = np.random.default_rng(4)
    full = rng.normal(size=(ktot, jtot, itot))
    mesh = _mesh22()
    sh = NamedSharding(mesh, P(None, "y", "x"))
    arr = jax.device_put(jnp.asarray(full), sh)
    fname = str(tmp_path / "tsoil.rt")
    shard_io.save_field_sharded(arr, fname, ktot, jtot, itot, 0)
    back = shard_io.load_field_sharded(fname, sh, ktot, ktot, jtot, itot,
                                       0, np.float64)
    np.testing.assert_array_equal(np.asarray(back), full)


WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, "@REPO@")

    pid = int(sys.argv[1])
    tmp = sys.argv[2]
    from microhh_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator="localhost:@PORT@", num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    devs = np.asarray(jax.devices()).reshape(2, 4)   # 2 procs x 4 local
    mesh = Mesh(devs, ("y", "x"))
    sh = NamedSharding(mesh, P(None, "y", "x"))

    ktot, jtot, itot, kgc = 4, 8, 16, 1
    kcells = ktot + 2 * kgc
    base = np.arange(kcells * jtot * itot, dtype=np.float64).reshape(
        kcells, jtot, itot)

    arr = jax.make_array_from_callback(
        (kcells, jtot, itot), sh, lambda idx: base[idx])

    # a collective across the process boundary must work (psum over mesh)
    from jax import shard_map
    tot = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), ("y", "x")),
        mesh=mesh, in_specs=P(None, "y", "x"), out_specs=P()))(arr)
    expect = float(base.sum())
    assert abs(float(np.asarray(tot.addressable_shards[0].data)) - expect) \\
        < 1e-6 * abs(expect)

    from microhh_tpu.parallel import shard_io
    fname = os.path.join(tmp, "field.bin")
    shard_io.save_field_sharded(arr, fname, ktot, jtot, itot, kgc)

    # filesystem-level barrier: wait until BOTH processes' writes landed
    import time
    open(os.path.join(tmp, "done.%d" % pid), "w").write("x")
    for _ in range(600):
        if all(os.path.exists(os.path.join(tmp, "done.%d" % q))
               for q in (0, 1)):
            break
        time.sleep(0.05)

    got = np.fromfile(fname).reshape(ktot, jtot, itot)
    np.testing.assert_array_equal(got, base[kgc:kgc + ktot])

    back = shard_io.load_field_sharded(fname, sh, kcells, ktot, jtot, itot,
                                       kgc, np.float64)
    for s in back.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(s.data)[kgc:kgc + ktot],
            base[kgc:kgc + ktot][(slice(None),) + tuple(s.index[1:])])
    print("WORKER%d-OK" % pid)
""")


def test_two_process_distributed(tmp_path):
    """Real 2-process jax.distributed leg: init_distributed, a cross-process
    psum, concurrent sharded writes, and a sharded load — all on CPU."""
    import socket
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    script = str(tmp_path / "worker.py")
    open(script, "w").write(WORKER.replace("@REPO@", REPO)
                            .replace("@PORT@", str(port)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out)
        assert "WORKER%d-OK" % i in out
