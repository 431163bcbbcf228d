"""Weak-scaling sweep over a virtual (or real) device mesh.

The reference records weak scaling as time/iter with a fixed 64x32x1024
block per processor (``scaling/weakscaling.juqueen``,
``cases/weakscaling/weakscaling.ini``).  This driver grows itot/jtot with
the mesh so each device keeps the same block, jits the full step over the
P(None,'y','x') pencil sharding, and prints time/iter per mesh size.

On a real multi-chip platform the timings are the weak-scaling curve; on
the default virtual-CPU mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count) they validate the mechanism, not
the performance.

Usage: python python/scaling.py [--devices 1,2,4,8] [--block 32x16x64]
                                [--steps 5]
"""

import argparse
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--block", default="32x16x64",
                   help="per-device itot x jtot x ktot")
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    counts = [int(c) for c in args.devices.split(",")]
    bi, bj, bk = (int(v) for v in args.block.split("x"))

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=%d"
                                   % max(counts))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # Force the virtual CPU platform unless real devices cover the sweep
    # (same pattern as __graft_entry__._provision_virtual_devices; must
    # happen before the backend initializes).
    if os.environ.get("SCALING_REAL_TPU", "0") != "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if os.environ.get("SCALING_REAL_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    from microhh_tpu.parallel import mesh as pmesh

    print("%8s %8s %12s %14s" % ("devices", "mesh", "grid", "time/iter [s]"),
          flush=True)
    for n in counts:
        npy, npx = pmesh.auto_mesh_shape(n)
        itot, jtot = bi * npx, bj * npy
        ini = Ini("""
[grid]
itot=%d
jtot=%d
ktot=%d
xsize=2.
ysize=2.
zsize=1.
swspatialorder=2
[fields]
visc=4.e-5
svisc=4.e-5
slist=b
[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=flux
sbctop=neumann
sbot=0.005
stop=0.
[buffer]
swbuffer=1
zstart=0.8
sigma=0.27
beta=2.
[time]
starttime=0
endtime=1.
savetime=1.
dt=0.001
""" % (itot, jtot, bk))
        m = Model(ini, "run", "ws")
        if n > 1:
            m.set_mesh(pmesh.make_mesh(npy, npx))
        m.finish_setup()
        m.build_step()
        g = m.grid
        rng = np.random.RandomState(1)
        s = {}
        for name in m.fields.all_prognostic_names:
            a = np.zeros((g.kcells, jtot, itot))
            a[g.kstart:g.kend] = 1e-2 * rng.randn(g.ktot, jtot, itot)
            s[name] = jnp.asarray(a, dtype=m.dtype)
        if n > 1:
            fs = pmesh.field_sharding(m.mesh)
            s = {k: jax.device_put(v, fs) for k, v in s.items()}
        dt = jnp.asarray(1e-3, dtype=m.dtype)
        tz = jnp.asarray(0.0, dtype=m.dtype)
        step = jax.jit(m._step_raw)
        ctxmgr = m.mesh if m.mesh is not None else _null()
        with ctxmgr:
            out = step(s, {}, m.pres_params, dt, tz)
            jax.block_until_ready(out[0]["u"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = step(out[0], {}, m.pres_params, dt, tz)
            jax.block_until_ready(out[0]["u"])
            t1 = time.perf_counter()
        print("%8d %8s %12s %14.4f"
              % (n, "%dx%d" % (npy, npx), "%dx%dx%d" % (itot, jtot, bk),
                 (t1 - t0) / args.steps), flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
