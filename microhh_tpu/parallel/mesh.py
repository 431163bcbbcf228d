"""Device-mesh / sharding helpers.

The reference decomposes the horizontal plane over an npy x npx MPI grid with
halo exchanges and pencil transposes (``src/master_parallel.cxx``,
``src/transpose.cxx``).  The TPU equivalent is a 2-D ``jax.sharding.Mesh``
('y', 'x') with fields sharded P(None, 'y', 'x') — z stays local exactly like
the reference's pencils.  Under jit, GSPMD turns the stencil rolls into ICI
collective-permutes (the halo exchange) and reshards the FFT axes as needed
(the transposes); reductions become psums on the mesh.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(npy, npx, devices=None):
    """2-D ('y','x') mesh mirroring the reference's npy x npx process grid."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < npy * npx:
        raise ValueError("need %d devices, have %d" % (npy * npx, len(devices)))
    devs = np.asarray(devices[:npy * npx]).reshape(npy, npx)
    return Mesh(devs, ("y", "x"))


def field_sharding(mesh):
    """(kcells, jtot, itot) arrays: z local, horizontal sharded."""
    return NamedSharding(mesh, P(None, "y", "x"))


def surface_sharding(mesh):
    """(jtot, itot) surface planes."""
    return NamedSharding(mesh, P("y", "x"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_state(s, t, sfc, mesh):
    """Place a model state on the mesh."""
    fs = field_sharding(mesh)
    ss = surface_sharding(mesh)
    s = {k: jax.device_put(v, fs) for k, v in s.items()}
    t = {k: jax.device_put(v, fs) for k, v in t.items()}
    sfc = {k: jax.device_put(v, ss) for k, v in sfc.items()}
    return s, t, sfc


def auto_mesh_shape(n_devices):
    """Factor n into the squarest (npy, npx)."""
    best = (n_devices, 1)
    for npx in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % npx == 0:
            best = (n_devices // npx, npx)
    return best
