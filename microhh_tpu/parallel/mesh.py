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


class SlabPlan:
    """Resharding plan for the distributed spectral Poisson solve.

    The reference FFTs along x, MPI-transposes to y-pencils, FFTs along y,
    transposes to z-pencils, runs the vertical solve, and transposes back
    (``src/transpose.cxx``, ``src/fft.cxx``).  On TPU the same dataflow is
    expressed as sharding constraints: force **z-slabs** (k sharded over the
    whole mesh, horizontal local) around the batched ``rfft2``/``irfft2`` and
    **mode-slabs** (j sharded, k local) around the vertical solve.  GSPMD
    lowers each transition to one all-to-all over ICI — without the
    constraints it would all-gather the full field onto every chip to run
    the sharded-axis FFT.
    """

    def __init__(self, mesh):
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)

    def _con(self, x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    def zslab(self, x, from_modes=False):
        """(k, j, i*) with k sharded over the flattened mesh: FFTs are local.
        The reshard moves each mesh axis in its own hop — one all-to-all
        each — because the SPMD partitioner replicates ("involuntary full
        rematerialization") when asked to move two axes between different
        dims at once.  From the pencil layout 'y' moves j->k then 'x' moves
        i->k; from the mode-slab layout 'y' then 'x' both move j->k."""
        if len(self.axes) == 2:
            if from_modes:
                x = self._con(x, P(self.axes[0], self.axes[1], None))
            else:
                x = self._con(x, P(self.axes[0], None, self.axes[1]))
        return self._con(x, P(self.axes, None, None))

    def modeslab(self, x):
        """(k, j, i*) with j sharded over the flattened mesh: the vertical
        tridiagonal/heptadiagonal solve is local."""
        return self._con(x, P(None, self.axes, None))

    def pencil(self, x):
        """Back to the production field layout P(None, 'y', 'x'), again in
        two single-axis hops from the z-slab layout."""
        if len(self.axes) == 2:
            x = self._con(x, P(self.axes[0], None, self.axes[1]))
            return self._con(x, P(None, self.axes[0], self.axes[1]))
        return self._con(x, P(None, self.axes[0], None))


def spectral_slab_plan(mesh, kmax, jtot):
    """A :class:`SlabPlan` when the mesh is non-trivial and both the k and j
    extents divide evenly over all devices; ``None`` otherwise (GSPMD then
    falls back to its default resharding)."""
    if mesh is None:
        return None
    n = int(np.prod(list(mesh.shape.values())))
    if n <= 1 or kmax % n or jtot % n:
        return None
    return SlabPlan(mesh)


def auto_mesh_shape(n_devices):
    """Factor n into the squarest (npy, npx)."""
    best = (n_devices, 1)
    for npx in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % npx == 0:
            best = (n_devices // npx, npx)
    return best


# ---------------------------------------------------------------------------
#  multi-host / multi-slice
# ---------------------------------------------------------------------------

def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Start the jax.distributed runtime for multi-host runs (the analog of
    the reference's MPI_Init, ``src/master_parallel.cxx:57-86``).  On cloud
    TPU pods the arguments auto-detect; pass them explicitly elsewhere."""
    import jax
    # Do NOT touch jax.process_count()/devices() here: that would
    # initialize the backend BEFORE distributed init, which silently
    # degrades the run to single-process.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()   # cloud auto-detection
    except (RuntimeError, ValueError):
        pass  # single-process run


def make_multislice_mesh(n_slices, npy, npx, devices=None):
    """3-axis ('dcn', 'y', 'x') mesh for multi-slice TPU runs.

    The slow DCN axis stacks extra y-pencil rows on top of the per-slice
    ICI mesh: fields shard P(None, ('dcn','y'), 'x'), so halo exchanges
    cross DCN only at one row of the process grid per slice — the same
    surface-to-volume contact the reference's 2-D rank grid gives a row of
    nodes (SURVEY §5.8).  On real pods use mesh_utils'
    hybrid mesh so the DCN axis maps to actual slice boundaries; on a flat
    device list (tests) the axis is a plain outer reshape."""
    if devices is None:
        devices = jax.devices()
    n = n_slices * npy * npx
    if len(devices) < n:
        raise ValueError("need %d devices, have %d" % (n, len(devices)))
    try:
        from jax.experimental import mesh_utils
        devs = mesh_utils.create_hybrid_device_mesh(
            (npy, npx), (n_slices, 1),
            devices=devices[:n], allow_split_physical_axes=True)
        devs = devs.reshape(n_slices, npy, npx)
    except Exception:
        devs = np.asarray(devices[:n]).reshape(n_slices, npy, npx)
    return Mesh(devs, ("dcn", "y", "x"))


def multislice_field_sharding(mesh):
    """(kcells, jtot, itot) fields on a ('dcn','y','x') mesh: j splits over
    DCN x ICI, i over ICI."""
    return NamedSharding(mesh, P(None, ("dcn", "y"), "x"))
