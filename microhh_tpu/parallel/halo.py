"""Halo exchange + shard_map wrappers for the fused Pallas kernels.

The reference exchanges ghost columns with neighbor Isend/Irecv
(``src/boundary_cyclic.cxx:116-177``).  Here a shard_map region pads each
P(None,'y','x') shard with H periodic halo columns via two ``ppermute``
stages (y first, then x on the y-extended slab, so corners ride along),
runs the UNCHANGED full-plane Pallas kernels on the padded planes — their
``jnp.roll`` wraps only corrupt entries within the trimmed margin — and
returns the interior.  The XLA wall patches stay outside on global arrays,
where GSPMD lowers their rolls to collective permutes by itself.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

# Halo width: the deepest stencil chain in the fused math is 2.  The evisc
# consumed by the tendency kernels passes through a GLOBAL array between
# the two pallas calls (so its own halo is re-exchanged), keeping 2 enough.
HALO = 2


def _axis_size(name):
    try:
        return jax.lax.axis_size(name)
    except Exception:
        return jax.lax.psum(1, name)


def _pad_axis(x, axis_name, dim, h=HALO):
    """Append h columns from both periodic neighbors along array dim
    ``dim``, exchanged over mesh axis ``axis_name``."""
    n = _axis_size(axis_name)
    lo = jax.lax.slice_in_dim(x, 0, h, axis=dim)
    hi = jax.lax.slice_in_dim(x, x.shape[dim] - h, x.shape[dim], axis=dim)
    if n == 1:
        left, right = hi, lo
    else:
        perm_fwd = [(i, (i + 1) % n) for i in range(n)]   # send to right
        perm_bwd = [(i, (i - 1) % n) for i in range(n)]   # send to left
        # halo to my LEFT = right edge of left neighbor -> left neighbor
        # sends its hi forward
        left = jax.lax.ppermute(hi, axis_name, perm_fwd)
        right = jax.lax.ppermute(lo, axis_name, perm_bwd)
    return jnp.concatenate([left, x, right], axis=dim)


def halo_pad(x, ydim=-2, xdim=-1, h=HALO):
    """(…, jl, il) shard -> (…, jl+2h, il+2h) with periodic halos."""
    x = _pad_axis(x, "y", ydim % x.ndim, h)
    x = _pad_axis(x, "x", xdim % x.ndim, h)
    return x


def sharded_planes_call(mesh, fn, n_out, *arrays, scalars=(), halo=HALO):
    """Run ``fn(*padded_arrays, *scalars) -> tuple`` per shard with
    halo-padded operands, trimming each output's margins.  arrays are
    (k, j, i) global fields sharded P(None, 'y', 'x'); outputs have the
    operands' interior shape.  ``scalars`` are replicated 0-d/1-d values
    passed through unpadded (traced values must ride as arguments — a
    tracer closed over inside shard_map is rejected)."""
    spec = P(None, "y", "x")
    rep = P()

    def local(*xs):
        n = len(arrays)
        padded = [halo_pad(x, h=halo) for x in xs[:n]]
        outs = fn(*padded, *xs[n:])
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        return tuple(o[..., halo:o.shape[-2] - halo, halo:o.shape[-1] - halo]
                     for o in outs)

    in_specs = (spec,) * len(arrays) + (rep,) * len(scalars)
    try:  # pallas out_shapes carry no varying-manual-axes info
        out = shard_map(local, mesh=mesh, in_specs=in_specs,
                        out_specs=(spec,) * n_out, check_vma=False)(
                            *arrays, *scalars)
    except TypeError:  # older jax spells it check_rep
        out = shard_map(local, mesh=mesh, in_specs=in_specs,
                        out_specs=(spec,) * n_out, check_rep=False)(
                            *arrays, *scalars)
    return out
