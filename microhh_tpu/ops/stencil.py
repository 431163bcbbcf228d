"""Shift helpers for horizontally-periodic stencils.

Arrays are (k, j, i).  Horizontal periodicity is expressed with ``jnp.roll``;
single-chip XLA lowers this to two slices + concat (cheap, fully fused), and
under a sharded-in-(j,i) layout GSPMD lowers the wrap into ICI
collective-permutes — the TPU equivalent of the reference's MPI halo exchange
(``src/boundary_cyclic.cxx``).  Vertical shifts are explicit k-slices; ghost
levels exist in the arrays (see grid.py).
"""

import jax.numpy as jnp

__all__ = ["im", "ip", "jm", "jp", "i2"]


def im(a, n=1):
    """a[..., i-n] with periodic wrap."""
    return jnp.roll(a, n, axis=-1)


def ip(a, n=1):
    """a[..., i+n] with periodic wrap."""
    return jnp.roll(a, -n, axis=-1)


def jm(a, n=1):
    """a[:, j-n, :] with periodic wrap."""
    return jnp.roll(a, n, axis=-2)


def jp(a, n=1):
    """a[:, j+n, :] with periodic wrap."""
    return jnp.roll(a, -n, axis=-2)


def i2(a, b):
    """2nd-order midpoint interpolation (reference interp2)."""
    return 0.5 * (a + b)
