"""Reference-discretization oracles.

Literal numpy transliterations of upstream MicroHH compute kernels
(/root/reference/src/*.cxx), used ONLY as test fixtures: each oracle mirrors
the reference's loop/row structure and index arithmetic so that a coefficient
or stencil error anywhere in microhh_tpu's vectorized JAX operators fails the
f64 parity tests at ~1e-12.  These are not part of the framework and are never
imported by microhh_tpu itself.

Array convention: numpy arrays indexed [k, j, i] with explicit ghost cells in
every dimension (like the reference), istart/iend etc. passed explicitly.
"""
