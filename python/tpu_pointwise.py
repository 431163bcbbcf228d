"""Deterministic short-horizon POINTWISE parity between the Pallas fused
TPU kernels and the plain-jnp XLA path, on the real TPU backend.

The CPU interpret-mode kernel tests pin jnp-vs-Pallas at 1e-12; the
mean-level sweep in tpu_vs_cpu.py covers long horizons.  This closes the
gap in between: the TPU-COMPILED kernels themselves, compared pointwise
against the TPU-compiled jnp path over a few RK3 steps, where the only
divergence is f32 reassociation (bounded, deterministic run-to-run for a
fixed compiled program).

Checks the full prognostic state after N steps at max relative error
<= TOL (default 2e-5: ~200 ulps of headroom over single-step rounding,
growth over 3 steps included).

Usage:  python python/tpu_pointwise.py [--size 128] [--steps 3]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_path(size, steps, fused):
    os.environ["MICROHH_FUSED"] = "1" if fused else "0"
    import __graft_entry__ as ge
    import jax
    import jax.numpy as jnp

    model = ge._build_model(size, size, size)
    model.build_step()
    s, t, sfc = ge._initial_state(model)
    dt = jnp.asarray(2.0, dtype=model.dtype)
    t0 = jnp.asarray(0.0, dtype=model.dtype)
    pp = model.pres_params
    if fused:
        # the fused build sets these markers; without them this script
        # would compare the jnp path against itself and prove nothing
        assert getattr(model, "_skip_buffer", False) or \
            getattr(model, "_skip_force", False), "fused kernels did not build"

    step = jax.jit(model._step_raw)
    for _ in range(steps):
        s, sfc, _aux = step(s, sfc, pp, dt, t0)
    jax.block_until_ready(s["u"])
    ks, ke = model.grid.kstart, model.grid.kend
    return {n: np.asarray(v)[ks:ke] for n, v in s.items()
            if np.asarray(v).ndim == 3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=2e-5)
    args = ap.parse_args()

    a = run_path(args.size, args.steps, fused=True)
    b = run_path(args.size, args.steps, fused=False)

    failed = []
    for name in sorted(a):
        scale = np.abs(b[name]).max() + 1e-30
        err = np.abs(a[name] - b[name]).max() / scale
        status = "ok" if err <= args.tol else "FAIL"
        print("%-6s max rel err %.3e  %s" % (name, err, status), flush=True)
        if err > args.tol:
            failed.append(name)
    if failed:
        print("POINTWISE PARITY FAILED: %s" % ", ".join(failed))
        return 1
    print("POINTWISE PARITY OK (%d^3, %d steps, tol %.1e)"
          % (args.size, args.steps, args.tol))
    return 0


if __name__ == "__main__":
    sys.exit(main())
