"""In-step perf + DIV probe at a given size (default 512^3, drycblles).

Measures the whole RK3 step exactly like bench.py (one device dispatch,
lax.scan over nsteps) and then reports max |div(u)| after the run, so a
precision experiment on the Poisson path is judged by BOTH numbers.
Isolated solve benchmarks mislead (XLA whole-program layout differs);
always measure in-step.

Usage: python python/perf_step.py [size [nsteps]]
Env knobs under test are read by the model (MICROHH_DFT_FWD_PRECISION,
MICROHH_EIGEN_PRECISION, MICROHH_DFT_PRECISION, MICROHH_DFT_SPLIT, ...).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    model = ge._build_model(size, size, min(size, 512))
    model.build_step()
    s, t, sfc = ge._initial_state(model)
    dt = jnp.asarray(2.0, dtype=model.dtype)
    time0 = jnp.asarray(0.0, dtype=model.dtype)
    pp = model.pres_params

    # pp must cross the jit boundary as an ARGUMENT: captured constants
    # ride the remote-compile payload on the tunneled chip (HTTP 413 once
    # the solver tables get big), arguments are runtime buffers.
    def chunk(s, sfc, pp):
        def body(carry, _):
            s, sfc = carry
            s, sfc, _aux = model._step_raw(s, sfc, pp, dt, time0)
            return (s, sfc), 0
        (s, sfc), _ = jax.lax.scan(body, (s, sfc), None, length=nsteps)
        return s, sfc

    chunk_j = jax.jit(chunk, donate_argnums=(0, 1))
    s1, sfc1 = chunk_j(s, sfc, pp)
    jax.block_until_ready(s1["u"])

    prof = os.environ.get("MICROHH_PROFILE")
    if prof:
        jax.profiler.start_trace(prof)
    t0 = time.perf_counter()
    s2, sfc2 = chunk_j(s1, sfc1, pp)
    jax.block_until_ready(s2["u"])
    t1 = time.perf_counter()
    if prof:
        jax.profiler.stop_trace()

    div = float(model.pres.divergence_max(model.ctx, s2))
    print("size=%d nsteps=%d  %.1f ms/step  DIV=%.4e  (fwd=%s eigen=%s dft=%s)"
          % (size, nsteps, (t1 - t0) / nsteps * 1e3, div,
             os.environ.get("MICROHH_DFT_FWD_PRECISION", "high"),
             os.environ.get("MICROHH_EIGEN_PRECISION", "high"),
             os.environ.get("MICROHH_DFT_PRECISION", "highest")))


if __name__ == "__main__":
    main()
