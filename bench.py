"""Benchmark: drycblles LES wall-clock per RK3 step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's strong-scaling record is 1024^3 at
1.04 s/iter on 4096 SuperMUC cores ~= 1.0e9 grid-point updates/s aggregate
(one iter = full RK3 step).  vs_baseline = our grid-point updates/s on ONE
chip divided by that whole-machine 1.0e9.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    if "BENCH_SIZE" in os.environ:
        sizes = [int(os.environ["BENCH_SIZE"])]
    else:
        # 512^3 needs ~17GB in f32 — beyond one 16GB v5e chip (the
        # BASELINE.json target assumed a v5p-16 with 95GB/chip); 512x512x128
        # runs at ~2.0e8 pts/s.  256^3 uses the full-plane fused kernels
        # (58 ms/step), 384^3 the j-tiled double-buffered-DMA variant
        # (0.32 s/step).  Report 256^3 as the headline.
        sizes = [256, 384]
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))

    model = s = None
    for size in sizes:
        ktot = int(os.environ.get("BENCH_KTOT", str(min(size, 512))))
        try:
            model = ge._build_model(size, size, ktot)
            model.build_step()
            s, t, sfc = ge._initial_state(model)
            dt0 = jnp.asarray(2.0, dtype=model.dtype)
            time0 = jnp.asarray(0.0, dtype=model.dtype)
            out = model._step_fn(s, t, sfc, model.pres_params, dt0, time0)
            jax.block_until_ready(out[0]["u"])
            s, t, sfc = out[0], out[1], out[2]
            break
        except Exception as e:
            sys.stderr.write("size %d failed: %s\n" % (size, type(e).__name__))
            model = None
    if model is None:
        raise RuntimeError("no bench size fit")

    dt = jnp.asarray(2.0, dtype=model.dtype)
    step = model._step_fn
    pp = model.pres_params

    time0 = jnp.asarray(0.0, dtype=model.dtype)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        s, t, sfc, aux = step(s, t, sfc, pp, dt, time0)
    jax.block_until_ready(s["u"])
    t1 = time.perf_counter()

    sec_per_step = (t1 - t0) / nsteps
    points = size * size * ktot
    updates_per_s = points / sec_per_step

    baseline_agg = 1.0e9  # reference 1024^3 @ 1.04 s/iter on 4096 cores
    out = {
        "metric": "drycblles %dx%dx%d LES wall-clock per RK3 step (1 chip)" % (size, size, ktot),
        "value": sec_per_step,
        "unit": "s/step",
        "vs_baseline": updates_per_s / baseline_agg,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
