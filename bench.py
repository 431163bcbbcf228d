"""Benchmark: drycblles LES wall-clock per RK3 step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus
"sizes_attempted"/"sizes_failed" so a fallback is never silent}.

Baseline (BASELINE.md): the reference's strong-scaling record is 1024^3 at
1.04 s/iter on 4096 SuperMUC cores ~= 1.0e9 grid-point updates/s aggregate
(one iter = full RK3 step).  vs_baseline = our grid-point updates/s on ONE
chip divided by that whole-machine 1.0e9.

The north-star config is drycblles 512^3 (BASELINE.json).  We attempt it
first; if it does not fit the chip's HBM we fall back and the JSON records
exactly which sizes were attempted and which failed.
"""

import gc
import json
import os
import sys
import time

import numpy as np


def _run_size(ge, size, ktot, nsteps):
    import jax
    import jax.numpy as jnp

    model = ge._build_model(size, size, ktot)
    model.build_step()
    s, t, sfc = ge._initial_state(model)
    dt = jnp.asarray(2.0, dtype=model.dtype)
    time0 = jnp.asarray(0.0, dtype=model.dtype)
    step = model._step_fn
    pp = model.pres_params

    # warmup (compile) + one settled step
    s, sfc, _ = step(s, sfc, pp, dt, time0)
    jax.block_until_ready(s["u"])

    t0 = time.perf_counter()
    for _ in range(nsteps):
        s, sfc, _ = step(s, sfc, pp, dt, time0)
    jax.block_until_ready(s["u"])
    t1 = time.perf_counter()
    # free device buffers before the next size is attempted
    del s, t, sfc, step, pp, model
    gc.collect()
    return (t1 - t0) / nsteps


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge

    if "BENCH_SIZE" in os.environ:
        sizes = [int(os.environ["BENCH_SIZE"])]
    else:
        # North star first (BASELINE.json: drycblles 512^3), then fallbacks.
        sizes = [512, 384, 256]
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))

    attempted, failed = [], {}
    result = None
    for size in sizes:
        ktot = int(os.environ.get("BENCH_KTOT", str(min(size, 512))))
        attempted.append([size, size, ktot])
        try:
            sec_per_step = _run_size(ge, size, ktot, nsteps)
            result = (size, ktot, sec_per_step)
            break
        except Exception as e:
            failed["%dx%dx%d" % (size, size, ktot)] = "%s: %s" % (
                type(e).__name__, str(e)[:200])
            gc.collect()
    if result is None:
        print(json.dumps({
            "metric": "drycblles LES wall-clock per RK3 step (1 chip)",
            "value": None, "unit": "s/step", "vs_baseline": 0.0,
            "sizes_attempted": attempted, "sizes_failed": failed,
        }))
        raise RuntimeError("no bench size fit: %s" % failed)

    size, ktot, sec_per_step = result
    points = size * size * ktot
    updates_per_s = points / sec_per_step

    baseline_agg = 1.0e9  # reference 1024^3 @ 1.04 s/iter on 4096 cores
    out = {
        "metric": "drycblles %dx%dx%d LES wall-clock per RK3 step (1 chip)"
                  % (size, size, ktot),
        "value": sec_per_step,
        "unit": "s/step",
        "vs_baseline": updates_per_s / baseline_agg,
        "updates_per_s": updates_per_s,
        "sizes_attempted": attempted,
        "sizes_failed": failed,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
