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
    pp = model.pres_params

    # One device dispatch for all nsteps (lax.scan over the step) — the
    # per-call host->device round trip otherwise costs ~2-3 ms/step
    # through the remote-chip tunnel.
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
    s1, sfc1 = chunk_j(s, sfc, pp)   # warmup/compile
    jax.block_until_ready(s1["u"])

    t0 = time.perf_counter()
    s2, sfc2 = chunk_j(s1, sfc1, pp)
    jax.block_until_ready(s2["u"])
    t1 = time.perf_counter()
    del s, t, sfc, s1, sfc1, s2, sfc2, pp, model, chunk_j
    gc.collect()
    return (t1 - t0) / nsteps


def _run_moist_size(size, ktot, nsteps):
    """Bomex/rico-class moist step: thermo_moist + 2mom_warm + limiter +
    geo/ls/subsidence forcing — the generic fused path the headline dry
    metric never touches (round-4 item 4)."""
    import re
    import shutil
    import subprocess
    import tempfile

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.abspath(__file__))
    wd = tempfile.mkdtemp(prefix="bench_rico_")
    ini_txt = open(os.path.join(repo, "cases/rico/rico.ini")).read()
    for key, val in (("itot", size), ("jtot", size), ("ktot", ktot)):
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=%d" % (key, val), ini_txt)
    for key in ("swstats", "swcross", "swdump", "swcolumn", "swbudget"):
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=0" % key, ini_txt)
    # the metric targets the bomex/rico op SET (thermo_moist + 2mom_warm +
    # limiter + geo/ls/subsidence) on the production fast path: advec 2
    # engages the generic fused + rkfold kernels (rico's 2i5 would fall to
    # the XLA op pipeline, benchmarking a different code path)
    ini_txt = re.sub(r"(?m)^swadvec=.*$", "swadvec=2", ini_txt)
    open(os.path.join(wd, "rico.ini"), "w").write(ini_txt)
    shutil.copy(os.path.join(repo, "cases/rico/rico_input.py"), wd)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "rico_input.py"], cwd=wd, env=env,
                   check=True, capture_output=True)

    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    model = Model(Ini(os.path.join(wd, "rico.ini")), "run", "rico",
                  workdir=wd, dtype=np.float32)
    model.finish_setup()
    model.build_step()
    st = model.fields.create(model.input_nc, dtype=model.dtype)
    s, t, sfc = model.as_device_state(st)
    dt = jnp.asarray(1.0, dtype=model.dtype)
    time0 = jnp.asarray(0.0, dtype=model.dtype)
    pp = model.pres_params

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
    t0 = time.perf_counter()
    s2, sfc2 = chunk_j(s1, sfc1, pp)
    jax.block_until_ready(s2["u"])
    t1 = time.perf_counter()
    del s, t, sfc, s1, sfc1, s2, sfc2, pp, model, chunk_j
    gc.collect()
    shutil.rmtree(wd, ignore_errors=True)
    return (t1 - t0) / nsteps


T_START = time.perf_counter()


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
    # round-over-round comparison point at 256^3 alongside the north star
    # (skipped when the headline already consumed most of the wall budget)
    elapsed = time.perf_counter() - T_START
    if (size > 256 and os.environ.get("BENCH_SECONDARY", "1") == "1"
            and elapsed < 0.4 * float(os.environ.get("BENCH_BUDGET_S", "4800"))):
        try:
            sec256 = _run_size(ge, 256, 256, nsteps)
            out["secondary_256"] = {"value": sec256, "unit": "s/step",
                                    "updates_per_s": 256 ** 3 / sec256,
                                    "vs_baseline": 256 ** 3 / sec256 / baseline_agg}
        except Exception as e:
            out["secondary_256"] = {"error": "%s" % type(e).__name__}

    # moist (rico-class) metric: thermo_moist + 2mom_warm + limiter +
    # geo/ls/subsidence — the generic fused path
    elapsed = time.perf_counter() - T_START
    budget = float(os.environ.get("BENCH_BUDGET_S", "4800"))
    if os.environ.get("BENCH_MOIST", "1") == "1" and elapsed >= budget:
        out["moist"] = {"skipped": "wall budget: %.0fs elapsed >= %.0fs"
                                   % (elapsed, budget)}
    if (os.environ.get("BENCH_MOIST", "1") == "1"
            and elapsed < budget):
        m_attempted, m_failed = [], {}
        if "BENCH_MOIST_SIZE" in os.environ:
            m_sizes = [int(os.environ["BENCH_MOIST_SIZE"])]
        else:
            m_sizes = [384, 256]
        for msize in m_sizes:
            mktot = int(os.environ.get("BENCH_MOIST_KTOT", str(msize)))
            m_attempted.append([msize, msize, mktot])
            try:
                sec = _run_moist_size(msize, mktot, nsteps)
                pts = msize * msize * mktot
                out["moist"] = {
                    "metric": "rico %dx%dx%d moist LES (2mom_warm+limiter"
                              "+ls/subsidence) per RK3 step (1 chip)"
                              % (msize, msize, mktot),
                    "value": sec, "unit": "s/step",
                    "updates_per_s": pts / sec,
                    "vs_baseline": pts / sec / baseline_agg,
                    "sizes_attempted": m_attempted,
                }
                break
            except Exception as e:
                m_failed["%d" % msize] = "%s: %s" % (type(e).__name__,
                                                     str(e)[:200])
                gc.collect()
        if "moist" not in out:
            out["moist"] = {"error": m_failed,
                            "sizes_attempted": m_attempted}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
