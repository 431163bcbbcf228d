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


def _time_case(casename, src_rel, overrides, zero_outputs, nsteps,
               dt_val=1.0):
    """Build a case dir from the repo case, run its input generator, and
    time nsteps of the production step as ONE scanned device dispatch."""
    import re
    import shutil
    import subprocess
    import tempfile

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.abspath(__file__))
    wd = tempfile.mkdtemp(prefix="bench_%s_" % casename)
    ini_txt = open(os.path.join(repo, src_rel, "%s.ini" % casename)).read()
    for key, val in overrides:
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=%s" % (key, val), ini_txt)
    for key in zero_outputs:
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=0" % key, ini_txt)
    open(os.path.join(wd, "%s.ini" % casename), "w").write(ini_txt)
    gen = os.path.join(repo, src_rel, "%s_input.py" % casename)
    if os.path.exists(gen):
        shutil.copy(gen, wd)
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run([sys.executable, "%s_input.py" % casename], cwd=wd,
                       env=env, check=True, capture_output=True)

    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    model = Model(Ini(os.path.join(wd, "%s.ini" % casename)), "run",
                  casename, workdir=wd, dtype=np.float32)
    model.finish_setup()
    model.build_step()
    st = model.fields.create(model.input_nc, dtype=model.dtype)
    s, t, sfc = model.as_device_state(st)
    dt = jnp.asarray(dt_val, dtype=model.dtype)
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


def _run_moist_size(size, ktot, nsteps, true_config=False):
    """Bomex/rico-class moist step: thermo_moist + 2mom_warm + limiter +
    geo/ls/subsidence forcing.  ``true_config=False`` rewrites rico's
    swadvec 2i5 -> 2 so the production generic-fused + rkfold kernels
    engage (the op-set metric); ``true_config=True`` keeps the ini
    verbatim (2i5 upwind advection on the XLA op pipeline) — the
    unmodified-case metric (round-5 item 2)."""
    overrides = [("itot", size), ("jtot", size), ("ktot", ktot)]
    if not true_config:
        overrides.append(("swadvec", "2"))
    return _time_case(
        "rico", "cases/rico", overrides,
        ("swstats", "swcross", "swdump", "swcolumn", "swbudget"),
        nsteps, dt_val=1.0)


def _run_weakscaling(nsteps):
    """The reference's own canonical benchmark unit (4th order +
    thermo_buoy + pres_4, cases/weakscaling/weakscaling.ini: the
    64x32x1024 per-process load of its published weak-scaling tables,
    BASELINE.md) — measures the unfused 4th-order stack (round-5 item 3)."""
    return _time_case("weakscaling", "cases/weakscaling", [],
                      ("swstats", "swcross"), nsteps, dt_val=0.001)


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
                    "advec_rewritten": "2i5->2 (production fused path; "
                                       "see moist_true_config for the "
                                       "verbatim ini)",
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

    # TRUE rico config (swadvec=2i5 verbatim, XLA op pipeline) — no ini
    # rewriting (round-5 item 2)
    elapsed = time.perf_counter() - T_START
    if (os.environ.get("BENCH_MOIST_TRUE", "1") == "1"
            and elapsed < budget):
        mt_failed = {}
        for msize in ([int(os.environ["BENCH_MOIST_SIZE"])]
                      if "BENCH_MOIST_SIZE" in os.environ else [384, 256]):
            mktot = int(os.environ.get("BENCH_MOIST_KTOT", str(msize)))
            try:
                sec = _run_moist_size(msize, mktot, nsteps,
                                      true_config=True)
                pts = msize * msize * mktot
                out["moist_true_config"] = {
                    "metric": "rico %dx%dx%d VERBATIM ini (swadvec=2i5) "
                              "per RK3 step (1 chip)"
                              % (msize, msize, mktot),
                    "value": sec, "unit": "s/step",
                    "updates_per_s": pts / sec,
                    "vs_baseline": pts / sec / baseline_agg,
                    "sizes_failed": mt_failed,
                }
                break
            except Exception as e:
                mt_failed["%d" % msize] = "%s: %s" % (type(e).__name__,
                                                      str(e)[:200])
                gc.collect()
        if "moist_true_config" not in out:
            out["moist_true_config"] = {"error": mt_failed}

    # 4th-order weak-scaling unit — the reference's own benchmark case
    # (64x32x1024 per-proc load, thermo_buoy; BASELINE.md weak-scaling
    # tables: 14.16 s/iter/512-proc on JUQUEEN, 5.08 s on SuperMUC)
    # (round-5 item 3)
    elapsed = time.perf_counter() - T_START
    if (os.environ.get("BENCH_O4", "1") == "1" and elapsed < budget):
        try:
            sec = _run_weakscaling(nsteps)
            pts = 64 * 32 * 1024
            # per-unit baseline: SuperMUC weak scaling ran this exact
            # per-process load at 5.08 s/iter (512p leg)
            out["o4_weakscaling"] = {
                "metric": "weakscaling 64x32x1024 4th-order thermo_buoy "
                          "per RK3 step (1 chip, reference per-proc unit)",
                "value": sec, "unit": "s/step",
                "updates_per_s": pts / sec,
                "vs_ref_core": 5.08 / sec,
                "vs_baseline": pts / sec / baseline_agg,
            }
        except Exception as e:
            out["o4_weakscaling"] = {"error": "%s: %s" % (
                type(e).__name__, str(e)[:200])}
            gc.collect()

    # 4th-order channel DNS (moser180 case verbatim: advec_4m + diff_4 +
    # pres_4 on the stretched channel grid) — the production-shaped o4
    # metric complementing the tall-thin weakscaling unit
    elapsed = time.perf_counter() - T_START
    if (os.environ.get("BENCH_O4_CHANNEL", "1") == "1" and elapsed < budget):
        try:
            sec = _time_case("moser180", "cases/moser180", [],
                             ("swstats", "swcross", "swdump", "swcolumn",
                              "swbudget"), nsteps, dt_val=0.2)
            pts = 256 * 192 * 128
            out["o4_channel"] = {
                "metric": "moser180 256x192x128 4th-order (4m) channel "
                          "DNS per RK3 step (1 chip)",
                "value": sec, "unit": "s/step",
                "updates_per_s": pts / sec,
                "vs_baseline": pts / sec / baseline_agg,
            }
        except Exception as e:
            out["o4_channel"] = {"error": "%s: %s" % (
                type(e).__name__, str(e)[:200])}
            gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
