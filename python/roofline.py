"""Measured per-kernel roofline of the drycblles step on the real chip.

Runs BENCH_SIZE^3 (default 512^3) steps under the jax profiler, aggregates
device op time per kernel family, attaches an analytic bytes-moved model
for the named hot kernels, and prints a markdown table with achieved GB/s
and % of the chip's HBM bandwidth — the quantified version of
ARCHITECTURE.md's "VPU-limited / near the read+write floor" claims
(round-4 item 5).

Usage (on the TPU):
    python python/roofline.py [size] [nsteps]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

HBM_GBS = float(os.environ.get("ROOFLINE_HBM_GBS", "819"))  # v5e HBM BW


def run_profiled(size, nsteps):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    import jax
    import jax.numpy as jnp

    model = ge._build_model(size, size, size)
    model.build_step()
    s, t, sfc = ge._initial_state(model)
    dt = jnp.asarray(2.0, dtype=model.dtype)
    time0 = jnp.asarray(0.0, dtype=model.dtype)
    pp = model.pres_params

    def chunk(s, sfc, pp):
        def body(carry, _):
            s, sfc = carry
            s, sfc, _aux = model._step_raw(s, sfc, pp, dt, time0)
            return (s, sfc), 0
        (s, sfc), _ = jax.lax.scan(body, (s, sfc), None, length=nsteps)
        return s, sfc

    cj = jax.jit(chunk, donate_argnums=(0, 1))
    s1, sfc1 = cj(s, sfc, pp)
    jax.block_until_ready(s1["u"])

    prof_dir = tempfile.mkdtemp(prefix="roofline_")
    t0 = time.perf_counter()
    with jax.profiler.trace(prof_dir):
        s2, sfc2 = cj(s1, sfc1, pp)
        jax.block_until_ready(s2["u"])
    wall = time.perf_counter() - t0
    return prof_dir, wall, model


def aggregate(prof_dir):
    traces = sorted(glob.glob(os.path.join(prof_dir, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        sys.exit("no trace under %s" % prof_dir)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():
            continue
        tot[e.get("name", "?")] += e.get("dur", 0) / 1e3
        cnt[e.get("name", "?")] += 1
    return tot, cnt


# kernel families: regex -> (label, planes_per_point_model)
# bytes = planes * itot*jtot*ktot * 4 per STEP (f32); None = unmodeled
FAMILIES = [
    # rkfold tendency sweep: reads u,v,w,th + 4 carried t + evisc-ring
    # inputs (u,v,w,th again via ring) ~ in-kernel; writes s*4 + t4 + rhs
    # + evisc: ~8 reads + 10 writes per substep
    (r"tendencies|fused.*rk|rkfold", "fused tendency sweep (x3 substeps)", 18 * 3),
    (r"dft2_fwd|plxf", "radix-4 Pallas DFT fwd (x3)", 2 * 3),
    (r"dft2_inv|plxi", "radix-4 Pallas DFT inv (x3)", 2 * 3),
    (r"tdma", "Pallas Thomas solve (x3)", 2 * 3),
    (r"pres_glue|rhs|divergence", "projection glue (x3)", 6 * 3),
    (r"evisc|viscosity", "evisc kernel", 6 * 3),
    (r"fusion", "XLA fusions (wall patches, BCs, CFL)", None),
    (r"all-to-all|collective|permute", "collectives", None),
    (r"copy|bitcast|transpose", "layout copies", None),
]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    prof_dir, wall, model = run_profiled(size, nsteps)
    tot, cnt = aggregate(prof_dir)

    pts = size ** 3
    fam_ms = collections.OrderedDict((lbl, 0.) for _, lbl, _ in FAMILIES)
    fam_planes = {lbl: pl for _, lbl, pl in FAMILIES}
    other = 0.
    for name, ms in tot.items():
        for pat, lbl, _pl in FAMILIES:
            if re.search(pat, name, re.I):
                fam_ms[lbl] += ms
                break
        else:
            other += ms

    per_step = {k: v / nsteps for k, v in fam_ms.items()}
    print("\n## Measured roofline — drycblles %d^3, %d steps, wall %.1f ms/step"
          % (size, nsteps, 1e3 * wall / nsteps))
    print()
    print("| kernel | ms/step | bytes/step (model) | GB/s | % HBM peak |")
    print("|---|---|---|---|---|")
    total_ms = 0.
    for lbl, ms in per_step.items():
        total_ms += ms
        pl = fam_planes[lbl]
        if pl is not None and ms > 0.01:
            nbytes = pl * pts * 4
            gbs = nbytes / (ms / 1e3) / 1e9
            print("| %s | %.2f | %.1f GB | %.0f | %.0f%% |"
                  % (lbl, ms, nbytes / 1e9, gbs, 100. * gbs / HBM_GBS))
        elif ms > 0.01:
            print("| %s | %.2f | - | - | - |" % (lbl, ms))
    print("| other device ops | %.2f | - | - | - |" % (other / nsteps))
    print("| **total device** | **%.2f** | | | |"
          % (total_ms + other / nsteps))
    print("\ntrace: %s" % prof_dir)
    print("\nTop raw ops:")
    for name, ms in tot.most_common(15):
        print("  %8.2f ms/step  %s" % (ms / nsteps, name[:90]))


if __name__ == "__main__":
    main()
