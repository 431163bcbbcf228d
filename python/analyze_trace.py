"""Aggregate op durations from a jax-profiler trace (MICROHH_PROFILE=<dir>).

Usage: python python/analyze_trace.py <profile_dir> [top_n]

Finds the newest *.trace.json.gz under the directory, sums TPU-thread event
durations by op name, and prints the top offenders — the quick way to see
where a step's wall-clock goes without TensorBoard.
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    traces = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        sys.exit("no trace found under %s" % root)
    path = traces[-1]
    print("trace:", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # Find TPU/device process ids (names like "/device:TPU:0" or "TPU:0").
    pid_names = {}
    tid_names = {}
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
    span = [float("inf"), 0.0]
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():
            continue  # step markers duplicate the op rows
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        ts = e.get("ts", 0) / 1e3
        span[0] = min(span[0], ts)
        span[1] = max(span[1], ts + dur)

    print("device span: %.1f ms, total op time: %.1f ms"
          % (span[1] - span[0], sum(tot.values())))
    print("%-72s %10s %6s" % ("op", "ms", "count"))
    for name, ms in tot.most_common(top_n):
        print("%-72s %10.3f %6d" % (name[:72], ms, cnt[name]))


if __name__ == "__main__":
    main()
