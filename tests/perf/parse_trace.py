"""Summarize a jax.profiler trace: top device ops with per-step cost.

    python tests/perf/parse_trace.py /tmp/tpuprof [steps_per_call]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main() -> None:
    root = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    path = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    srcs: dict = {}
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            durs[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            if e["name"] not in srcs:
                a = e.get("args", {})
                srcs[e["name"]] = (a.get("hlo_category", ""), str(a.get("source", ""))[-45:], str(a.get("shape_with_layout", ""))[:60])
    total = 0.0
    rows = []
    for name, d in durs.most_common(60):
        if name in ("0",) or name.startswith("jit_") or name.startswith("while"):
            continue
        cat, src, shape = srcs.get(name, ("", "", ""))
        rows.append((d, name, cat, src, shape))
        total += d
    print(f"{'us/step':>9}  {'count':>5}  name / category / source / shape")
    for d, name, cat, src, shape in rows[:45]:
        print(f"{d / steps:9.2f}  x{cnt[name] // steps:4d}  {name[:28]:28s} {cat[:16]:16s} {src} {shape}")
    print(f"device-op total: {total / steps:.1f} us/step")


if __name__ == "__main__":
    main()
