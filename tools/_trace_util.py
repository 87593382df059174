"""Shared trace parsing for the profiling tools: aggregate device-side op
durations from a jax.profiler trace directory."""
from __future__ import annotations

import collections
import glob
import gzip
import json
from pathlib import Path


def load_device_op_breakdown(trace_dir: str):
    """Returns (total_us, Counter[op_kind] -> us, Counter[op_kind] -> count)
    over device-side complete events of the newest trace under trace_dir."""
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace found under {trace_dir}")
    path = max(paths, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}

    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)  # microseconds
        key = name.split(".")[0].rstrip("0123456789_")
        agg[key] += dur
        cnt[key] += 1
        total += dur
    return total, agg, cnt


def print_breakdown(total: float, agg, cnt, steps: int, top: int = 40):
    print(f"\ntotal device time: {total / 1e3:.2f} ms over {steps} steps "
          f"({total / 1e3 / steps:.2f} ms/step)")
    for k, v in agg.most_common(top):
        print(f"  {v / steps:10.1f} us/step  x{cnt[k] // steps:<5d} {k}")
