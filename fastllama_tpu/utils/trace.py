"""Tracing/profiling hooks.

The reference exposes per-tensor/per-graph perf counters and a graphviz
dump (ggml.h:303-305, 325-327, 704-707) plus wall-clock phase logs
(lib/llama.cpp:256-261, lib/bridge.cpp:357-380). The TPU-native
equivalents here:

  * `trace_region(dir, name)` — a no-op-when-disabled context manager
    around `jax.profiler.trace`. The session layer and the batching engine
    call it for their hot regions when `RuntimeConfig.profile_dir` is set,
    so `FastLlama.generate` / `BatchEngine.run` drop standard XLA traces
    (viewable in TensorBoard/xprof, or summarized below) without any code
    changes at the call site.
  * `device_op_breakdown(dir)` / `print_breakdown(...)` — parse the
    newest trace's DEVICE-side complete events into per-op-kind totals.
    This replaces ggml_graph_print: on this hardware the per-op device
    durations are the only reliable timing signal (wall-clock varies
    2-5x run to run over the tunnel; see CLAUDE.md), and every decode-path
    optimization in the commit history was driven by exactly this readout.
"""
from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
from pathlib import Path


@contextlib.contextmanager
def trace_region(profile_dir: str | None, name: str):
    """jax.profiler trace around a region; no-op when profile_dir is falsy.

    Traces land in <profile_dir>/<name>/; repeated regions of the same
    name append new runs (the parser picks the newest)."""
    if not profile_dir:
        yield
        return
    import jax
    out = os.path.join(profile_dir, name)
    with jax.profiler.trace(out):
        yield


def device_op_breakdown(trace_dir: str):
    """(total_us, Counter[op_kind] -> us, Counter[op_kind] -> count) over
    device-side complete events of the newest trace under trace_dir."""
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
    if not dev_pids:
        # CPU-only runs (tests): XLA:CPU kernels execute on host threads
        dev_pids = {p for p, n in proc_names.items() if "CPU" in n}

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


def print_breakdown(total: float, agg, cnt, steps: int = 1, top: int = 40,
                    file=None):
    print(f"\ntotal device time: {total / 1e3:.2f} ms over {steps} steps "
          f"({total / 1e3 / steps:.2f} ms/step)", file=file)
    for k, v in agg.most_common(top):
        print(f"  {v / steps:10.1f} us/step  x{cnt[k] // steps:<5d} {k}",
              file=file)
