"""Shared trace-analysis helpers for the TPU profiling tools.

Aggregates a jax.profiler trace by HLO category and by source line
(events carry ``hlo_category``, ``model_flops``, ``bytes_accessed`` and,
for ops lowered from Python, a ``source`` file:line attribution), so
device time maps directly onto model code.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def latest_trace(trace_dir: str) -> str:
    traces = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    return traces[-1]


def load_events(trace_path: str) -> list:
    with gzip.open(trace_path) as f:
        data = json.load(f)
    return [e for e in data.get("traceEvents", [])
            if e.get("ph") == "X" and "dur" in e
            and (e.get("args") or {}).get("hlo_category")]


def report(trace_dir: str, steps: int, top: int = 30) -> None:
    """Print per-category and per-source aggregation (ms/step)."""
    evs = load_events(latest_trace(trace_dir))
    cat = collections.Counter()
    catf = collections.Counter()
    catb = collections.Counter()
    src = collections.Counter()
    srcf = collections.Counter()
    for e in evs:
        a = e["args"]
        d = e["dur"]
        c = a["hlo_category"]
        cat[c] += d
        catf[c] += int(a.get("model_flops", 0) or 0)
        catb[c] += int(a.get("bytes_accessed", 0) or 0)
        s = a.get("source") or "?"
        src[s] += d
        srcf[s] += int(a.get("model_flops", 0) or 0)

    total = sum(cat.values())
    print(f"total device time: {total / steps / 1000:.2f} ms/step "
          f"({steps} steps)")
    print("\n== by HLO category (ms/step, achieved TFLOP/s, GB/s) ==")
    for c, d in cat.most_common():
        if d / steps / 1000 < 0.01:
            continue
        fl = catf[c] / (d * 1e-6) / 1e12
        bw = catb[c] / (d * 1e-6) / 1e9
        print(f"{d / steps / 1000:8.2f} ms  {fl:7.1f} TF/s {bw:8.0f} GB/s  "
              f"{c}")
    print("\n== by source line ==")
    for s, d in src.most_common(top):
        if d / steps / 1000 < 0.05:
            break
        fl = srcf[s] / (d * 1e-6) / 1e12
        print(f"{d / steps / 1000:8.3f} ms {fl:7.1f} TF/s  {s}")
