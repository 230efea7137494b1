"""Enumerate the fused conv+BN-stat kernels in a captured train trace.

Prints every kernel whose name marks it as a convert/reduce fusion (the
XLA pattern that serializes per-channel stat reductions against the
producing conv's epilogue — docs/DESIGN.md §7), with per-step time,
achieved TF/s and GB/s, and source attribution. Input: a trace dir
produced by tools/profile_train.py (default /tmp/dir_tpu_trace).
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_util import latest_trace, load_events  # noqa: E402

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/dir_tpu_trace")
STEPS = int(os.environ.get("STEPS", "3"))


def main():
    evs = load_events(latest_trace(TRACE_DIR))
    agg = collections.defaultdict(lambda: [0, 0, 0, 0, ""])
    for e in evs:
        a = e["args"]
        name = e.get("name", "")
        rec = agg[name]
        rec[0] += e["dur"]
        rec[1] += int(a.get("model_flops", 0) or 0)
        rec[2] += int(a.get("bytes_accessed", 0) or 0)
        rec[3] += 1
        rec[4] = a.get("source") or rec[4]

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    picked = [(n, r) for n, r in rows
              if ("convert" in n and "fusion" in n) or "reduce_fusion" in n]
    total = sum(r[0] for _, r in picked)
    print(f"fused convert/reduce kernels: {len(picked)} names, "
          f"{total / STEPS / 1000:.2f} ms/step total")
    for n, (d, fl, by, cnt, src) in picked:
        ms = d / STEPS / 1000
        if ms < 0.02:
            continue
        tf = fl / (d * 1e-6) / 1e12
        gb = by / (d * 1e-6) / 1e9
        print(f"{ms:7.3f} ms x{cnt // STEPS:<2d} {tf:6.1f} TF/s "
              f"{gb:7.0f} GB/s  {n[:70]}  [{src}]")


if __name__ == "__main__":
    main()
