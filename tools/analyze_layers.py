"""Group a captured trace's device time by model module (tf_op path).

Aggregates kernel time by the first path component matching a backbone
stage (layerN_M -> layerN), stem, decoder stage, or other top-level
module in the HLO op path — the per-segment budget the speed-of-light
table in docs/DESIGN.md §7 is built from. TRACE_DIR selects the trace
(default the eval trace); STEPS the number of profiled steps.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_util import latest_trace, load_events  # noqa: E402

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/dir_tpu_eval_trace")
STEPS = int(os.environ.get("STEPS", "3"))


def bucket(tf_op: str) -> str:
    m = re.search(r"backbone/(layer\d)_\d", tf_op)
    if m:
        return f"backbone.{m.group(1)}"
    if "backbone" in tf_op:
        return "backbone.stem"
    for part in ("init_regressor", "decoder", "fused_bottleneck"):
        if part in tf_op:
            m = re.search(part + r"/(\w+)", tf_op)
            sub = m.group(1) if m else ""
            return f"{part}.{sub}" if part == "decoder" else part
    return tf_op.split("/")[1] if "/" in tf_op else (tf_op or "?")


def main():
    evs = load_events(latest_trace(TRACE_DIR))
    agg = collections.Counter()
    fl = collections.Counter()
    by = collections.Counter()
    for e in evs:
        a = e["args"]
        b = bucket(a.get("tf_op", "") or "")
        agg[b] += e["dur"]
        fl[b] += int(a.get("model_flops", 0) or 0)
        by[b] += int(a.get("bytes_accessed", 0) or 0)
    total = sum(agg.values())
    print(f"total: {total / STEPS / 1000:.2f} ms/step")
    for b, d in agg.most_common(40):
        ms = d / STEPS / 1000
        if ms < 0.05:
            break
        tf = fl[b] / (d * 1e-6) / 1e12
        gb = by[b] / (d * 1e-6) / 1e9
        print(f"{ms:8.2f} ms {tf:7.1f} TF/s {gb:7.0f} GB/s  {b}")


if __name__ == "__main__":
    main()
