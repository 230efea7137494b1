"""Accuracy cost of the int8 PTQ serving modes (VERDICT r3 #4).

Runs apps/eval.py's full metric path (the exact accuracy contract of
reference apps/eval.py:294-306: root-centered, bone-length-scale-aligned
mm errors) on a synthetic test split with QUANT=0/1/2/2+static and
prints a table of absolute metrics and deltas vs the fp baseline.

The network is the deterministic random init (--model random,
PRNGKey(0)) — the released DIR.pth is licensed and absent on this box
(reference README.md:121-137), so the deltas quantify the NUMERIC drift
of int8 quantization through the real 53-conv network, not the trained
model's task accuracy. Same seed in every mode: deltas are pure
quantization effects.

Platform-independent (int8 fake-quant math is the same program on CPU
and TPU); run with JAX_PLATFORMS=cpu for a tunnel-free measurement:

    JAX_PLATFORMS=cpu python tools/quant_accuracy.py --samples 16

Results are recorded in docs/DESIGN.md §8.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    ("fp (QUANT=0)", []),
    # VERDICT r4 #4: the bf16 trunk carries every headline eval number —
    # it needs a row in the same metric-delta table as int8.
    ("bf16 trunk", ["--dtype", "bfloat16"]),
    ("int8 backbone (QUANT=1)", ["--quant_backbone"]),
    ("int8 bb+decoder (QUANT=2)", ["--quant_backbone", "--quant_decoder"]),
    ("int8 bb+dec static (QUANT=2+S)",
     ["--quant_backbone", "--quant_decoder", "--quant_static"]),
    ("int8 bb+dec+aux static (QUANT=3+S)",
     ["--quant_backbone", "--quant_decoder", "--quant_aux",
      "--quant_static"]),
]


def run_mode(data_dir, out_root, extra, bs, backbone, model="random"):
    out = os.path.join(out_root, "_".join(extra) or "fp")
    cmd = [sys.executable, os.path.join(REPO, "apps", "eval.py"),
           "--model", model, "--data_path", data_dir, "--out", out,
           "--bs", str(bs), "--synthetic_mano",
           "--backbone_layers", backbone] + extra
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"eval failed for {extra}:\n{r.stderr[-3000:]}")
    line = next(ln for ln in r.stdout.splitlines()
                if ln.startswith("SUMMARY "))
    return json.loads(line[len("SUMMARY "):])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--backbone_layers", type=str, default="3,4,6,3",
                    help="full depth by default: quantization error "
                    "accumulates per conv, a truncated backbone "
                    "understates it")
    ap.add_argument("--data_path", type=str, default=None,
                    help="existing prepared dataset; default: generate "
                    "a synthetic split")
    ap.add_argument("--model", type=str, default="random",
                    help="checkpoint for apps/eval.py --model; pass a "
                    "converged checkpoint (e.g. from "
                    "tools/convergence_tpu.py --save) to measure deltas "
                    "on trained rather than random weights (VERDICT r4 "
                    "#5: static calibration is range-sensitive)")
    ap.add_argument("--modes", type=str, default=None,
                    help="comma-separated substrings; run only matching "
                    "MODES rows (fp always runs — it is the delta base)")
    args = ap.parse_args()

    modes = MODES
    if args.modes:
        pats = [p.strip() for p in args.modes.split(",")]
        modes = [MODES[0]] + [
            m for m in MODES[1:] if any(p in m[0] for p in pats)]

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = args.data_path
        if data_dir is None:
            sys.path.insert(0, REPO)
            from dir_tpu.data import synthetic
            from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
            right = synthetic_mano("right", seed=0)
            left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
            data_dir = os.path.join(tmp, "data")
            synthetic.generate(data_dir, left, right, split="test",
                               num_samples=args.samples)

        rows = []
        for name, extra in modes:
            s = run_mode(data_dir, os.path.join(tmp, "out"), extra,
                         args.bs, args.backbone_layers, model=args.model)
            rows.append((name, s))
            print(f"done: {name}: joint {s['joint_mean_all_mm']:.4f} mm",
                  file=sys.stderr, flush=True)

    base = rows[0][1]
    keys = ["joint_mean_all_mm", "vert_mean_all_mm", "joint2d_mean_all_px",
            "vert2d_mean_all_px", "root_mean_mm"]
    print(f"{'mode':32s} " + " ".join(f"{k:>22s}" for k in keys))
    for name, s in rows:
        print(f"{name:32s} " + " ".join(f"{s[k]:>22.4f}" for k in keys))
    print()
    print(f"{'mode':32s} " + " ".join(f"{'d_' + k:>22s}" for k in keys))
    for name, s in rows[1:]:
        print(f"{name:32s} " + " ".join(
            f"{s[k] - base[k]:>+22.4f}" for k in keys))
    print("TABLE " + json.dumps({name: s for name, s in rows}))


if __name__ == "__main__":
    main()
