"""Sweep documented XLA scheduling/fusion flags over the train step
(and optionally eval) — VERDICT r3 #6.

DESIGN.md §7 concluded "compiler-bound" for the train step's two
residual kernel classes (BN-stat fusions, 1x1 convs) after attacking
them from JAX source; this sweeps the compiler's OWN knobs before that
claim is final. Each combo runs ``bench.py`` in a subprocess with
XLA_FLAGS set (bench.py handles backend wait + client locking), so a
combo costs one tunnel compile (~10-15 min wall on this box).

Results append to ``--out`` (JSON lines) as they land; already-recorded
combos are skipped on rerun — the sweep is resumable across tunnel
outages. A combo whose flag the compiler rejects is recorded with
``"rejected": true`` (that is itself a finding: the flag does not exist
on this toolchain / does not transit the tunnel).

    python tools/xla_flag_sweep.py                 # train step, all combos
    python tools/xla_flag_sweep.py --target eval   # eval program
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Documented XLA:TPU knobs plausibly touching the two §7 kernel classes:
# scheduling (latency-hiding scheduler), fusion sizing (scoped vmem
# scratch limit — larger lets bigger fusions materialize), loop-invariant
# code motion sizing, and async copy aggressiveness. Combos kept small:
# each costs a full remote compile.
COMBOS = [
    ("baseline", ""),
    ("lhs_on", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_128m", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("licm_2x", "--xla_tpu_licm_size_inflation_ratio=2.0"),
    ("lhs_vmem", "--xla_tpu_enable_latency_hiding_scheduler=true "
                 "--xla_tpu_scoped_vmem_limit_kib=65536"),
]


def run_combo(name, flags, target, timeout):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    if target == "train":
        env["BENCH_EVAL"] = "0"
    else:
        env["BENCH_TRAIN"] = "0"
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, env=env,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"combo": name, "flags": flags, "target": target,
                "timeout": True}
    rec = {"combo": name, "flags": flags, "target": target,
           "rc": r.returncode}
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line:
        rec.update(json.loads(line))
    tail = (r.stderr or "")[-4000:]
    # Unknown-flag rejection happens at flag parse (client side) or at
    # remote compile — both surface in stderr.
    if "Unknown flag" in tail or "unknown flag" in tail or (
            r.returncode != 0 and "INVALID_ARGUMENT" in tail):
        rec["rejected"] = True
        rec["stderr_tail"] = tail[-500:]
    elif r.returncode != 0:
        rec["stderr_tail"] = tail[-500:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=["train", "eval"], default="train")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs",
                                         "xla_flag_sweep.jsonl"))
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-combo wall limit (compile ~10-15 min "
                    "through the tunnel + bench)")
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for ln in f:
                r = json.loads(ln)
                done.add((r["combo"], r["target"]))

    for name, flags in COMBOS:
        if (name, args.target) in done:
            print(f"skip (recorded): {name}", flush=True)
            continue
        print(f"running: {name} [{args.target}] flags={flags!r}",
              flush=True)
        rec = run_combo(name, flags, args.target, args.timeout)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        key = ("train_step_ms_b64" if args.target == "train" else "value")
        print(f"  -> {rec.get(key, 'n/a')} "
              f"{'REJECTED' if rec.get('rejected') else ''}", flush=True)


if __name__ == "__main__":
    main()
