"""Sweep documented XLA:TPU scheduling/fusion knobs over the train step
(and optionally eval) — VERDICT r3 #6.

DESIGN.md §7 concluded "compiler-bound" for the train step's two
residual kernel classes (BN-stat fusions, 1x1 convs) after attacking
them from JAX source; this sweeps the compiler's OWN knobs before that
claim is final. Each combo runs ``bench.py`` in a subprocess with
``BENCH_COMPILER_OPTIONS`` set (bench.py handles backend wait + client
locking), so a combo costs one tunnel compile (~10-15 min wall).

MECHANISM (learned the hard way): options go per-computation via
``jit(compiler_options=...)``, NOT via the XLA_FLAGS env var — this
box's local jaxlib has no TPU flag registry and F-aborts on any
``--xla_tpu_*`` name at backend init ("Unknown flag in XLA_FLAGS"),
which bench.py's probe then misreads as a dead tunnel. compiler_options
ride the remote-compile request and are parsed by the terminal-side TPU
compiler, which DOES know them; a name it rejects raises
INVALID_ARGUMENT at compile, recorded as ``"rejected": true``.

Results append to ``--out`` (JSON lines) as they land; already-recorded
combos are skipped on rerun — the sweep is resumable across tunnel
outages (delete a line to re-run that combo).

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
# scratch limit — larger lets bigger fusions materialize), and
# loop-invariant code motion sizing. Combos kept small: each costs a
# full remote compile.
COMBOS = [
    ("baseline", {}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": True}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": 131072}),
    ("licm_2x", {"xla_tpu_licm_size_inflation_ratio": 2.0}),
    ("lhs_vmem", {"xla_tpu_enable_latency_hiding_scheduler": True,
                  "xla_tpu_scoped_vmem_limit_kib": 65536}),
]


def run_combo(name, options, target, timeout):
    env = dict(os.environ)
    if options:
        env["BENCH_COMPILER_OPTIONS"] = json.dumps(options)
    else:
        env.pop("BENCH_COMPILER_OPTIONS", None)
    if target == "train":
        env["BENCH_EVAL"] = "0"
    else:
        env["BENCH_TRAIN"] = "0"
    env["BENCH_INT8"] = "0"  # sweep measures the fp programs only
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, env=env,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"combo": name, "options": options, "target": target,
                "timeout": True}
    rec = {"combo": name, "options": options, "target": target,
           "rc": r.returncode}
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line:
        rec.update(json.loads(line))
    # Server-side rejection of an unknown/invalid option surfaces inside
    # bench.py as a JaxRuntimeError, which lands in the JSON "error"
    # field (bench catches everything). Measured signature on this
    # tunnel: "INTERNAL: ...remote_compile: HTTP 500: tpu_compile_helper
    # subprocess exit code 1" (a local backend would say
    # INVALID_ARGUMENT). A genuine mid-sweep compiler crash matches too
    # — the full error is retained for disambiguation.
    err = rec.get("error", "")
    if ("INVALID_ARGUMENT" in err or "option" in err.lower()
            or "remote_compile: HTTP 500" in err):
        rec["rejected"] = True
    if r.returncode != 0 and not line:
        rec["stderr_tail"] = (r.stderr or "")[-500:]
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
