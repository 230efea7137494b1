#!/usr/bin/env bash
# One-command reference-parity reproduction (needs the licensed assets).
#
# Usage:
#   tools/run_reference_parity.sh <DIR.pth> <mano_pkl_dir> <interhand_dir> \
#       [out_dir]
#
#   DIR.pth        — the released reference checkpoint
#                    (https://github.com/PengfeiRen96/DIR, README "Model")
#   mano_pkl_dir   — directory with MANO_LEFT.pkl / MANO_RIGHT.pkl
#                    (https://mano.is.tue.mpg.de, licensed)
#   interhand_dir  — processed InterHand2.6M root ({test}/{img,anno,...}),
#                    produced by tools/prepare_interhand.py or by the
#                    reference's dataset/prepare_data.py (same layout)
#
# Steps: convert MANO pkl -> npz, run apps/eval.py on the test split with
# the reference's metric settings (root_joint=0, scale alignment, final
# stage, eval batch 256 per apps/eval.py:92), and diff the summary
# against the reference README's published numbers.
#
# Tested end-to-end with synthetic stand-ins by
# tests/test_apps_cli.py::test_run_reference_parity_script.
set -euo pipefail

# Test-harness overrides (defaults reproduce the reference settings):
#   PARITY_BS (256), PARITY_BACKBONE (3,4,6,3), PARITY_COMPARE (1)
PTH=${1:?usage: run_reference_parity.sh <DIR.pth> <mano_pkl_dir> <interhand_dir> [out_dir]}
MANO_PKLS=${2:?mano pkl dir required}
DATA=${3:?interhand data dir required}
OUT=${4:-./result/reference_parity}
BS=${PARITY_BS:-256}
BACKBONE=${PARITY_BACKBONE:-3,4,6,3}
cd "$(dirname "$0")/.."

mkdir -p "$OUT/mano"
echo "== 1/3 convert MANO assets =="
python tools/convert_mano.py --mano_dir "$MANO_PKLS" --out "$OUT/mano"

echo "== 2/3 evaluate the released checkpoint =="
python apps/eval.py --model "$PTH" --data_path "$DATA" \
    --mano_path "$OUT/mano" --bs "$BS" --root_joint 0 \
    --backbone_layers "$BACKBONE" \
    --out "$OUT" | tee "$OUT/eval_stdout.txt"

if [ "${PARITY_COMPARE:-1}" != "1" ]; then
    echo "== 3/3 comparison skipped (PARITY_COMPARE=0) =="
    exit 0
fi

echo "== 3/3 compare against the reference README table =="
python - "$OUT/eval_stdout.txt" <<'EOF'
import json
import re
import sys

# Published numbers: reference README.md:123-135 (better-than-paper,
# post-bugfix), reproduced via apps/eval.py with root_joint=0 + scale.
PUBLISHED = {
    "joint_mean_all_mm": 10.2276,
    "vert_mean_all_mm": 10.0003,
    "joint2d_mean_all_px": 6.0865,
    "vert2d_mean_all_px": 6.0021,
    "root_mean_mm": 29.2605,
}
summary = None
for line in open(sys.argv[1]):
    if line.startswith("SUMMARY "):
        summary = json.loads(line[len("SUMMARY "):])
if summary is None:
    print("MISSING SUMMARY line in eval output")
    sys.exit(1)
ok = True
for key, want in PUBLISHED.items():
    got = summary.get(key)
    if got is None:
        print(f"MISSING {key} in summary")
        ok = False
        continue
    # 2% tolerance: fp32-vs-cuda accumulation + TPU conv autotuning.
    rel = abs(got - want) / want
    status = "OK " if rel < 0.02 else "FAIL"
    if rel >= 0.02:
        ok = False
    print(f"{status} {key}: got {got:.4f} want {want:.4f} (rel {rel:.4%})")
sys.exit(0 if ok else 1)
EOF
