#!/bin/bash
# Round-5 measurement queue (VERDICT r4 #3/#4/#5 + post-BN-fix bench):
# drains sequentially, serialized against other tunnel clients via
# flock on /tmp/tpu_client.lock (ONE client at a time — CLAUDE.md).
#
#   nohup bash tools/tpu_measure_r5.sh > /tmp/measure_r5.log 2>&1 &
#   echo $! > /tmp/measure_r5.pid
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/tpu_client.lock

wait_up() {
  while true; do
    if flock -w 600 "$LOCK" timeout 120 python -c \
        "import jax, jax.numpy as jnp; jnp.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    echo "$(date -u +%H:%M:%S) tunnel down or busy, waiting" ; sleep 60
  done
}

run_locked() {  # $1=tag $2=timeout $3...=command
  local tag=$1 to=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) $tag: $*"
  wait_up
  timeout "$to" flock "$LOCK" "$@" > "/tmp/m_$tag.log" 2> "/tmp/m_$tag.err"
  echo "=== $(date -u +%H:%M:%S) $tag rc=$?"
}

run_bench() {  # $1=tag $2...=env pairs; bench.py locks itself
  local tag=$1; shift
  echo "=== $(date -u +%H:%M:%S) bench $tag: $*"
  wait_up
  timeout 2700 env "$@" BENCH_WAIT_SECS=600 python bench.py \
      > "/tmp/m_$tag.log" 2> "/tmp/m_$tag.err"
  echo "=== $(date -u +%H:%M:%S) $tag rc=$?"
}

# 1. post-BN-fix headline numbers (use_fast_variance=False changes the
#    TRAIN program; eval uses running stats and should be unchanged)
run_bench r5_baseline BENCH_DUMMY=0

# 2. loader-fed sustained train throughput, jpg vs packed cache
run_locked r5_trainpipe 4500 python tools/bench_train_pipeline.py \
    --device --steps 20 --samples 256 --threads 4 --batch 64

# 3. convergence smoke + SAVE the converged weights
run_locked r5_converge 5400 env SAVE=/tmp/r5_ckpt \
    python tools/convergence_tpu.py

# 4. int8-static serving recheck on the post-fix program
run_bench r5_quant3s QUANT=3 QUANT_STATIC=1 BENCH_TRAIN=0

# 5. CPU (no tunnel, no lock): accuracy-delta tables — bf16 row on
#    random init, then the full table on the CONVERGED checkpoint
echo "=== $(date -u +%H:%M:%S) quant_accuracy (cpu, random init)"
timeout 7200 env JAX_PLATFORMS=cpu python tools/quant_accuracy.py \
    --samples 16 > /tmp/m_r5_qacc_random.log 2> /tmp/m_r5_qacc_random.err
echo "=== rc=$?"
if [ -d /tmp/r5_ckpt/latest ]; then
  echo "=== $(date -u +%H:%M:%S) quant_accuracy (cpu, converged ckpt)"
  timeout 7200 env JAX_PLATFORMS=cpu python tools/quant_accuracy.py \
      --samples 16 --model /tmp/r5_ckpt/latest \
      > /tmp/m_r5_qacc_conv.log 2> /tmp/m_r5_qacc_conv.err
  echo "=== rc=$?"
fi
echo "=== $(date -u +%H:%M:%S) queue DONE"
