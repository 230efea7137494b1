#!/bin/bash
# Round-4 measurement queue (VERDICT r3 #1/#4/#5/#6): drains every
# queued TPU measurement sequentially, serialized against other tunnel
# clients via flock on /tmp/tpu_client.lock (ONE client at a time —
# CLAUDE.md trap). bench.py children take the SAME lock themselves, so
# steps that run bench.py are NOT wrapped (no self-deadlock) and the
# lock frees between combos, letting a driver bench interleave.
#
#   nohup bash tools/tpu_measure.sh > /tmp/measure.log 2>&1 &
#   echo $! > /tmp/measure.pid        # kill $(cat /tmp/measure.pid)
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/tpu_client.lock

wait_up() {  # poll a trivial device op until the tunnel answers
  # The probe itself takes the client lock: an unlocked probe next to a
  # lock-holding bench is a SECOND concurrent tunnel client (forbidden —
  # CLAUDE.md; it hangs to its timeout and misreads "busy" as "down").
  while true; do
    if flock -w 600 "$LOCK" timeout 120 python -c \
        "import jax, jax.numpy as jnp; jnp.ones((8,8)).sum().block_until_ready()" \
        >/dev/null 2>&1; then return 0; fi
    echo "$(date -u +%H:%M:%S) tunnel down or busy, waiting" ; sleep 60
  done
}

run_locked() {  # $1=tag $2=timeout $3...=command (tool WITHOUT own lock)
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

run_bench baseline BENCH_DUMMY=0
run_locked int8probe 1800 python tools/probe_int8.py
run_bench quant1 QUANT=1 BENCH_TRAIN=0
run_bench quant2 QUANT=2 BENCH_TRAIN=0
run_bench quant2s QUANT=2 QUANT_STATIC=1 BENCH_TRAIN=0
run_locked serve 2400 python tools/bench_serve_latency.py
run_locked converge 3600 python tools/convergence_tpu.py
# resumable sweep; its bench.py children self-lock per combo
echo "=== $(date -u +%H:%M:%S) xla sweep (train)"
wait_up
timeout 18000 python tools/xla_flag_sweep.py --target train \
    --out /tmp/xla_sweep_train.jsonl > /tmp/m_sweep.log 2> /tmp/m_sweep.err
echo "=== $(date -u +%H:%M:%S) sweep rc=$?"
echo "=== $(date -u +%H:%M:%S) queue DONE"
