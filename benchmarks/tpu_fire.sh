#!/bin/bash
# Probe-and-fire: wait for the axon TPU to answer, then run the round-4
# measurement matrix serially (ONE process owns the chip at a time).
# Logs under benchmarks/results/. Writes /tmp/tpu_busy while jobs run so
# concurrent CPU work can yield the single host core.
set -u
cd /root/repo
mkdir -p benchmarks/results
LOG=benchmarks/results/tpu_fire.log
echo "$(date -u +%T) tpu_fire start" >> "$LOG"

probe() {
  timeout 300 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((128,128)) @ jnp.ones((128,128)))" >/dev/null 2>&1
}

# Phase 1: wait for the chip (probe every 10 min, up to ~11 h)
for i in $(seq 1 66); do
  if probe; then
    echo "$(date -u +%T) chip ALIVE (probe $i)" >> "$LOG"
    break
  fi
  echo "$(date -u +%T) tpu still down (probe $i)" >> "$LOG"
  if [ "$i" -eq 66 ]; then
    echo "$(date -u +%T) giving up: outage outlasted the window" >> "$LOG"
    exit 1
  fi
  sleep 600
done

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1"; shift
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout 3600 "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  echo "$(date -u +%T) JOB $name rc=$?" >> "$LOG"
}

# Job 1: the driver-contract benchmark (inference + int8 + unfrozen train
# @48 dots_no_batch + both attn remat policies) — also warms .jax_cache so
# the driver's own BENCH_r04 run compiles instantly.
run_job bench python bench.py

# Job 2: batch-96 grad accumulation vs direct (VERDICT item 7 experiment b/c)
run_job train_b96_sub48 python benchmarks/train_bench.py --batch 96 --sub-batch 48 --remat-policy dots_no_batch --iters 5
run_job train_b96_direct python benchmarks/train_bench.py --batch 96 --remat-policy dots_no_batch --iters 5

# Job 3: re-verify the b48 knee with the two new attn policies at more iters
run_job train_b48_attn python benchmarks/train_bench.py --batch 48 --remat-policy dots_no_batch_attn --iters 10
run_job train_b48_gelu_attn python benchmarks/train_bench.py --batch 48 --remat-policy dots_no_batch_gelu_attn --iters 10

echo "$(date -u +%T) tpu_fire done" >> "$LOG"
