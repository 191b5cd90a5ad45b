#!/bin/bash
# Phase 4 of the round-4 chip queue: profiler evidence for the full-remat
# ("nothing") winner — an xplane breakdown showing where the unfrozen step
# spends HBM/compute now that zero activations are saved — then a bench.py
# pre-flight so the driver's end-of-round run hits a warm compile cache and
# a known-green path.
# Waits for phase 3 (tpu_fire3.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire4.log
echo "$(date -u +%T) tpu_fire4 start" >> "$LOG"

if [ -f /tmp/tpu_fire3.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire3.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 3 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  echo "$(date -u +%T) JOB $name rc=$?" >> "$LOG"
}

run_job profile_nothing 2400 python benchmarks/profile_train.py \
  --batch 48 --remat-policy nothing --steps 3 --top 30

run_job bench_preflight 5400 python bench.py

echo "$(date -u +%T) tpu_fire4 done" >> "$LOG"
