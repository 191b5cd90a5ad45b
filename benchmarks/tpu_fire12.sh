#!/bin/bash
# Phase 12 (round 5): frozen-inference VMEM-kernel A/B (the headline path
# has never used the kernel) + the QUIET-host timed fast tier (VERDICT r5
# "do this" #8 needs an uncontended run).  Waits for phase 11.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire12.log
echo "$(date -u +%T) tpu_fire12 start" >> "$LOG"

if [ -f /tmp/tpu_fire11.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire11.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 11 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

run_job infer_vmem_ab 3000 python benchmarks/infer_vmem_ab.py 48 64 96

# quiet-host timed fast tier (chip idle, nothing else on the core);
# tests/conftest.py already forces the CPU backend + 8-device mesh
run_job fast_tier_timed 2400 python -m pytest tests/ -m "not slow" -q --durations=40

echo "$(date -u +%T) tpu_fire12 done" >> "$LOG"
