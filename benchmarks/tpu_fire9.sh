#!/bin/bash
# Phase 9 (final) of the round-4 chip queue: one last bench.py pre-flight
# with the FINAL code of the round (the 09:36 pre-flight predates the
# chip-lock wiring in bench.py), so the driver's end-of-round bench hits
# a validated path and a warm compile cache.  Bounded to finish before
# the ~15:30 round end.
# Waits for phase 7 (tpu_fire7.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire9.log
echo "$(date -u +%T) tpu_fire9 start" >> "$LOG"

if [ -f /tmp/tpu_fire7.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire7.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 7 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

# stop at 15:10 UTC at the latest — leave the chip to the driver
DEADLINE=$(date -u -d "15:10" +%s)
TMO=$(( DEADLINE - $(date +%s) ))
[ "$TMO" -lt 300 ] && { echo "$(date -u +%T) too close to round end, skipping" >> "$LOG"; exit 0; }
run_job bench_final "$TMO" python bench.py

echo "$(date -u +%T) tpu_fire9 done" >> "$LOG"
