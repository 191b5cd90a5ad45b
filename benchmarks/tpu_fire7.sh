#!/bin/bash
# Phase 7 of the round-4 chip queue: clean re-run of the BN ablation at
# the reference's full MIRFlickr protocol scale.  The first attempt
# (phase 3) was destroyed by the duplicate-instance hazard: TWO fire3
# instances (armed 04:16 and 04:32) woke together and ran the job list
# concurrently, so all six BN jobs died in RESOURCE_EXHAUSTED storms at
# the first eval, before the epoch-10 checkpoint.  This re-run starts
# from deleted run dirs with checkpoint_freq=5 and eval_bs=500 (see the
# study yaml).  Sweep order is seed-paired, so if the round ends mid-way
# each completed seed still yields a paired use_bn contrast, and
# maybe_resume picks up the rest next round.
# Waits for phase 6 (tpu_fire6.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire7.log
echo "$(date -u +%T) tpu_fire7 start" >> "$LOG"

if [ -f /tmp/tpu_fire8.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire8.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 8 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

# Hard deadline 14:35 UTC: the round ends ~15:30 and the driver's
# end-of-round bench.py must find the chip free (BENCH_r03 died to a
# held/wedged chip).  A timeout mid-run is safe: checkpoint_freq=5 +
# maybe_resume make every run resumable next round.
DEADLINE=$(date -u -d "14:35" +%s)
TMO=$(( DEADLINE - $(date +%s) ))
[ "$TMO" -lt 600 ] && { echo "$(date -u +%T) too close to round end, skipping study" >> "$LOG"; exit 0; }
run_job bn_mirflickr2 "$TMO" python studies/run_plan.py studies/bn_ablation_mirflickr_protocol.yaml --retries 2
run_job bn_aggregate2 600 python studies/aggregate_results.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --metric test/maphashing_level0 \
  --markdown experiments/bn_mirflickr/AGGREGATE.md
run_job bn_paired2 600 python studies/paired_analysis.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --sweep-key use_bn --baseline False

echo "$(date -u +%T) tpu_fire7 done" >> "$LOG"
