#!/bin/bash
# Phase 2 of the round-4 chip queue. Order chosen by risk: the quick
# remat-spectrum experiments (VERDICT item 7, each ~10 min) fire before
# the ~3 h protocol-scale seed-334 lambda runs (VERDICT item 2), so a
# recurrence of the axon outage can't erase both.
# Waits for phase 1 (tpu_fire.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire2.log
echo "$(date -u +%T) tpu_fire2 start" >> "$LOG"

if [ -f /tmp/tpu_fire.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire.pid)" 2>/dev/null; do sleep 30; done
fi
echo "$(date -u +%T) phase 1 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  echo "$(date -u +%T) JOB $name rc=$?" >> "$LOG"
}

# --- remat spectrum at the b48 knee: bound the save-everything /
# save-dots / full-remat axis that no round has measured end-to-end ---
run_job train_b48_dots      2400 python benchmarks/train_bench.py --batch 48 --remat-policy dots --iters 10
run_job train_b48_nothing   2400 python benchmarks/train_bench.py --batch 48 --remat-policy nothing --iters 10
run_job train_b48_everything 2400 python benchmarks/train_bench.py --batch 48 --remat-policy everything --iters 10
run_job train_b64_dots      2400 python benchmarks/train_bench.py --batch 64 --remat-policy dots --iters 10

# --- protocol-scale seed-334 lambda completion ---
# seed-334 ortho_weight=1 resumes from its epoch-5 checkpoint
# (maybe_resume=true); the finished ortho_weight=0 run no-ops.
run_job seed334 7200 python studies/run_plan.py studies/voc_lambda_protocol_seed334.yaml --retries 2
# the three mid lambdas ride runtime ortho_scale over one shared compile
run_job seed334b 12600 python studies/run_plan.py studies/voc_lambda_protocol_seed334b.yaml --retries 2

run_job aggregate 600 python studies/aggregate_results.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --rename ortho_scale=ortho_weight \
  --metric test/maphashing_level0 --markdown experiments/protocol/AGGREGATE.md
run_job paired 600 python studies/paired_analysis.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --sweep-key ortho_weight,ortho_scale --baseline 0

echo "$(date -u +%T) tpu_fire2 done" >> "$LOG"
