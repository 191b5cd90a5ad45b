#!/bin/bash
# Phase 2 of the round-4 chip queue: finish the protocol-scale seed-334
# lambda runs (VERDICT item 2), then regenerate the aggregate tables.
# Waits for phase 1 (tpu_fire.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire2.log
echo "$(date -u +%T) tpu_fire2 start" >> "$LOG"

# wait for phase 1 to exit (ONE process owns the TPU at a time)
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

# seed-334 ortho_weight=1 resumes from its epoch-5 checkpoint
# (maybe_resume=true); the finished ortho_weight=0 run no-ops.
run_job seed334 7200 python studies/run_plan.py studies/voc_lambda_protocol_seed334.yaml --retries 2
# the three mid lambdas ride runtime ortho_scale over one shared compile
run_job seed334b 10800 python studies/run_plan.py studies/voc_lambda_protocol_seed334b.yaml --retries 2

run_job aggregate 600 python studies/aggregate_results.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --rename ortho_scale=ortho_weight \
  --metric test/maphashing_level0 --markdown experiments/protocol/AGGREGATE.md
run_job paired 600 python studies/paired_analysis.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --sweep-key ortho_weight,ortho_scale --baseline 0

echo "$(date -u +%T) tpu_fire2 done" >> "$LOG"
