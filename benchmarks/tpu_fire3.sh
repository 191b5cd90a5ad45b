#!/bin/bash
# Phase 3 of the round-4 chip queue: inference batch knee re-scan (the
# bf16 residual carry moved the HBM working set), then the BN ablation at
# the reference's FULL MIRFlickr protocol scale (3 seeds, matching the
# reference's studies/bn_ablation_voc.yaml; cheap because the protocol
# pins step_per_epoch=10).
# Waits for phase 2 (tpu_fire2.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire3.log
echo "$(date -u +%T) tpu_fire3 start" >> "$LOG"

if [ -f /tmp/tpu_fire2.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire2.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 2 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  echo "$(date -u +%T) JOB $name rc=$?" >> "$LOG"
}

# full remat ("nothing") won at b48 (364 img/s / 27.1% vs 356.6 for
# dots_no_batch): recompute beats HBM reads of the saved dots.  Scan the
# batch axis under full remat — less saved memory may move the knee up.
run_job train_b64_nothing 2400 python benchmarks/train_bench.py --batch 64 --remat-policy nothing --iters 10
run_job train_b96_nothing 2400 python benchmarks/train_bench.py --batch 96 --remat-policy nothing --iters 10

run_job infer_sweep 3600 python benchmarks/infer_sweep.py

run_job bn_mirflickr 14400 python studies/run_plan.py studies/bn_ablation_mirflickr_protocol.yaml --retries 2
run_job bn_aggregate 600 python studies/aggregate_results.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --metric test/maphashing_level0 \
  --markdown experiments/bn_mirflickr/AGGREGATE.md
run_job bn_paired 600 python studies/paired_analysis.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --sweep-key use_bn --baseline False

echo "$(date -u +%T) tpu_fire3 done" >> "$LOG"
