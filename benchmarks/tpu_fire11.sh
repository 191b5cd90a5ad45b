#!/bin/bash
# Phase 11 (round 5): the LN-stat spill lever (VERDICT r5 "do this" #1)
# + loader-fed throughput (#4) + bench preflight with the new
# vmem_attn_parity extra (#7).  Waits for phase 10 (BN seed-333) to
# release the chip.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire11.log
echo "$(date -u +%T) tpu_fire11 start" >> "$LOG"

if [ -f /tmp/tpu_fire10.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire10.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 10 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

# A/B the fused LayerNorm at the two tracked batch sizes (48 = knee,
# 96 = the reference protocol batch), same session, baseline re-measured.
run_job train_b48_lnfused 2400 python benchmarks/train_bench.py \
  --batch 48 --remat-policy nothing --vmem-attn --ln-fused
run_job train_b48_lnbase 2400 python benchmarks/train_bench.py \
  --batch 48 --remat-policy nothing --vmem-attn
run_job train_b96_lnfused 2400 python benchmarks/train_bench.py \
  --batch 96 --remat-policy nothing --vmem-attn --ln-fused
run_job train_b96_lnbase 2400 python benchmarks/train_bench.py \
  --batch 96 --remat-policy nothing --vmem-attn
# op-class profile with the fused LN: did the f32[4,B,257] copy class move?
run_job profile_lnfused 2400 python benchmarks/profile_train.py \
  --batch 48 --remat-policy nothing --vmem-attn --ln-fused \
  --trace-dir experiments/profiles/r5_lnfused_b48

# host loader benchmark on the QUIET host (no chip contention): native vs
# PIL thread scaling + the augmented train pipelines
run_job loader_bench 2400 env PYTHONPATH=/root/repo/tools/cpusite \
  python benchmarks/loader_bench.py --n 384 --train
# loader-FED sustained train throughput on the chip (decode→augment→step
# overlapped), with the per-leg decomposition incl. the dev-tunnel rate
run_job loader_train 3600 python benchmarks/loader_train_bench.py \
  --n 480 --epochs 2 --batch 48

echo "$(date -u +%T) tpu_fire11 done" >> "$LOG"
