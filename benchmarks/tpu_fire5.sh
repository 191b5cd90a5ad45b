#!/bin/bash
# Phase 5 of the round-4 chip queue:
#  (a) bracket the full-remat ("nothing") batch knee at b40/b56 — phase 3
#      scanned b64/b96; b48 is the incumbent at 364 img/s / 27.1% MFU;
#  (b) first ON-CHIP execution of the DSCH protocol (run.py dsch_train
#      branch → engine/dsch.py): α continuation, early stopping, best
#      restore — upgrades the e2e evidence from CPU-test-only to
#      TPU-executed (reference: main/engine/DSCH/train.py:27).
# Waits for phase 4 (tpu_fire4.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire5.log
echo "$(date -u +%T) tpu_fire5 start" >> "$LOG"

if [ -f /tmp/tpu_fire4.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire4.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 4 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  echo "$(date -u +%T) JOB $name rc=$?" >> "$LOG"
}

run_job train_b40_nothing 2400 python benchmarks/train_bench.py --batch 40 --remat-policy nothing --iters 10
run_job train_b56_nothing 2400 python benchmarks/train_bench.py --batch 56 --remat-policy nothing --iters 10

run_job dsch_tpu 3600 python single_experiment_runner.py \
  dataset=synthetic_hashing loss=dsch model=resnet_dsch \
  transform=cifar_resize optimizer=basic \
  model.kwargs.pretrained=false \
  experience.dsch_train=true experience.max_iter=5 \
  experience.step_per_epoch=8 experience.train_eval_freq=1 \
  experience.eval_bs=128 experience.num_workers=4 \
  experience.maybe_resume=false experience.save_model=5 \
  +experience.dsch.patience=5 +experience.dsch.alpha_gamma=0.2 \
  dataset.kwargs.num_samples=512 dataset.sampler.kwargs.batch_size=32 \
  experience.log_dir=experiments/dsch_smoke \
  experience.experiment_name=dsch_tpu_smoke

echo "$(date -u +%T) tpu_fire5 done" >> "$LOG"
