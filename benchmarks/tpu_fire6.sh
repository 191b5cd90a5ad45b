#!/bin/bash
# Phase 6 of the round-4 chip queue — corrective pass:
#  (a) finish the λ=10 seed-334 protocol run (phase 2's outer `timeout`
#      TERM'd run_plan at exactly 3 h while this job was at epoch 35;
#      maybe_resume picks it up from the epoch-35 rolling checkpoint);
#  (b) re-aggregate + paired analysis over the now-complete 5λ × 2-seed
#      protocol grid;
#  (c) re-run the inference batch-knee sweep (phase 3's run crashed on a
#      sys.path bug, fixed in benchmarks/infer_sweep.py).
# NOTE: this script's run_job captures rc BEFORE the echo — the older
# fire scripts logged `rc=$?` after a $(date) substitution, so their
# rc values are always 0 and meaningless; trust job .out/.err instead.
# Waits for phase 5 (tpu_fire5.sh) to release the chip first.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire6.log
echo "$(date -u +%T) tpu_fire6 start" >> "$LOG"

if [ -f /tmp/tpu_fire5.pid ]; then
  while kill -0 "$(cat /tmp/tpu_fire5.pid)" 2>/dev/null; do sleep 60; done
fi
echo "$(date -u +%T) phase 5 done, chip free" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

run_job seed334_l10 3600 python single_experiment_runner.py \
  dataset=voc_synthetic model=multidino_attention_hashing_ortho \
  loss=hash_loss transform=voc_swt optimizer=basic memory=voc \
  dataset.sampler.kwargs.batch_size=96 loss.0.kwargs.num_classes=20 \
  loss.0.kwargs.embedding_size=64 loss.0.kwargs.quant_weight=0.1 \
  loss.0.kwargs.scale=15.0 model.kwargs.binary_config.nbits=64 \
  model.kwargs.use_bn=true model.kwargs.fusion_config.num_queries=4 \
  model.kwargs.fusion_config.sub_band_dropout_p=0 \
  model.kwargs.fusion_config.ortho_weight=1.0 \
  experience.max_iter=50 experience.train_eval_freq=5 \
  experience.test_eval_freq=5 experience.save_model=10 \
  experience.clip_grad=null experience.evaluation.top_k=5717 \
  experience.evaluation.distance_metric=hamming experience.eval_bs=1000 \
  experience.sub_batch=96 experience.num_workers=8 \
  experience.checkpoint_freq=5 experience.maybe_resume=true \
  experience.log_dir=experiments/protocol experience.ortho_scale=10 \
  experience.seed=334 \
  experience.experiment_name=voc_lambda_protocol_ortho_scale=10_seed=334

run_job aggregate2 600 python studies/aggregate_results.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --rename ortho_scale=ortho_weight \
  --metric test/maphashing_level0 --markdown experiments/protocol/AGGREGATE.md
run_job paired2 600 python studies/paired_analysis.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --sweep-key ortho_weight,ortho_scale --baseline 0

run_job infer_sweep2 3600 python benchmarks/infer_sweep.py

echo "$(date -u +%T) tpu_fire6 done" >> "$LOG"
