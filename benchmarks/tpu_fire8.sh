#!/bin/bash
# Phase 8 of the round-4 chip queue: finish the λ=10 seed-334 protocol
# run at eval_bs=500.  Its two previous attempts died with
# RESOURCE_EXHAUSTED *at the epoch-35 eval* while sole owner of the chip
# — marginal HBM headroom in the f32-accumulating metric suite on top of
# the resident unfrozen train state; identical shapes passed 10 evals in
# the λ=0.1 run, so this is allocator-state-dependent, and halving the
# eval embed batch restores headroom.  eval_bs is an engineering knob
# (the protocol pins batch/top_k/metric, not eval batching).
# Then re-aggregate + paired over the complete 5λ × 2-seed grid.
# Runs immediately (the chip is free when this is armed); fire7 re-arms
# behind it.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire8.log
echo "$(date -u +%T) tpu_fire8 start" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

run_job seed334_l10b 5400 python single_experiment_runner.py \
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
  experience.evaluation.distance_metric=hamming experience.eval_bs=500 \
  experience.sub_batch=96 experience.num_workers=8 \
  experience.checkpoint_freq=5 experience.maybe_resume=true \
  experience.log_dir=experiments/protocol experience.ortho_scale=10 \
  experience.seed=334 \
  experience.experiment_name=voc_lambda_protocol_ortho_scale=10_seed=334

run_job aggregate3 600 python studies/aggregate_results.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --rename ortho_scale=ortho_weight \
  --metric test/maphashing_level0 --markdown experiments/protocol/AGGREGATE.md
run_job paired3 600 python studies/paired_analysis.py --log-dir experiments/protocol \
  --study voc_lambda_protocol --sweep-key ortho_weight,ortho_scale --baseline 0

echo "$(date -u +%T) tpu_fire8 done" >> "$LOG"
