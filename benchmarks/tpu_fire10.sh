#!/bin/bash
# Phase 10 (round 5, first chip phase): finish the BN-protocol grid at
# the reference's third pinned seed (333) — VERDICT r4 "do this" #2.
# The host migrated between rounds so experiments/ checkpoints are gone;
# the two seed-333 runs start clean (warm TPU compile cache in
# .jax_cache/ from r4 makes that cheap), and seeds 111/222 evidence is
# restored into the log dir from the committed studies/results jsonls so
# the aggregate/paired tables come out at n=3.
# First phase of the round: no predecessor pidfile to wait on.
set -u
cd /root/repo
LOG=benchmarks/results/tpu_fire10.log
echo "$(date -u +%T) tpu_fire10 start" >> "$LOG"

touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "$(date -u +%T) JOB $name: $*" >> "$LOG"
  timeout "$tmo" "$@" > "benchmarks/results/${name}.out" 2> "benchmarks/results/${name}.err"
  local rc=$?
  echo "$(date -u +%T) JOB $name rc=$rc" >> "$LOG"
}

# Restore the committed seed-111/222 metrics so aggregation sees n=3.
for f in studies/results/bn_ablation_mirflickr/bn_ablation_mirflickr_*.metrics.jsonl; do
  name=$(basename "$f" .metrics.jsonl)
  mkdir -p "experiments/bn_mirflickr/$name"
  cp -n "$f" "experiments/bn_mirflickr/$name/metrics.jsonl"
done

# Hard deadline 14:00 UTC: round 5 ends ~18:30; the LN-stat perf study
# and the final bench need the chip after this.  checkpoint_freq=5 +
# maybe_resume keep a timeout-cut run resumable.
DEADLINE=$(date -u -d "14:00" +%s)
TMO=$(( DEADLINE - $(date +%s) ))
[ "$TMO" -lt 600 ] && { echo "$(date -u +%T) too close to deadline, skipping study" >> "$LOG"; exit 0; }
run_job bn_seed333 "$TMO" python studies/run_plan.py studies/bn_ablation_mirflickr_seed333.yaml --retries 2
run_job bn_aggregate3 600 python studies/aggregate_results.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr \
  --metric "test/maphashing_level0,test/bit_balance_level0,test/worst_bit_balance_level0,test/precision_at_1_level0,test/map_at_r_level0" \
  --markdown experiments/bn_mirflickr/AGGREGATE.md
run_job bn_paired3 600 python studies/paired_analysis.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --sweep-key use_bn --baseline False \
  --metrics "test/maphashing_level0,test/precision_at_1_level0,test/bit_balance_level0" \
  --out experiments/bn_mirflickr/PAIRED.md
run_job bn_snapshot3 600 python studies/snapshot_results.py --log-dir experiments/bn_mirflickr \
  --study bn_ablation_mirflickr --metric test/maphashing_level0 \
  --out studies/results/bn_ablation_mirflickr

echo "$(date -u +%T) tpu_fire10 done" >> "$LOG"
