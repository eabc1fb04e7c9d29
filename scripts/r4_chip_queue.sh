#!/bin/bash
# Round-4 chip work queue (VERDICT r3 items 1, 2, 5): ONE TPU job at a time.
#
# Run this from a SNAPSHOT of the repo (cp -r /root/repo /tmp/r4_snap) so
# mid-queue source edits in the working tree don't leak into later stages.
#
# Stages (each appends JSON to /tmp/r4_chip/<stage>.log; a stage is skipped
# if its log already contains a JSON line — safe to re-run):
#   bench_parity / bench_quality / bench_adam25  — BENCH rows incl. the true
#       reference-parity Adam-25 budget (VERDICT weak #2/#8)
#   {base,drift}_s{777,1234,2024}  — 500-frame replica 3-seed A/B of the
#       round-3 drift fixes (bias_source=keyframe + finalize_realign) vs the
#       shipped defaults, matched pairs first so partial results pair up
#       (VERDICT items 1a, 2)
#   bf16_s777  — base + compute_dtype=bfloat16 (throughput lever, item 3)
#   scale2000_tracked  — 2000-frame FULL-budget tracked chip run with
#       telemetry + mesh scoring (item 5)
set -u
mkdir -p /tmp/r4_chip
cd "$(dirname "$0")/.."

have() { [ -f "/tmp/r4_chip/$1.log" ] && grep -q '{"' "/tmp/r4_chip/$1.log"; }

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if have "$stage"; then echo "=== $stage: already done, skip ==="; return; fi
  echo "=== $stage: start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "/tmp/r4_chip/$stage.log" 2>&1
  echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
}

run bench_parity  2400 python -u bench.py
run bench_quality 2400 python -u bench.py --quality
run bench_adam25  2400 python -u bench.py --adam25

for seed in 777 1234 2024; do
  run "base_s${seed}" 3600 python -u scripts/eval_replica.py \
    --config configs/synthetic/kitti_replica.yaml \
    --set "tpu_specs.seed=${seed}" \
    --dump-traj "/tmp/r4_chip/traj_base_s${seed}.npz"
  run "drift_s${seed}" 4800 python -u scripts/eval_replica.py \
    --config configs/synthetic/kitti_replica.yaml \
    --set "tpu_specs.seed=${seed}" \
    --set tpu_specs.bias_source=keyframe \
    --set tpu_specs.finalize_realign=true \
    --dump-traj "/tmp/r4_chip/traj_drift_s${seed}.npz"
done

run bf16_s777 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=777 \
  --set tpu_specs.compute_dtype=bfloat16 \
  --dump-traj /tmp/r4_chip/traj_bf16_s777.npz

run scale2000_tracked 14400 python -u scripts/scale_probe.py \
  --config configs/synthetic/kitti_replica.yaml --budget ci \
  --frames 2000 --track --report-every 100 \
  --json-out /tmp/r4_chip/scale2000.json \
  --dump-traj /tmp/r4_chip/traj_scale2000.npz

echo "r4 queue done $(date -u)"
