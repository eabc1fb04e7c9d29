#!/bin/bash
# Round-5 phase 3: retry project500_s1234 (first attempt died on a transient
# axon remote-compile tunnel drop, /tmp/r5_chip/project500_s1234.log), then
# the long-horizon item — 2000 frames WITH the degeneracy gate (the s777 A/B
# cut the along-track drift rate 33%; rate cuts compound at horizon).
# Usage: nohup bash scripts/r5_chip_queue3.sh > /tmp/r5_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_chip

have() { [ -f "/tmp/r5_chip/$1.log" ] && grep -q '{"' "/tmp/r5_chip/$1.log"; }

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if have "$stage"; then echo "=== $stage: already done, skip ==="; return; fi
  echo "=== $stage: start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "/tmp/r5_chip/$stage.log" 2>&1
  echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
}

run project500_s1234_r 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=1234 \
  --set tpu_specs.ba_pose_project=along \
  --dump-traj /tmp/r5_chip/traj_project500_s1234.npz

run scale2000_project 14400 python -u scripts/scale_probe.py \
  --config configs/synthetic/kitti_replica.yaml --budget ci \
  --frames 2000 --track --report-every 100 \
  --set tpu_specs.ba_pose_project=along \
  --json-out /tmp/r5_chip/scale2000_project.json \
  --dump-traj /tmp/r5_chip/traj_scale2000_project.npz

echo "r5 queue3 done $(date -u)"
