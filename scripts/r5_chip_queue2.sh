#!/bin/bash
# Round-5 phase 2: BA fixed-cost profile at the new right-sized caps (where
# is the next throughput lever after 5.37?), then the long-horizon item —
# the 2000-frame tracked run at HEAD (lossless overflow; the r4 run's
# quality row predates losslessness and the right-sized budgets).
# Usage: nohup bash scripts/r5_chip_queue2.sh > /tmp/r5_queue2.log 2>&1 &
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

# Degeneracy-gated BA pose update A/B (ba_delta telemetry attributed +0.37
# of the +0.62 cm/f closed-loop along drift to the current-frame BA pose
# refinement; ba_pose_project=along removes exactly that component)
run project500_s777 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=777 \
  --set tpu_specs.ba_pose_project=along \
  --dump-traj /tmp/r5_chip/traj_project500_s777.npz

run project500_s1234 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=1234 \
  --set tpu_specs.ba_pose_project=along \
  --dump-traj /tmp/r5_chip/traj_project500_s1234.npz

run profile_ba 1800 python -u scripts/profile_ba.py

# scale2000 launches separately once the A/B picks its config (base vs
# ba_pose_project=along)

echo "r5 queue2 done $(date -u)"
