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

run profile_ba 1800 python -u scripts/profile_ba.py

run scale2000_tracked 14400 python -u scripts/scale_probe.py \
  --config configs/synthetic/kitti_replica.yaml --budget ci \
  --frames 2000 --track --report-every 100 \
  --json-out /tmp/r5_chip/scale2000.json \
  --dump-traj /tmp/r5_chip/traj_scale2000.npz

echo "r5 queue2 done $(date -u)"
