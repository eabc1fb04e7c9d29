#!/bin/bash
# Round-3 chip work queue — run when the axon tunnel is back.
# Each stage appends to /tmp/r3_chip/<stage>.log; safe to re-run, stages
# skip if their log already has a result line. ONE TPU job at a time.
set -u
mkdir -p /tmp/r3_chip
cd "$(dirname "$0")/.."

have() { [ -f "/tmp/r3_chip/$1.log" ] && grep -q '"' "/tmp/r3_chip/$1.log"; }

if ! have bench_parity; then
  echo "=== bench parity ==="
  timeout 1800 python -u bench.py > /tmp/r3_chip/bench_parity.log 2>&1
fi
if ! have bench_quality; then
  echo "=== bench quality ==="
  timeout 1800 python -u bench.py --quality > /tmp/r3_chip/bench_quality.log 2>&1
fi
if ! have drift_ab; then
  echo "=== 500-frame drift A/B (keyframe bias + finalize realign) ==="
  timeout 4800 python -u scripts/eval_replica.py \
    --config configs/synthetic/kitti_replica.yaml \
    --set tpu_specs.bias_source=keyframe \
    --set tpu_specs.finalize_realign=true \
    --dump-traj /tmp/r3_chip/traj_drift.npz \
    > /tmp/r3_chip/drift_ab.log 2>&1
fi
echo "queue done; next (manual): 2000-frame run once drift A/B is read"
