#!/bin/bash
# Round-5 phase 1: benches at HEAD (lossless overflow + right-sized caps),
# then the closed-loop 500-frame tier at HEAD — the open-loop frontier pull
# measured ~0 at HEAD (frontier_maturity.json; the r4 +0.56 probe was
# contaminated by the lossy drop path), so the question is whether the
# closed-loop +0.55 cm/f along-track invariant survives losslessness.
# Usage: nohup bash scripts/r5_chip_queue.sh > /tmp/r5_queue.log 2>&1 &
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

run bench_parity  2400 python -u bench.py
run bench_adam25  2400 python -u bench.py --adam25
run bench_quality 2400 python -u bench.py --quality

# feedback-gain probe: open-loop frontier pull is ~0 at HEAD yet closed-loop
# runs drift along-track — measure the surviving fraction of an injected
# 5 cm init error per axis (along >> lat/z survival = weak along-track
# observability feeding the const-vel recurrence)
run gain_probe 7200 python -u scripts/probe_drift_force.py \
  --mode gain --frames 60 --probe-every 2 --warmup 8 \
  --json-out /tmp/r5_chip/gain_probe.json

run base500_s777 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=777 \
  --dump-traj /tmp/r5_chip/traj_base500_s777.npz

run base500_s1234 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=1234 \
  --dump-traj /tmp/r5_chip/traj_base500_s1234.npz

run base500_s42 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=42 \
  --dump-traj /tmp/r5_chip/traj_base500_s42.npz

echo "r5 queue1 done $(date -u)"
