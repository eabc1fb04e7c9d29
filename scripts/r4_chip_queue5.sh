#!/bin/bash
# Round-4 phase 5: re-bench after the right-sized reconcile/active budgets
# (touched_cap 8192 / active_cap 32768) + defer_sync default, then validate
# quality neutrality of the auto touched_cap at the 500-frame tier, then
# the frontier-pull probe (along-track hypothesis test).
# Usage: nohup bash scripts/r4_chip_queue5.sh > /tmp/r4_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4_chip

have() { [ -f "/tmp/r4_chip/$1.log" ] && grep -q '{"' "/tmp/r4_chip/$1.log"; }

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if have "$stage"; then echo "=== $stage: already done, skip ==="; return; fi
  echo "=== $stage: start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "/tmp/r4_chip/$stage.log" 2>&1
  echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
}

run bench_parity5  2400 python -u bench.py
run bench_quality5 2400 python -u bench.py --quality
run bench_adam25_5 2400 python -u bench.py --adam25

# auto touched_cap quality neutrality at the 500-frame tier (kitti_replica
# leaves touched_cap unset -> auto-start 4096 + growth; compare against the
# base_s777 row: ate_raw 2.373 / f 0.184)
run autocap500_s777 3600 python -u scripts/eval_replica.py \
  --config configs/synthetic/kitti_replica.yaml \
  --set tpu_specs.seed=777 \
  --dump-traj /tmp/r4_chip/traj_autocap500_s777.npz

# frontier-pull probe: the along-track mechanism test (EVAL_r04 killed the
# settled-field/range-scale hypotheses; this measures the pull against the
# LIVE map at the frontier, the closed-loop tracker's actual regime)
run frontier_probe 7200 python -u scripts/probe_drift_force.py \
  --mode frontier --frames 60 --probe-every 2 --warmup 8 \
  --json-out /tmp/r4_chip/frontier_probe.json

echo "r4 queue5 done $(date -u)"
