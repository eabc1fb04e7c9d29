#!/bin/bash
# Round-4 chip queue, phase 2 — knob disentangling + round-4 levers.
#
# Reordered continuation of scripts/r4_chip_queue.sh (phase 1): the 3-seed
# drift A/B showed bias_source=keyframe kills dz on every seed while the
# combined variant worsens lateral (finalize_realign suspect: 30 cm
# single-frame steps). Before spending ~2h on scale2000, disentangle the
# knobs and A/B the two new levers (s2s odometry term, per-class bias).
#
# Launch from a FRESH snapshot (cp -r /root/repo /tmp/r4_snap2) that
# includes the bias_classes=2 commit. Same stage protocol as phase 1:
# skip-if-done, one TPU job at a time.
set -u
mkdir -p /tmp/r4_chip
cd "$(dirname "$0")/.."

# serialize behind a still-running phase-1 job (pass WAIT_PID=<pid>)
while [ -n "${WAIT_PID:-}" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done

have() { [ -f "/tmp/r4_chip/$1.log" ] && grep -q '{"' "/tmp/r4_chip/$1.log"; }

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if have "$stage"; then echo "=== $stage: already done, skip ==="; return; fi
  echo "=== $stage: start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "/tmp/r4_chip/$stage.log" 2>&1
  echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
}

ev() { # ev <stage> <timeout> <seed> <extra overrides...>
  local stage=$1 tmo=$2 seed=$3; shift 3
  local extra=()
  for o in "$@"; do extra+=(--set "$o"); done
  run "$stage" "$tmo" python -u scripts/eval_replica.py \
    --config configs/synthetic/kitti_replica.yaml \
    --set "tpu_specs.seed=${seed}" "${extra[@]}" \
    --dump-traj "/tmp/r4_chip/traj_${stage}.npz"
}

# knob disentangle: keyframe bias WITHOUT finalize_realign (2 seeds)
ev kf_s777  3600 777  tpu_specs.bias_source=keyframe
ev kf_s1234 3600 1234 tpu_specs.bias_source=keyframe

# round-4 lever A/Bs (vs base_s777 and kf_s777)
ev class2_s777 3600 777 tpu_specs.bias_source=keyframe tpu_specs.bias_classes=2
ev s2s_s777    3600 777 tpu_specs.s2s_weight=10.0

# throughput lever (phase-1 stage, deferred)
ev bf16_s777 3600 777 tpu_specs.compute_dtype=bfloat16

# long-horizon tracked run (phase-1 stage, deferred to last: ~1.5-2h)
run scale2000_tracked 14400 python -u scripts/scale_probe.py \
  --config configs/synthetic/kitti_replica.yaml --budget ci \
  --frames 2000 --track --report-every 100 \
  --json-out /tmp/r4_chip/scale2000.json \
  --dump-traj /tmp/r4_chip/traj_scale2000.npz

echo "r4 queue phase 2 done $(date -u)"
