#!/bin/bash
# Round-4 chip queue, phase 2 — knob disentangling + round-4 levers.
# Runs from /tmp/r4_snap2 (post bias_classes commit). One TPU job at a time;
# serialize behind the kf queue via WAIT_PID.
set -u
mkdir -p /tmp/r4_chip
cd "$(dirname "$0")/.."

while [ -n "${WAIT_PID:-}" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done

have() { [ -f "/tmp/r4_chip/$1.log" ] && grep -q '{' "/tmp/r4_chip/$1.log"; }

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

# round-4 lever A/Bs (vs base_s777 and kf_s777)
ev class2_s777 3600 777 tpu_specs.bias_source=keyframe tpu_specs.bias_classes=2
ev s2s_s777    3600 777 tpu_specs.s2s_weight=10.0

# throughput lever
ev bf16_s777 3600 777 tpu_specs.compute_dtype=bfloat16

# BA-step cost decomposition (guides the Pallas fusion work)
if ! grep -q "per-iteration" /tmp/r4_chip/profile_ba.log 2>/dev/null; then
  echo "=== profile_ba: start $(date -u +%H:%M:%S) ==="
  timeout 2400 python -u scripts/profile_ba.py > /tmp/r4_chip/profile_ba.log 2>&1
  echo "=== profile_ba: rc=$? end $(date -u +%H:%M:%S) ==="
fi

# defer_sync bench A/B (round-4 pipelining lever) — runs from /tmp/r4_snap3
# (snapshot taken at the defer_sync commit) so the pair is self-consistent
if [ -d /tmp/r4_snap3 ]; then
  for v in off on; do
    stage=bench_defer_$v
    if ! grep -q '"metric"' "/tmp/r4_chip/$stage.log" 2>/dev/null; then
      echo "=== $stage: start $(date -u +%H:%M:%S) ==="
      extra=""
      [ "$v" = on ] && extra="tpu_specs.defer_sync=true"
      (cd /tmp/r4_snap3 && NERFLOAM_BENCH_SET="$extra" timeout 1800 \
        python -u bench.py) > "/tmp/r4_chip/$stage.log" 2>&1
      echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
    fi
  done
fi

# long-horizon tracked run (~1.5-2h)
run scale2000_tracked 14400 python -u scripts/scale_probe.py \
  --config configs/synthetic/kitti_replica.yaml --budget ci \
  --frames 2000 --track --report-every 100 \
  --json-out /tmp/r4_chip/scale2000.json \
  --dump-traj /tmp/r4_chip/traj_scale2000.npz

echo "r4 queue phase 2 done $(date -u)"
