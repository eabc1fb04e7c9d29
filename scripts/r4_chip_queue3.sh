#!/bin/bash
# Round-4 chip queue, phase 3 — unified skip-if-done continuation.
#
# Supersedes the phase-2 runner: reordered so the decision-critical short
# rows (kf_s1234 re-run, second-seed lever confirmations, bf16, profile,
# defer bench) land before the ~2-4h scale2000 run. Stages already done
# (JSON present in /tmp/r4_chip/<stage>.log) are skipped, so this is safe
# to kill and relaunch at any time.
#
# Snapshots: /tmp/r4_snap  = phase-1 code (base/drift/kf A/B rows)
#            /tmp/r4_snap2 = post bias_classes+s2s commit (lever rows)
#            /tmp/r4_snap3 = post defer_sync commit (defer bench pair)
set -u
mkdir -p /tmp/r4_chip

while [ -n "${WAIT_PID:-}" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done

have() { [ -f "/tmp/r4_chip/$1.log" ] && grep -q '{' "/tmp/r4_chip/$1.log"; }

ev() { # ev <snapdir> <stage> <timeout> <seed> <extra overrides...>
  local snap=$1 stage=$2 tmo=$3 seed=$4; shift 4
  if have "$stage"; then echo "=== $stage: done, skip ==="; return; fi
  local extra=()
  for o in "$@"; do extra+=(--set "$o"); done
  echo "=== $stage: start $(date -u +%H:%M:%S) ==="
  (cd "$snap" && timeout "$tmo" python -u scripts/eval_replica.py \
    --config configs/synthetic/kitti_replica.yaml \
    --set "tpu_specs.seed=${seed}" "${extra[@]}" \
    --dump-traj "/tmp/r4_chip/traj_${stage}.npz") \
    > "/tmp/r4_chip/$stage.log" 2>&1
  echo "=== $stage: rc=$? end $(date -u +%H:%M:%S) ==="
}

# 1. the lost phase-2 disentangle row (phase-1 code for a clean A/B)
ev /tmp/r4_snap kf_s1234 3600 1234 tpu_specs.bias_source=keyframe

# 2. round-4 lever A/Bs, first seed (usually already done -> skipped)
ev /tmp/r4_snap2 class2_s777 3600 777 \
  tpu_specs.bias_source=keyframe tpu_specs.bias_classes=2
ev /tmp/r4_snap2 s2s_s777 3600 777 tpu_specs.s2s_weight=10.0

# 3. throughput lever
ev /tmp/r4_snap2 bf16_s777 3600 777 tpu_specs.compute_dtype=bfloat16

# 4. BA-step cost decomposition (guides the fusion/repack work)
if ! grep -q "per-iteration" /tmp/r4_chip/profile_ba.log 2>/dev/null; then
  echo "=== profile_ba: start $(date -u +%H:%M:%S) ==="
  (cd /tmp/r4_snap2 && timeout 2400 python -u scripts/profile_ba.py) \
    > /tmp/r4_chip/profile_ba.log 2>&1
  echo "=== profile_ba: rc=$? end $(date -u +%H:%M:%S) ==="
fi

# 5. defer_sync bench A/B (pipelining lever) — from the defer_sync snapshot
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

# 6. second-seed confirmations for the winning levers
ev /tmp/r4_snap2 class2_s1234 3600 1234 \
  tpu_specs.bias_source=keyframe tpu_specs.bias_classes=2
ev /tmp/r4_snap2 s2s_s1234 3600 1234 tpu_specs.s2s_weight=10.0

# 7. long-horizon tracked run (~2-4h) — last
if ! grep -q '"frame"' /tmp/r4_chip/scale2000.json 2>/dev/null && \
   ! have scale2000_tracked; then
  echo "=== scale2000_tracked: start $(date -u +%H:%M:%S) ==="
  (cd /tmp/r4_snap2 && timeout 14400 python -u scripts/scale_probe.py \
    --config configs/synthetic/kitti_replica.yaml --budget ci \
    --frames 2000 --track --report-every 100 \
    --json-out /tmp/r4_chip/scale2000.json \
    --dump-traj /tmp/r4_chip/traj_scale2000.npz) \
    > /tmp/r4_chip/scale2000_tracked.log 2>&1
  echo "=== scale2000_tracked: rc=$? end $(date -u +%H:%M:%S) ==="
fi

echo "r4 queue phase 3 done $(date -u)"
