#!/bin/bash
# Round-4 chip queue, phase 4 — defer_sync validation + touched-cap sizing
# before the long scale2000 run.
#
# Same skip-if-done protocol as phase 3 (scripts/r4_chip_queue3.sh). Pass
# WAIT_PID=<pid of the in-flight eval> to serialize behind it.
#
# Snapshots: /tmp/r4_snap2 = post bias_classes+s2s commit (lever rows)
#            /tmp/r4_snap3 = post defer_sync commit
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

# 1. remaining second-seed lever confirmation
ev /tmp/r4_snap2 s2s_s1234 3600 1234 tpu_specs.s2s_weight=10.0

# 2. defer_sync quality validation at the 500-frame tier (bench showed
#    3.633 -> 4.673 scans/s; this checks the one-frame-lag semantics hold
#    quality at horizon)
ev /tmp/r4_snap3 defer500_s777 3600 777 tpu_specs.defer_sync=true

# 3. actual touched count at the bench budget (sizes the touched_cap
#    right-sizing lever; repo copy has the instrumented profile_ba)
if ! grep -q "touched_count" /tmp/r4_chip/profile_ba2.log 2>/dev/null; then
  echo "=== profile_ba2: start $(date -u +%H:%M:%S) ==="
  (cd /root/repo && timeout 2400 python -u scripts/profile_ba.py) \
    > /tmp/r4_chip/profile_ba2.log 2>&1
  echo "=== profile_ba2: rc=$? end $(date -u +%H:%M:%S) ==="
fi

# 4. long-horizon tracked run (~1.5-3h) — last
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

echo "r4 queue phase 4 done $(date -u)"
