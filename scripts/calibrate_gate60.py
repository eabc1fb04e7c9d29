"""Calibrate the default-suite 60-frame 2-seed gate (VERDICT r4 item 6).

Runs the candidate gate budget over clean seeds and over seeds with an
injected 30%-class regression, prints per-run metrics + wall time, and the
threshold table to paste into tests/test_replica_gates.py. The injected
regression is the round-2 vertical-sink class (quality stack off:
support_dist=0 / band_samples=0 / bias_correction=false) plus a milder
tracker-budget cut for the 30%-class probe.

Usage (1-core CPU host, ~7 min per run):
    JAX_PLATFORMS=cpu python scripts/calibrate_gate60.py [--seeds 0 1] \
        [--variants clean stackoff] [--json-out /tmp/gate60.json]
"""

import argparse
import importlib.util
import json
import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def _load_eval_runner():
    spec = importlib.util.spec_from_file_location(
        "eval_replica", os.path.join(_ROOT, "scripts", "eval_replica.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Candidate gate budget: longer horizon than the 40-frame micro (drift-rate
# regressions integrate with horizon) at a leaner per-frame budget so two
# seeds fit the default-suite wall-clock.
GATE60 = [
    "data_specs.n_frames=60",
    "data_specs.n_beams=24",
    "data_specs.n_azimuth=192",
    "tracker_specs.N_rays=384",
    "tracker_specs.num_iterations=12",
    "mapper_specs.N_rays_each=384",
    "mapper_specs.num_iterations=12",
    "tpu_specs.track_samples=48",
    "tpu_specs.map_samples=32",
    "tpu_specs.points_pad=8192",
    "tpu_specs.kf_points_pad=8192",
    "tpu_specs.map_capacity=524288",
    "tpu_specs.active_cap=131072",
    "tpu_specs.touched_cap=131072",
    "tpu_specs.bootstrap_steps=6",
    "tpu_specs.sampler=grid",
    # calibration-frozen: the gate measures THIS config regardless of what
    # dataset-config defaults later ship (the degeneracy gate was A/B'd
    # separately, EVAL_r05 phase 3); a default flip must not silently move
    # the gate's calibrated band
    "tpu_specs.ba_pose_project=none",
]

VARIANTS = {
    "clean": [],
    # the round-2 vertical-sink regression class (2x-class on the micro
    # gate: aligned 0.052 -> 0.123)
    "stackoff": [
        "tpu_specs.support_dist=0",
        "tpu_specs.band_samples=0",
        "tpu_specs.bias_correction=false",
    ],
    # budget-starvation probes: cut GN tracker iterations (default 16).
    # NOTE: the GN tracker's loop count is tpu_specs.track_gn_iterations
    # (pipeline.py:217-221), NOT tracker_specs.num_iterations (Adam only) —
    # the first calibration run injected the wrong key and reproduced the
    # clean rows bitwise (an accidental determinism check).
    "trackcut8": ["tpu_specs.track_gn_iterations=8"],    # 2x cut
    "trackcut11": ["tpu_specs.track_gn_iterations=11"],  # ~30% cut
    #   (measured GATE60, seeds 0/1: quality-NEUTRAL — the GN budget has
    #   ~30% headroom at this horizon; raw 0.199/0.122 vs clean 0.162/0.111)
    # single-knob quality-stack cut: bias transfer off alone (the milder
    # sibling of stackoff — candidate ~30%-metric-class injection)
    "biasoff": ["tpu_specs.bias_correction=false"],
}



# Lean cap right-sizing: GATE60's pinned 131072 caps make every frame pay
# an O(cap) reconcile/pack fixed cost that a 60-frame scene never needs
# (the r5 bench insight, EVAL_r05 phase 2). Overflow is lossless, so thin
# caps are safe — a growth event just re-jits once.
LEAN = [
    "tpu_specs.map_capacity=262144",
    "tpu_specs.active_cap=49152",  # measured 60-frame peak 33332 x 1.5
    "tpu_specs.touched_cap=0",   # auto: min(active_cap, 4096), grow lossless
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    p.add_argument("--variants", nargs="+", default=list(VARIANTS))
    p.add_argument("--lean", action="store_true",
                   help="append LEAN cap right-sizing to the gate budget")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    mod = _load_eval_runner()
    cfg_path = os.path.join(_ROOT, "configs", "synthetic",
                            "kitti_replica_ci.yaml")
    budget = GATE60 + (LEAN if args.lean else [])
    out = {}
    for variant in args.variants:
        for seed in args.seeds:
            t0 = time.perf_counter()
            r = mod.run_eval(
                cfg_path,
                budget + VARIANTS[variant] + [f"data_specs.seed={seed}"],
                mesh_samples_n=60000,
            )
            r["calib_wall_s"] = round(time.perf_counter() - t0, 1)
            key = f"{variant}_s{seed}"
            out[key] = r
            print(key, json.dumps(r), flush=True)
            # write-through after every run: a container restart mid-
            # calibration keeps the completed rows (r5 lost a full
            # calibration to exactly this)
            if args.json_out:
                with open(args.json_out, "w") as fh:
                    json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
