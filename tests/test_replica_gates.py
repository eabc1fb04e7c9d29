"""KITTI-statistics replica regression gates (VERDICT r2 items 1+8).

Runs the replica config (configs/synthetic/kitti_replica_ci) through the
FULL pipeline — startup ramp, straights, a 90-degree turn — and pins
trajectory + mesh quality. This is the stand-in for real-KITTI parity in a
container without the dataset bits: same scan statistics (spinning-LiDAR
pattern, ~1 m/frame, turns), same protocol (observed-surface GT, clean_mesh
culling, Umeyama-aligned mesh scoring).

Three tiers:
  - micro gate (always runs): 40 frames at a reduced beam/ray budget,
    ~10 min on a 1-core CPU host — the per-commit regression tripwire.
    Grid sampler (the hits sampler trades dense FLOPs for gathers, the
    right trade on TPU and the wrong one on CPU; hits/grid equivalence is
    unit-tested in test_hits_sampler.py and A/B'd on-chip, docs/PERF.md).
  - 60-frame tier (@pytest.mark.slow): the round-2 fast gate, now
    median-of-3-seeds with ~1.5x-headroom thresholds.
  - 120-frame full tier (@pytest.mark.slow): the CI budget; recorded
    full-budget numbers live in EVAL_r02.md.

Micro thresholds measured on CPU 2026-08-17 with the shipped quality-stack
defaults, seeds 0/1/2: ate_raw 0.199/0.129/0.110, ate_aligned
0.049/0.052/0.036, f_score 0.848/0.856/0.879, chamfer 0.210/0.208/0.169,
~10 min wall each. Thresholds sit ~1.6x past the WORST seed.

Calibration (measured): disabling the quality stack (support_dist=0,
band_samples=0, bias_correction=false — the round-2 vertical-sink
regression) moves ate_aligned 0.052 -> 0.123 and TRIPS the gate. That is
the class of regression a single-seed 40-frame run can resolve (2x+);
30%-level shifts sit inside the seed noise (0.036-0.052 aligned across
seeds) and are the slow 3-seed median tier's job.
"""

import importlib.util
import os
import statistics

import pytest

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_eval_runner():
    spec = importlib.util.spec_from_file_location(
        "eval_replica", os.path.join(_ROOT, "scripts", "eval_replica.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MICRO_OVERRIDES = [
    "data_specs.n_frames=40",
    "data_specs.n_beams=32",
    "data_specs.n_azimuth=256",
    "tracker_specs.N_rays=512",
    "tracker_specs.num_iterations=12",
    "mapper_specs.N_rays_each=512",
    "mapper_specs.num_iterations=12",
    "tpu_specs.track_samples=48",
    "tpu_specs.map_samples=32",
    "tpu_specs.points_pad=16384",
    "tpu_specs.kf_points_pad=16384",
    "tpu_specs.map_capacity=524288",
    "tpu_specs.active_cap=131072",
    "tpu_specs.touched_cap=131072",
    "tpu_specs.bootstrap_steps=6",
    "tpu_specs.sampler=grid",
]


@pytest.fixture(scope="module")
def replica_run_micro():
    mod = _load_eval_runner()
    return mod.run_eval(
        os.path.join(_ROOT, "configs", "synthetic", "kitti_replica_ci.yaml"),
        MICRO_OVERRIDES + ["data_specs.seed=0"],
        mesh_samples_n=40000,
    )


def test_replica_trajectory_gate(replica_run_micro):
    r = replica_run_micro
    assert r["n_frames"] == 40
    # measured seed 0/1/2: see module docstring; ~1.5-1.8x headroom
    assert r["ate_raw_m"] < MICRO_ATE_RAW_MAX, r
    assert r["ate_aligned_m"] < MICRO_ATE_ALIGNED_MAX, r


def test_replica_mesh_gate(replica_run_micro):
    r = replica_run_micro
    assert r["mesh_verts"] > 60000, r
    assert r["f_score"] > MICRO_F_MIN, r
    assert r["chamfer_l1_m"] < MICRO_CHAMFER_MAX, r


# 60-frame tier: the round-2 fast gate, median of 3 seeds at ~1.5x headroom
# (VERDICT r2 item 8). ~40 min/seed on a 1-core CPU host, ~1 min on the
# real chip — run with NERFLOAM_RUN_SLOW=1. Measured (seed 0, grid,
# 2026-08-17): ate_raw 0.141, ate_aligned 0.055, f_score 0.871,
# chamfer 0.173.
@pytest.fixture(scope="module")
def replica_run_60_seeds():
    mod = _load_eval_runner()
    runs = []
    for seed in (0, 1, 2):
        runs.append(mod.run_eval(
            os.path.join(
                _ROOT, "configs", "synthetic", "kitti_replica_ci.yaml"
            ),
            [
                "data_specs.n_frames=60",
                "data_specs.n_azimuth=384",
                "tracker_specs.N_rays=768",
                "mapper_specs.N_rays_each=768",
                "tpu_specs.sampler=grid",
                f"data_specs.seed={seed}",
            ],
            mesh_samples_n=60000,
        ))
    return runs


@pytest.mark.slow
def test_replica_60frame_median_gate(replica_run_60_seeds):
    med = {
        k: statistics.median(r[k] for r in replica_run_60_seeds)
        for k in ("ate_raw_m", "ate_aligned_m", "f_score", "chamfer_l1_m")
    }
    assert med["ate_raw_m"] < 0.25, (med, replica_run_60_seeds)
    assert med["ate_aligned_m"] < 0.09, (med, replica_run_60_seeds)
    assert med["f_score"] > 0.80, (med, replica_run_60_seeds)
    assert med["chamfer_l1_m"] < 0.26, (med, replica_run_60_seeds)


# Full 120-frame CI budget (EVAL_r02.md baselines with the shipped
# defaults: ate_raw 0.62-0.83, ate_aligned 0.08-0.13, f_score 0.82-0.86).
@pytest.fixture(scope="module")
def replica_run_full():
    mod = _load_eval_runner()
    return mod.run_eval(
        os.path.join(_ROOT, "configs", "synthetic", "kitti_replica_ci.yaml"),
        ["data_specs.n_frames=120"],
        mesh_samples_n=100000,
    )


@pytest.mark.slow
def test_replica_trajectory_gate_full(replica_run_full):
    r = replica_run_full
    assert r["n_frames"] == 120
    assert r["ate_raw_m"] < 2.0, r
    assert r["ate_aligned_m"] < 0.3, r


@pytest.mark.slow
def test_replica_mesh_gate_full(replica_run_full):
    r = replica_run_full
    assert r["mesh_verts"] > 100000, r
    assert r["f_score"] > 0.5, r
    assert r["chamfer_l1_m"] < 0.4, r


# ~1.6x headroom past the worst of seeds 0/1/2 (see module docstring)
MICRO_ATE_RAW_MAX = 0.32       # worst seed 0.199
MICRO_ATE_ALIGNED_MAX = 0.085  # worst seed 0.052
MICRO_F_MIN = 0.76             # worst seed 0.848 (error 0.152 * 1.6)
MICRO_CHAMFER_MAX = 0.32       # worst seed 0.210
