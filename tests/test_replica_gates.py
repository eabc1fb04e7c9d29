"""KITTI-statistics replica regression gates (VERDICT r2 items 1+8).

Runs the replica config (configs/synthetic/kitti_replica_ci) through the
FULL pipeline — startup ramp, straights, a 90-degree turn — and pins
trajectory + mesh quality. This is the stand-in for real-KITTI parity in a
container without the dataset bits: same scan statistics (spinning-LiDAR
pattern, ~1 m/frame, turns), same protocol (observed-surface GT, clean_mesh
culling, Umeyama-aligned mesh scoring).

Three tiers (round-5 re-fit, VERDICT r4 item 6):
  - gate60 (always runs, THE default gate): 60 frames x 2 seeds at the
    lean budget defined in scripts/calibrate_gate60.py (GATE60 + LEAN —
    single source of truth shared with the calibration script). 60-frame
    horizon because drift-rate regressions integrate with horizon; two
    seeds because round 4 showed single-seed verdicts reverse; lean caps
    because reconcile/pack cost is O(cap) and overflow has been lossless
    since r5 (grow + replay). Both seeds share one set of XLA compiles
    (identical static shapes; only data differs). It also asserts
    dropped_delta_events == 0 at a tier whose touched counts EXCEED the
    auto touched_cap floor (growth events fire) — the CI blind spot that
    let the r4 cap regression ship (VERDICT r4 items 1+2).
    Grid sampler (the hits sampler trades dense FLOPs for gathers, the
    right trade on TPU and the wrong one on CPU; hits/grid equivalence is
    unit-tested in test_hits_sampler.py and A/B'd on-chip, docs/PERF.md).
    The former 40-frame micro gate is retired: it was a strictly weaker
    instrument at a DIFFERENT compile class (so it paid its own ~2-min
    compile on top of ~10 min run), and its horizon was too short for
    the auto touched floor to be exercised.
  - 60-frame tier (@pytest.mark.slow): the round-2 fast gate, heavier
    beam/ray budget, median-of-3-seeds with ~1.5x-headroom thresholds.
  - 120-frame full tier (@pytest.mark.slow): the CI budget; recorded
    full-budget numbers live in EVAL_r02.md.

gate60 calibration (CPU, 2026-08-20, /tmp/gate60_lean.json + EVAL_r05.md):
thresholds sit ~1.6x past the worst clean seed; the injected regression
demonstration is test_gate60_trips_on_injected_regression below, measured
to EXCEED the thresholds it gates on.
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


def _load_gate60_budget():
    """GATE60 + LEAN + VARIANTS from scripts/calibrate_gate60.py — single
    source of truth so the calibration script and the gate can never
    drift apart (the r4 failure mode: profiled one path, shipped another).
    """
    spec = importlib.util.spec_from_file_location(
        "calibrate_gate60", os.path.join(_ROOT, "scripts",
                                         "calibrate_gate60.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.GATE60 + mod.LEAN, mod.VARIANTS


GATE60_SEEDS = (0, 1)

# gate60 thresholds: ~1.6x past the WORST clean seed measured at this
# exact budget (see module docstring; numbers filled from
# /tmp/gate60_lean.json, recorded in EVAL_r05.md).
GATE60_ATE_RAW_MAX = 0.27
GATE60_ATE_ALIGNED_MAX = 0.17
GATE60_F_MIN = 0.70
GATE60_CHAMFER_MAX = 0.37
GATE60_DRIFT_LAT_MAX = 0.45   # cm/f; lat is unsigned so a mean is a rate


@pytest.fixture(scope="module")
def replica_run_gate60():
    budget, _ = _load_gate60_budget()
    mod = _load_eval_runner()
    return [
        mod.run_eval(
            os.path.join(_ROOT, "configs", "synthetic",
                         "kitti_replica_ci.yaml"),
            budget + [f"data_specs.seed={seed}"],
            mesh_samples_n=60000,
        )
        for seed in GATE60_SEEDS
    ]


def test_gate60_trajectory(replica_run_gate60):
    for r in replica_run_gate60:
        assert r["n_frames"] == 60
        assert r["ate_raw_m"] < GATE60_ATE_RAW_MAX, r
        assert r["ate_aligned_m"] < GATE60_ATE_ALIGNED_MAX, r
        assert abs(r["drift_lat_cm_f"]) < GATE60_DRIFT_LAT_MAX, r


def test_gate60_mesh(replica_run_gate60):
    for r in replica_run_gate60:
        assert r["mesh_verts"] > 60000, r
        assert r["f_score"] > GATE60_F_MIN, r
        assert r["chamfer_l1_m"] < GATE60_CHAMFER_MAX, r


def test_gate60_lossless_overflow(replica_run_gate60):
    """The r4 blind spot, closed: this tier's touched counts EXCEED the
    auto touched_cap floor (LEAN sets touched_cap=0 -> auto), so growth
    events fire — and every one must be lossless. A reintroduction of the
    r4 delta-dropping overflow fails HERE, in the default suite, instead
    of shipping (VERDICT r4 items 1+2)."""
    for r in replica_run_gate60:
        assert r["dropped_delta_events"] == 0, r["overflow_events"]
        # the tier must actually exercise the overflow path, or this gate
        # is vacuous — growth events are expected at the auto floor
        assert r["growth_events"] > 0, r["overflow_events"]


@pytest.mark.slow
def test_gate60_trips_on_injected_regression():
    """Demonstrates the gate has teeth (VERDICT r4 item 6 'done ='): the
    round-2 vertical-sink regression class (quality stack off) must
    EXCEED the very thresholds gate60 enforces. Measured at calibration
    (EVAL_r05.md): stackoff lands ~2x+ outside the clean band."""
    budget, variants = _load_gate60_budget()
    mod = _load_eval_runner()
    r = mod.run_eval(
        os.path.join(_ROOT, "configs", "synthetic", "kitti_replica_ci.yaml"),
        budget + variants["stackoff"] + ["data_specs.seed=0"],
        mesh_samples_n=60000,
    )
    tripped = (
        r["ate_raw_m"] >= GATE60_ATE_RAW_MAX
        or r["ate_aligned_m"] >= GATE60_ATE_ALIGNED_MAX
        or r["f_score"] <= GATE60_F_MIN
        or r["chamfer_l1_m"] >= GATE60_CHAMFER_MAX
        or abs(r["drift_lat_cm_f"]) >= GATE60_DRIFT_LAT_MAX
    )
    assert tripped, r


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
