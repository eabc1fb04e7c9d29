"""defer_sync (depth-1 dispatch pipeline) equivalence + overflow replay.

defer_sync overlaps the per-frame host fetch with the next frame's device
compute (pipeline._mega_dispatch/_mega_finalize). Semantics: identical
sample streams and optimizer steps; host decisions that consume the fetched
pose (keyframe insertion, bias EMA) lag one frame. With those decision
points quiesced (no keyframe events, bias off) the two modes must produce
near-identical trajectories; with defaults they must stay statistically
equivalent; and the rare detect-grow-retry must replay the in-flight frame
correctly.
"""

import os

import numpy as np
import pytest

from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.utils.config import load_config
from nerfloam_tpu.utils import evaluation as ev

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic",
                        "synthetic_small.yaml")

from _canon import CANON

MICRO = CANON + [
    "data_specs.n_frames=10",
    "tpu_specs.bootstrap_steps=4",
]


def _run(overrides):
    cfg = load_config(CFG_PATH, MICRO + overrides)
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    poses = slam.run()
    return slam, np.asarray(poses), dataset


@pytest.mark.slow
def test_defer_sync_near_exact_when_quiesced():
    """With keyframe events and bias transfer quiesced, defer on/off differ
    only by the device- vs host-computed constant-velocity init (f32 vs f64
    round-off) — trajectories must agree to millimetres.

    Slow-marked (suite re-fit, VERDICT r4 item 6): bias_correction=false is
    a STATIC graph change (BAParams.measure_bias), so this test compiles two
    fresh megasteps — 951 s of the integration tier's 35-minute cold wall.
    The shipped-defaults equivalence + overflow replay below stay in the
    default suite on canonical (cache-shared) graphs."""
    quiet = ["mapper_specs.keyframe_gap=100", "tpu_specs.bias_correction=false"]
    _, p_sync, ds = _run(quiet + ["tpu_specs.defer_sync=false"])
    _, p_defer, _ = _run(quiet + ["tpu_specs.defer_sync=true"])
    assert p_sync.shape == p_defer.shape
    # mutual ATE between the two estimated trajectories
    diff = ev.ate_rmse(p_defer, p_sync, align=False)
    assert diff < 2e-2, diff


def test_defer_sync_defaults_equivalent():
    """Shipped defaults (keyframes inserted mid-run): defer lags the
    keyframe decision one frame, so require statistical equivalence, not
    bitwise."""
    slam_s, p_sync, ds = _run(["tpu_specs.defer_sync=false"])
    slam_d, p_defer, _ = _run(["tpu_specs.defer_sync=true"])
    gt = ds.gt_trajectory()[: len(p_sync)]
    e_sync = ev.ate_rmse(p_sync, gt, align=False)
    e_defer = ev.ate_rmse(p_defer, gt, align=False)
    assert e_sync < 0.30, e_sync
    assert e_defer < 0.30, e_defer
    # telemetry recorded for every tracked frame in both modes
    assert len(slam_d.state.frame_telemetry) == len(slam_s.state.frame_telemetry)
    assert slam_d._inflight is None  # finalize() drained the pipeline


def test_defer_sync_overflow_replay():
    """Capacity growth is detected one frame late under defer_sync; the
    in-flight frame must be replayed against the grown map (pipeline.
    _mega_finalize rewind path)."""
    # active_cap above the first frame's surface count (~2.1k) but below the
    # few-frames-in count (~5k) so the overflow lands MID-RUN, when a newer
    # frame is already in flight (512 would grow during the staged first
    # frame instead, never exercising the rewind)
    tiny = ["tpu_specs.active_cap=4096", "tpu_specs.touched_cap=4096"]
    slam, poses, ds = _run(tiny + ["tpu_specs.defer_sync=true"])
    assert slam.map_cfg.active_cap > 4096  # growth happened mid-run
    assert slam._defer_replays >= 1  # ...detected with a frame in flight
    assert int(slam.state.map_state.num_lat) <= slam.map_cfg.capacity
    gt = ds.gt_trajectory()[: len(poses)]
    err = ev.ate_rmse(np.asarray(poses), gt, align=False)
    assert err < 0.30, err
