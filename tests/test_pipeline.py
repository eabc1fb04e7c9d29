"""Full-pipeline integration test: track -> map -> mesh on a synthetic
sequence, with trajectory- and mesh-quality assertions plus
checkpoint/resume round-trip. This is the CPU 'fake backend' integration
test SURVEY §4 prescribes."""

import os

import numpy as np
import pytest

from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.utils.config import load_config
from nerfloam_tpu.utils import evaluation as ev

from _canon import CANON

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic",
                        "synthetic_small.yaml")


@pytest.fixture(scope="module")
def slam_run():
    cfg = load_config(CFG_PATH, CANON + [
        "data_specs.n_frames=10",
        "tpu_specs.bootstrap_steps=6",
    ])
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    poses = slam.run()
    return cfg, dataset, slam, poses


def test_trajectory_accuracy(slam_run):
    cfg, dataset, slam, poses = slam_run
    est = np.asarray(poses)
    gt = dataset.gt_trajectory()[: len(est)]
    assert len(est) == 10
    err = ev.ate_rmse(est, gt, align=False)
    # 10 frames x 0.4 m steps with a trained field: should track to dm level
    assert err < 0.30, err


def test_mesh_quality(slam_run):
    cfg, dataset, slam, poses = slam_run
    verts, faces = slam.extract_mesh()
    assert len(verts) > 500
    assert len(faces) > 500
    mesh_samples = ev.sample_mesh_surface(verts, faces, 20000)
    from nerfloam_tpu.data.synthetic import surface_samples

    gt_samples = surface_samples(dataset.world, 20000, extent=12.0)
    # evaluate on the intersection region (crop BOTH sets to within 12 m of
    # the trajectory — the mesh legitimately extends to scan range beyond
    # the cropped GT samples)
    traj = dataset.gt_trajectory()[:10][:, :3, 3]

    def near_traj(p):
        return np.min(np.linalg.norm(p[:, None] - traj[None], axis=-1), axis=1) < 12.0

    m = ev.mesh_metrics(
        mesh_samples[near_traj(mesh_samples)],
        gt_samples[near_traj(gt_samples)],
        f_threshold=0.4,
    )
    assert m["f_score"] > 0.6, m
    assert m["accuracy_m"] < 0.5, m


def test_keyframes_created(slam_run):
    _, _, slam, _ = slam_run
    assert len(slam.state.keyframes) >= 1
    assert slam.state.current_keyframe is not None


def test_checkpoint_roundtrip(slam_run, tmp_path):
    cfg, dataset, slam, poses = slam_run
    from nerfloam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, slam)

    slam2 = NerfLoamSLAM(cfg, dataset)
    load_checkpoint(ckpt, slam2)
    assert int(slam2.state.map_state.num_lat) == int(slam.state.map_state.num_lat)
    np.testing.assert_array_equal(
        np.asarray(slam2.state.map_state.corner_idx),
        np.asarray(slam.state.map_state.corner_idx),
    )
    np.testing.assert_allclose(
        np.asarray(slam2.state.map_state.embeddings),
        np.asarray(slam.state.map_state.embeddings),
    )
    assert len(slam2.state.keyframes) == len(slam.state.keyframes)
    assert slam2.state.frames_processed == slam.state.frames_processed
    # resumed pipeline can keep processing
    idx, pts, cos, pose = dataset[9]
    from nerfloam_tpu.core.frame import Frame

    f = Frame.from_raw(99, pts, cos, None, slam2.points_pad)
    slam2.process_frame(f)


def _frames_for(slam, dataset, ids):
    from nerfloam_tpu.core.frame import Frame

    out = []
    for i in ids:
        idx, pts, cos, pose = dataset[i]
        out.append(Frame.from_raw(idx, pts, cos, None, slam.points_pad))
    return out


def test_resume_bit_stable(tmp_path):
    """Interrupt + resume must replay identically to an uninterrupted run
    (RNG state is checkpointed; VERDICT r1 weak #7)."""
    from nerfloam_tpu.core.frame import Frame, pose6_from_matrix_np
    from nerfloam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = load_config(CFG_PATH, CANON + [
        "data_specs.n_frames=8",
        "tpu_specs.bootstrap_steps=3",
    ])
    dataset = get_dataset(cfg)

    slam = NerfLoamSLAM(cfg, dataset)
    first = _frames_for(slam, dataset, [0])[0]
    first.pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
    slam.process_first_frame(first)
    for f in _frames_for(slam, dataset, range(1, 4)):
        slam.process_frame(f)

    ckpt = str(tmp_path / "ckpt_mid")
    save_checkpoint(ckpt, slam)

    # uninterrupted continuation
    for f in _frames_for(slam, dataset, range(4, 8)):
        slam.process_frame(f)

    # resumed continuation
    slam2 = NerfLoamSLAM(cfg, dataset)
    load_checkpoint(ckpt, slam2)
    for f in _frames_for(slam2, dataset, range(4, 8)):
        slam2.process_frame(f)

    np.testing.assert_array_equal(
        np.asarray(slam.state.last_frame.pose6),
        np.asarray(slam2.state.last_frame.pose6),
    )
    np.testing.assert_array_equal(
        np.asarray(slam.state.map_state.embeddings),
        np.asarray(slam2.state.map_state.embeddings),
    )
    assert int(slam.state.map_state.num_lat) == int(slam2.state.map_state.num_lat)


def test_active_cap_growth_no_render_loss():
    """A too-small active_cap must grow instead of silently truncating the
    renderable surface set (VERDICT r1 missing #4 / ADVICE medium)."""
    from nerfloam_tpu.core.frame import pose6_from_matrix_np
    from nerfloam_tpu.map import voxel_map as vm

    cfg = load_config(CFG_PATH, CANON + [
        "data_specs.n_frames=6",
        "tpu_specs.bootstrap_steps=2",
        "tpu_specs.active_cap=256",  # far below the scene's surface count
        # (non-canonical by design: growth re-jits are this test's point,
        # so it pays for its own compiles)
    ])
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    first = _frames_for(slam, dataset, [0])[0]
    first.pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
    slam.process_first_frame(first)
    for f in _frames_for(slam, dataset, range(1, 6)):
        slam.process_frame(f)
    slam._drain()  # defer_sync: the last frame's overflow handling runs at
    #                fetch; every public exit (run/finalize/ckpt) drains

    assert slam.map_cfg.active_cap > 256  # growth happened
    # every in-region surface voxel is renderable again
    assert int(slam.state.map_state.n_active) <= vm.acap(slam.map_cfg)
    assert not vm.active_overflowed(slam.state.map_state, slam.map_cfg)


def test_touched_overflow_lossless_and_persists(tmp_path):
    """Touched-cap overflow must be LOSSLESS (r5, VERDICT r4 weak #2): the
    overflowed step is rewound and replayed at the grown budget, never
    dropped. A run that starts with a far-too-small reconcile budget must
    therefore produce the SAME map and pose as a run whose budget never
    overflows — touched_cap only changes reconcile compaction padding.
    The grown (now per-step-class) caps must also persist through
    checkpoint/resume so a resume replays growth at the same shapes."""
    from nerfloam_tpu.core.frame import pose6_from_matrix_np
    from nerfloam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    base = CANON + [
        "data_specs.n_frames=6",
        "tpu_specs.bootstrap_steps=2",
    ]

    def run(touched_cap):
        cfg = load_config(
            CFG_PATH, base + [f"tpu_specs.touched_cap={touched_cap}"]
        )
        dataset = get_dataset(cfg)
        slam = NerfLoamSLAM(cfg, dataset)
        first = _frames_for(slam, dataset, [0])[0]
        first.pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
        slam.process_first_frame(first)
        for f in _frames_for(slam, dataset, range(1, 6)):
            slam.process_frame(f)
        slam._drain()  # catch the in-flight frame's overflow handling
        return cfg, dataset, slam

    # 64 is far below one BA step's touched count: every step class
    # (bootstrap "random" via do_mapping, per-frame "current" via the
    # megastep) overflows and must grow+replay
    cfg, dataset, slam = run(64)
    # reference run at the config-default (canonical) budget: never
    # overflows (sanity-checked below), and shares every compile with the
    # other canonical-shape tests in the suite
    _, _, ref = run(16384)

    assert slam.overflow_events["touched"] >= 1
    assert slam.dropped_delta_events == 0
    assert ref.overflow_events["touched"] == 0
    grown = slam.bp_current.touched_cap
    assert grown > 64  # overflow was detected and the budget grew

    # losslessness: grow+replay reproduces the never-overflowed run (same
    # RNG keys are reused by the replay; only compaction padding differs)
    np.testing.assert_allclose(
        np.asarray(slam.state.map_state.embeddings),
        np.asarray(ref.state.map_state.embeddings),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(slam.state.last_frame.pose6),
        np.asarray(ref.state.last_frame.pose6),
        rtol=0, atol=1e-6,
    )

    ckpt = str(tmp_path / "ckpt_tc")
    save_checkpoint(ckpt, slam)
    slam2 = NerfLoamSLAM(cfg, dataset)
    assert slam2.bp_current.touched_cap == 64  # fresh init = config value
    load_checkpoint(ckpt, slam2)
    assert slam2.bp_current.touched_cap == grown
    assert slam2.bp_random.touched_cap == slam.bp_random.touched_cap
    assert slam2.insert_cand_cap == slam.insert_cand_cap


def test_ba_pose_project_along_removes_along_component():
    """tpu_specs.ba_pose_project="along": the applied current-frame BA pose
    refinement has zero along-track component; lat/z pass through; the raw
    (unprojected) delta is what lands in ba_delta_telemetry."""
    from types import SimpleNamespace

    cfg = load_config(CFG_PATH, CANON + ["data_specs.n_frames=2"])
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    slam.ba_pose_project = "along"

    prev6 = np.zeros(6, np.float32)
    tracker6 = np.array([1.0, 0.0, 0.0, 0, 0, 0], np.float32)  # fwd = +x
    ba6 = np.array([1.3, 0.2, -0.1, 0, 0, 0], np.float32)
    frame = SimpleNamespace(index=5, pose6=tracker6)
    mapper = SimpleNamespace(index=5, pose6=ba6.copy())
    slam.state.ba_delta_telemetry = []
    slam._record_ba_delta(frame, mapper, prev6)

    idx, along, lat, dz = slam.state.ba_delta_telemetry[-1]
    assert idx == 5
    # raw delta recorded: +0.3 along (+x), lat = (z x fwd) = +y -> +0.2
    np.testing.assert_allclose([along, lat, dz], [0.3, 0.2, -0.1], atol=1e-6)
    # applied pose: along component removed, lat/z kept
    np.testing.assert_allclose(
        mapper.pose6[:3], [1.0, 0.2, -0.1], atol=1e-5
    )

    # "none" (default) leaves the pose untouched
    slam.ba_pose_project = "none"
    mapper2 = SimpleNamespace(index=6, pose6=ba6.copy())
    slam._record_ba_delta(SimpleNamespace(index=6, pose6=tracker6), mapper2,
                          prev6)
    np.testing.assert_allclose(mapper2.pose6, ba6)

    # degenerate motion (prev == tracker): fwd undefined -> no projection
    slam.ba_pose_project = "along"
    mapper3 = SimpleNamespace(index=7, pose6=ba6.copy())
    slam._record_ba_delta(SimpleNamespace(index=7, pose6=prev6), mapper3,
                          prev6)
    np.testing.assert_allclose(mapper3.pose6, ba6)
