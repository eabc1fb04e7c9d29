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

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic",
                        "synthetic_small.yaml")


@pytest.fixture(scope="module")
def slam_run():
    cfg = load_config(CFG_PATH, [
        "data_specs.n_frames=10",
        "tpu_specs.bootstrap_steps=6",
        "tracker_specs.num_iterations=10",
        "mapper_specs.num_iterations=10",
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
