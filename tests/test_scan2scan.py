"""Scan-to-scan projective point-to-plane term (core/scan2scan.py).

Geometry checks on analytic scenes, then one GN-convergence check: the
term alone must recover a known relative pose between two renders of the
same world — the property that makes it an along-track drift constraint
(no reference counterpart; classic LOAM solves this with kd-trees, here it
is one rasterization + one gather per iteration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloam_tpu.core.scan2scan import (
    PrevScan,
    Scan2ScanParams,
    build_prev_scan,
    s2s_system,
)

SP = Scan2ScanParams(weight=1.0, n_elev=32, n_az=256, gate_dist=1.0,
                     huber=0.2, min_depth=1.0, max_depth=50.0)


def corridor_scan(rng, n=8000, half_w=6.0, z_floor=-2.0, end_wall=None):
    """Sensor-frame scan of a floor plane + two walls (x along-track).

    ``end_wall``: x of a crossing wall. Without one, translation along x is
    a gauge freedom of the plane set (an infinite corridor) — the pure-s2s
    convergence test needs it; in deployment the SDF term supplies the
    missing directions and s2s supplies the bias-free lateral/vertical/
    rotational observation."""
    n4 = n // 4
    floor = np.stack([
        rng.uniform(-20, 20, n4), rng.uniform(-half_w, half_w, n4),
        np.full(n4, z_floor),
    ], -1)
    wl = np.stack([
        rng.uniform(-20, 20, n4), np.full(n4, -half_w),
        rng.uniform(z_floor, 2.0, n4),
    ], -1)
    wr = np.stack([
        rng.uniform(-20, 20, n4), np.full(n4, half_w),
        rng.uniform(z_floor, 2.0, n4),
    ], -1)
    parts = [floor, wl, wr]
    m = n - 3 * n4
    if end_wall is not None:
        parts.append(np.stack([
            np.full(m, end_wall), rng.uniform(-half_w, half_w, m),
            rng.uniform(z_floor, 2.0, m),
        ], -1))
    pts = np.concatenate(parts).astype(np.float32)
    # LiDAR-like range window: keeps the elevation span bounded (~+-30 deg)
    # the way a real spinning scanner's beam fan is; without it a few
    # near-nadir points stretch the range image's elevation span and
    # degrade its angular resolution
    d = np.linalg.norm(pts, axis=1)
    return pts[(d > 4.0) & (d < 25.0)]


def world_scan_at(world_pts, pose6):
    """World points observed from pose6 (sensor frame)."""
    from nerfloam_tpu.ops import se3

    return np.asarray(se3.inv_transform_points(
        jnp.asarray(pose6), jnp.asarray(world_pts)
    ))


def test_range_image_normals():
    rng = np.random.default_rng(0)
    pts = corridor_scan(rng)
    valid = np.ones(len(pts), bool)
    prev = build_prev_scan(SP, jnp.asarray(pts), jnp.asarray(valid),
                           jnp.zeros(6))
    n = np.asarray(prev.n_w.reshape(-1, 3))
    v = np.asarray(prev.pix_valid.reshape(-1))
    q = np.asarray(prev.q_w.reshape(-1, 3))
    assert v.sum() > 500
    # floor pixels: normal ~ +-z, oriented toward the sensor (up)
    floor = v & (q[:, 2] < -1.5) & (np.abs(q[:, 1]) < 4.0)
    assert floor.sum() > 100
    nz = n[floor, 2]
    assert (nz > 0.9).mean() > 0.8, f"floor normals not up: {nz.mean()}"
    # wall pixels: normal ~ +-y
    wall = v & (np.abs(q[:, 1]) > 5.5) & (q[:, 2] > -1.0)
    if wall.sum() > 50:
        assert (np.abs(n[wall, 1]) > 0.9).mean() > 0.7


def test_residuals_zero_at_true_pose():
    rng = np.random.default_rng(1)
    pts_prev = corridor_scan(rng)
    prev = build_prev_scan(SP, jnp.asarray(pts_prev),
                           jnp.ones(len(pts_prev), dtype=bool), jnp.zeros(6))
    # current frame 1 m along-track; same world surfaces, fresh sampling
    pose_cur = np.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    world = corridor_scan(np.random.default_rng(2))  # pose0 == world frame
    pts_cur = world_scan_at(world, pose_cur)
    rv = jnp.ones(len(pts_cur), dtype=bool)
    H, b, loss = s2s_system(SP, prev, jnp.asarray(pose_cur),
                            jnp.asarray(pts_cur), rv)
    # sum of weights = trace of the translational block (|n| = 1)
    w_sum = float(jnp.trace(H[:3, :3]))
    assert w_sum > 100
    rms = (float(loss) / w_sum) ** 0.5
    # projective association on analytic planes: cm-level residuals at the
    # true pose (range-image quantization), dominated by plane interiors
    assert rms < 0.1, rms
    # ... and strongly discriminative against a lateral offset
    off = np.array([0.0, 0.3, 0.0, 0.0, 0.0, 0.0], np.float32)
    H2, _, loss2 = s2s_system(SP, prev, jnp.asarray(pose_cur + off),
                              jnp.asarray(pts_cur), rv)
    rms2 = (float(loss2) / max(float(jnp.trace(H2[:3, :3])), 1.0)) ** 0.5
    assert rms2 > 3 * rms, (rms, rms2)


def test_gn_recovers_relative_pose():
    rng = np.random.default_rng(3)
    pts_prev = corridor_scan(rng, n=16000, end_wall=18.0)
    prev = build_prev_scan(SP, jnp.asarray(pts_prev),
                           jnp.ones(len(pts_prev), dtype=bool), jnp.zeros(6))
    true_pose = np.array([1.0, 0.05, 0.02, 0.0, 0.0, 0.01], np.float32)
    world = corridor_scan(np.random.default_rng(4), n=16000, end_wall=18.0)
    pts_cur = jnp.asarray(world_scan_at(world, true_pose))
    rv = jnp.ones(pts_cur.shape[0], dtype=bool)

    pose = jnp.asarray(true_pose + np.array(
        [0.3, 0.1, 0.05, 0.0, 0.0, 0.02], np.float32))
    for _ in range(8):
        H, b, _ = s2s_system(SP, prev, pose, pts_cur, rv)
        delta = -jnp.linalg.solve(H + 1e-4 * jnp.eye(6), b)
        pose = pose + delta  # small angles: additive update is fine here
    err = np.abs(np.asarray(pose) - true_pose)
    # end wall observed: all 6 DoF constrained; cm-level convergence from
    # a 30 cm along-track / 10 cm lateral offset
    assert err[0] < 3e-2, err
    assert err[1] < 2e-2 and err[2] < 2e-2, err
    assert err[5] < 2e-3, err


def test_pipeline_s2s_smoke():
    """Full pipeline with the term enabled: runs, tracks, sane ATE."""
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils.config import load_config
    import os

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    from _canon import CANON

    cfg = load_config(
        os.path.join(root, "configs", "synthetic", "synthetic_small.yaml"),
        CANON + ["data_specs.n_frames=8", "debug_args.final_iter=0",
                 "tpu_specs.s2s_weight=10.0", "tpu_specs.s2s_elev=32",
                 "tpu_specs.s2s_az=256"],
    )
    ds = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, ds)
    poses = slam.run()
    assert len(poses) == 8
    gt = ds.gt_trajectory()[: len(poses)]
    err = np.linalg.norm(
        np.asarray(poses)[:, :3, 3] - gt[:, :3, 3], axis=1
    )
    assert err.max() < 1.0, err
