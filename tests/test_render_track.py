"""End-to-end device-program tests: render -> BA optimization -> tracking.

Small synthetic scene on CPU: verifies the fused render step produces valid
samples, bundle adjustment drives the loss down and learns a usable SDF,
and pose tracking recovers a perturbed pose — the core SLAM contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfloam_tpu.core import ba as ba_mod
from nerfloam_tpu.core import tracking as tr_mod
from nerfloam_tpu.core.render import render_rays
from nerfloam_tpu.data import synthetic as syn
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.models.decoder import init_decoder
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import RaycastConfig

VS = 0.5
MAX_DEPTH = 15.0
MAP_CFG = vm.MapConfig(capacity=1 << 15, grid_dim=(96, 96, 32), voxel_size=VS)
RC = RaycastConfig(
    step_world=0.25 * VS, n_slots=int(MAX_DEPTH / (0.25 * VS)) + 1,
    n_samples=32, voxel_size=VS, max_depth=MAX_DEPTH,
)
P_PAD = 4096


@pytest.fixture(scope="module")
def scene():
    world = syn.make_world(seed=3, n_boxes=8, extent=10.0)
    poses = syn.straight_trajectory(5, step=0.4)
    dirs = syn.lidar_dirs(n_beams=24, n_azimuth=240)
    frames = []
    for T in poses:
        pts, cos = syn.render_scan(world, T, dirs, max_depth=MAX_DEPTH, min_depth=1.0)
        frames.append((pts, cos, T))
    return world, frames


def pad_frame(pts, cos, pad=P_PAD):
    n = min(len(pts), pad)
    P = np.zeros((pad, 3), np.float32)
    C = np.ones((pad,), np.float32)
    V = np.zeros((pad,), bool)
    P[:n], C[:n], V[:n] = pts[:n], cos[:n], True
    return jnp.asarray(P), jnp.asarray(C), jnp.asarray(V)


def build_map(frames):
    m = vm.create(MAP_CFG)
    m = vm.recenter(m, MAP_CFG, jnp.zeros(3, jnp.float32))
    for pts, cos, T in frames:
        world_pts = pts @ T[:3, :3].T + T[:3, 3]
        pw, _, v = pad_frame(world_pts.astype(np.float32), cos)
        m = vm.insert_points(m, MAP_CFG, pw, v)
    assert not vm.overflowed(m, MAP_CFG)
    m = vm.refresh_active(m, MAP_CFG)
    return m


def test_render_hits_surface(scene):
    _, frames = scene
    m = build_map(frames)
    params, meta = init_decoder(jax.random.key(0))
    pts, cos, T = frames[0]
    p, c, v = pad_frame(pts, cos)
    pose6 = se3.pose_from_matrix(jnp.asarray(T, jnp.float32))
    dirs = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    wdirs = se3.rotate_dirs(pose6, dirs)
    origins = jnp.broadcast_to(se3.pose_translation(pose6), wdirs.shape)
    t_cap = tr_mod.t_cap_for(p, c, 0.5, MAX_DEPTH)
    out = render_rays(
        m, MAP_CFG, RC, params, meta, origins, wdirs, t_cap, v,
        jax.random.key(1),
    )
    hit_rate = float(jnp.sum(out.ray_mask)) / float(jnp.sum(v))
    assert hit_rate > 0.95  # rays at measured points must touch their voxel
    # each hit ray must have a sample within a voxel diagonal of its depth
    d = jnp.linalg.norm(p, axis=-1)
    close = jnp.any(
        (jnp.abs(out.z_vals - d[:, None]) < VS * 2) & out.valid_mask, axis=-1
    )
    assert float(jnp.sum(close & out.ray_mask)) / float(jnp.sum(out.ray_mask)) > 0.9


def _ba(m, params, meta, frames_subset, iters, key, lrs=(0.05, 0.005, 0.0)):
    W = len(frames_subset)
    bp = ba_mod.BAParams(
        n_frames=W, n_rays=256, num_iterations=iters, truncation=0.5,
        max_depth=MAX_DEPTH, fs_weight=1.0, sdf_weight=1000.0,
    )
    Ps, Cs, Vs, poses = [], [], [], []
    for pts, cos, T in frames_subset:
        p, c, v = pad_frame(pts, cos)
        Ps.append(p); Cs.append(c); Vs.append(v)
        poses.append(se3.pose_from_matrix(jnp.asarray(T, jnp.float32)))
    res = ba_mod.ba_step(
        m, MAP_CFG, RC, bp, params, meta,
        jnp.stack(poses), jnp.stack(Ps), jnp.stack(Cs), jnp.stack(Vs),
        jnp.ones(W, bool), jnp.zeros(W, bool), jnp.asarray(False),
        jnp.asarray(lrs, jnp.float32), key,
    )
    return res


def test_ba_reduces_loss_and_learns_sdf(scene):
    world, frames = scene
    m = build_map(frames)
    params, meta = init_decoder(jax.random.key(0))

    r1 = _ba(m, params, meta, frames[:3], 2, jax.random.key(5))
    m2 = m._replace(embeddings=r1.embeddings, packed=r1.packed)
    r2 = _ba(m2, r1.decoder_params, meta, frames[:3], 60, jax.random.key(6))
    assert float(r2.loss) < float(r1.loss) * 0.5

    # learned SDF should change sign across the ground surface (z=0):
    m3 = vm.refresh_active(m._replace(embeddings=r2.embeddings), MAP_CFG)
    from nerfloam_tpu.core.render import field_at
    probe_above = jnp.asarray([[3.0, 0.0, 0.35]], jnp.float32)
    probe_below = jnp.asarray([[3.0, 0.0, 0.15]], jnp.float32)
    cells = jnp.floor(probe_above / VS).astype(jnp.int32)
    lid_a = vm.lookup_active(m3, MAP_CFG, cells)
    lid_b = vm.lookup_active(m3, MAP_CFG, jnp.floor(probe_below / VS).astype(jnp.int32))
    if int(lid_a[0]) >= 0 and int(lid_b[0]) >= 0:
        sdf_a = float(field_at(m3, MAP_CFG, r2.decoder_params, meta, probe_above, lid_a)[0])
        sdf_b = float(field_at(m3, MAP_CFG, r2.decoder_params, meta, probe_below, lid_b)[0])
        assert sdf_a > sdf_b  # SDF decreases toward/below the surface


def test_tracking_recovers_pose(scene):
    world, frames = scene
    m = build_map(frames)
    params, meta = init_decoder(jax.random.key(0))
    # train the field on frames 0-3
    r = _ba(m, params, meta, frames[:4], 80, jax.random.key(7))
    m = m._replace(embeddings=r.embeddings, packed=r.packed)
    params = r.decoder_params

    pts, cos, T = frames[4]
    p, c, v = pad_frame(pts, cos)
    gt6 = se3.pose_from_matrix(jnp.asarray(T, jnp.float32))
    init6 = gt6 + jnp.asarray([0.15, -0.12, 0.0, 0.0, 0.0, 0.02], jnp.float32)

    tp = tr_mod.TrackParams(
        n_rays=512, num_iterations=60, truncation=0.5, max_depth=MAX_DEPTH,
        fs_weight=1.0, sdf_weight=1000.0,
    )
    res = tr_mod.track_frame(
        m, MAP_CFG, RC, tp, params, meta, init6, p, c, v,
        jnp.asarray(0.01, jnp.float32), jax.random.key(8),
    )
    err_before = float(jnp.linalg.norm(init6[:3] - gt6[:3]))
    err_after = float(jnp.linalg.norm(res.pose[:3] - gt6[:3]))
    assert int(res.hit_count) > 100
    assert err_after < err_before * 0.6, (err_before, err_after)


@pytest.mark.slow  # ~2 min on 1-core CPU: 200-iteration field build
def test_tracking_gn_recovers_pose(scene):
    world, frames = scene
    m = build_map(frames)
    params, meta = init_decoder(jax.random.key(0))
    # LM descends to the FIELD's basin in a handful of iterations, so this
    # test needs a field whose basin is actually at GT: 80 BA iterations
    # leaves it underfit (~0.24 m offset basin — measured), 200 converges
    # (GN lands 0.04 m from GT)
    r = _ba(m, params, meta, frames[:4], 200, jax.random.key(7))
    m = m._replace(embeddings=r.embeddings, packed=r.packed)
    params = r.decoder_params

    pts, cos, T = frames[4]
    p, c, v = pad_frame(pts, cos)
    gt6 = se3.pose_from_matrix(jnp.asarray(T, jnp.float32))
    init6 = gt6 + jnp.asarray([0.15, -0.12, 0.0, 0.0, 0.0, 0.02], jnp.float32)

    tp = tr_mod.TrackParams(
        n_rays=512, num_iterations=4, truncation=0.5, max_depth=MAX_DEPTH,
        fs_weight=1.0, sdf_weight=1000.0,
    )
    res = tr_mod.track_frame_gn(
        m, MAP_CFG, RC, tp, params, meta, init6, p, c, v,
        jnp.asarray(0.01, jnp.float32), jax.random.key(8),
    )
    err_before = float(jnp.linalg.norm(init6[:3] - gt6[:3]))
    err_after = float(jnp.linalg.norm(res.pose[:3] - gt6[:3]))
    assert int(res.hit_count) > 100
    assert err_after < err_before * 0.6, (err_before, err_after)
