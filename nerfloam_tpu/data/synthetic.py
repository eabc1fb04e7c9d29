"""Analytic synthetic LiDAR world: ground plane + axis-aligned boxes.

The reference has no test fixtures at all (SURVEY §4); this module provides
the deterministic scenes our test pyramid and benchmark need: exact
ray-casting (ray/plane + ray/AABB), a spinning-LiDAR scan model, ground
truth poses, and surface samples for mesh F-score evaluation.
Pure numpy — host-side data generation only.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SyntheticWorld(NamedTuple):
    boxes: np.ndarray   # (B, 2, 3) [min; max] corners
    ground_z: float

    def raycast(self, origins: np.ndarray, dirs: np.ndarray, max_depth: float):
        """Exact first-hit depths. origins/dirs (N, 3); returns (depth (N,),
        hit_ground (N,) bool). depth = inf where nothing hit within range."""
        N = origins.shape[0]
        t_best = np.full(N, np.inf)
        is_ground = np.zeros(N, bool)

        dz = dirs[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_g = (self.ground_z - origins[:, 2]) / dz
        ok = (dz < -1e-9) & (t_g > 1e-6)
        t_best = np.where(ok & (t_g < t_best), t_g, t_best)
        is_ground = np.where(ok & (t_g <= t_best), True, False)

        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(dirs) > 1e-12, 1.0 / dirs, 1e12 * np.sign(dirs + 1e-30))
        for box in self.boxes:
            t1 = (box[0][None] - origins) * inv
            t2 = (box[1][None] - origins) * inv
            tmin = np.max(np.minimum(t1, t2), axis=-1)
            tmax = np.min(np.maximum(t1, t2), axis=-1)
            hit = (tmax > np.maximum(tmin, 1e-6)) & (tmin > 1e-6)
            better = hit & (tmin < t_best)
            t_best = np.where(better, tmin, t_best)
            is_ground = np.where(better, False, is_ground)

        t_best = np.where(t_best <= max_depth, t_best, np.inf)
        return t_best, is_ground


def make_world(seed: int = 0, n_boxes: int = 12, extent: float = 30.0) -> SyntheticWorld:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n_boxes, 3))
    centers[:, 2] = 0.0
    sizes = rng.uniform(1.0, 5.0, (n_boxes, 3))
    sizes[:, 2] = rng.uniform(2.0, 6.0, n_boxes)
    mins = centers - sizes / 2
    mins[:, 2] = 0.0
    maxs = centers + sizes / 2
    maxs[:, 2] = sizes[:, 2]
    # keep a corridor along the x axis clear for the trajectory
    keep = (np.abs(centers[:, 1]) > 4.0) | (mins[:, 0] > extent)
    return SyntheticWorld(boxes=np.stack([mins, maxs], 1)[keep], ground_z=0.0)


def lidar_dirs(n_beams: int = 16, n_azimuth: int = 360) -> np.ndarray:
    """Sensor-frame unit directions of a spinning LiDAR (velodyne-like)."""
    elev = np.deg2rad(np.linspace(-20.0, 3.0, n_beams))
    azim = np.linspace(0, 2 * np.pi, n_azimuth, endpoint=False)
    e, a = np.meshgrid(elev, azim, indexing="ij")
    d = np.stack([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)], -1)
    return d.reshape(-1, 3)


def straight_trajectory(n_frames: int, step: float = 0.5, height: float = 1.5,
                        yaw_rate: float = 0.0) -> np.ndarray:
    """GT poses (n, 4, 4): forward motion along +x with optional yaw."""
    poses = []
    x, y, yaw = 0.0, 0.0, 0.0
    for _ in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [x, y, height]
        poses.append(T)
        x += step * c
        y += step * s
        yaw += yaw_rate
    return np.stack(poses)


def render_scan(
    world: SyntheticWorld,
    pose: np.ndarray,
    dirs_sensor: np.ndarray,
    max_depth: float = 40.0,
    min_depth: float = 1.0,
    noise: float = 0.0,
    rng: np.random.Generator | None = None,
):
    """Sensor-frame points + ground-cosine weights for one scan.

    Returns (points (M, 3), cos (M,)) — only rays that hit within range.
    cos for ground returns = |n_ground . dir| (what patchwork++ derived
    normals give the reference, src/dataset/kitti.py:64); 1.0 elsewhere.
    """
    R, t = pose[:3, :3], pose[:3, 3]
    wdirs = dirs_sensor @ R.T
    origins = np.broadcast_to(t, wdirs.shape)
    depth, is_ground = world.raycast(origins, wdirs, max_depth)
    hit = np.isfinite(depth) & (depth > min_depth)
    depth = depth[hit]
    if noise > 0 and rng is not None:
        depth = depth + rng.normal(0, noise, depth.shape)
    pts = dirs_sensor[hit] * depth[:, None]
    cos = np.where(is_ground[hit], np.abs(wdirs[hit, 2]), 1.0)
    return pts.astype(np.float32), cos.astype(np.float32)


def surface_samples(world: SyntheticWorld, n: int = 20000, extent: float = 35.0,
                    seed: int = 1) -> np.ndarray:
    """Uniform samples on the world surface (ground + box faces) for mesh
    accuracy/completeness evaluation (SHINE-mapping-protocol style)."""
    rng = np.random.default_rng(seed)
    pts = [np.stack([rng.uniform(-extent, extent, n // 2),
                     rng.uniform(-extent, extent, n // 2),
                     np.full(n // 2, world.ground_z)], -1)]
    per_box = max(1, (n // 2) // max(len(world.boxes), 1))
    for box in world.boxes:
        size = box[1] - box[0]
        areas = np.array([size[1] * size[2], size[0] * size[2], size[0] * size[1]])
        for axis in range(3):
            k = max(1, int(per_box * areas[axis] / areas.sum() / 2))
            for side in range(2):
                p = rng.uniform(box[0], box[1], (k, 3))
                p[:, axis] = box[side][axis]
                pts.append(p)
    return np.concatenate(pts).astype(np.float32)
