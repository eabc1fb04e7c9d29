"""Host-side frame containers with static-shape padding.

Equivalent of the reference LidarFrame (/root/reference/src/lidarFrame.py)
minus the torch Module machinery and the +2000 m pose offset (lidarFrame.py:
17-18) — poses here live in the true world frame; lattice keys handle
negative coordinates natively (ops/keys.py).

Frames pad their point buffers to a static size so every jitted program
compiles once. Keyframes are box-cropped copies (mapping.py:266-280).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from nerfloam_tpu.ops import se3
import jax.numpy as jnp


def pose6_from_matrix_np(T: np.ndarray) -> np.ndarray:
    """Pure-numpy pose6 from a homogeneous matrix (quaternion log, same math
    as ops/se3.log_so3). Host-side: a jnp round trip here costs a ~27 ms
    device sync per call on remote-device links."""
    R = np.asarray(T, np.float64)[:3, :3]
    K = np.array(
        [
            1 + R[0, 0] + R[1, 1] + R[2, 2],
            1 + R[0, 0] - R[1, 1] - R[2, 2],
            1 - R[0, 0] + R[1, 1] - R[2, 2],
            1 - R[0, 0] - R[1, 1] + R[2, 2],
        ]
    )
    i = int(np.argmax(K))
    s = 2.0 * np.sqrt(max(K[i], 1e-12))
    r21, r02, r10 = R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]
    s01, s02, s12 = R[0, 1] + R[1, 0], R[0, 2] + R[2, 0], R[1, 2] + R[2, 1]
    if i == 0:
        q = np.array([s / 4, r21 / s, r02 / s, r10 / s])
    elif i == 1:
        q = np.array([r21 / s, s / 4, s01 / s, s02 / s])
    elif i == 2:
        q = np.array([r02 / s, s01 / s, s / 4, s12 / s])
    else:
        q = np.array([r10 / s, s02 / s, s12 / s, s / 4])
    if q[0] < 0:
        q = -q
    n = np.linalg.norm(q[1:])
    theta = 2.0 * np.arctan2(n, q[0])
    w = q[1:] * (2.0 if n < 1e-9 else theta / n)
    out = np.empty(6, np.float32)
    out[:3] = np.asarray(T, np.float64)[:3, 3]
    out[3:] = w
    return out


def matrix_from_pose6_np(p6: np.ndarray) -> np.ndarray:
    """Pure-numpy Rodrigues (same math as ops/se3.exp_so3), host-side."""
    p6 = np.asarray(p6, np.float64)
    w = p6[3:6]
    theta2 = float(w @ w)
    if theta2 < 1e-12:
        A = 1.0 - theta2 / 6.0
        B = 0.5 - theta2 / 24.0
    else:
        theta = np.sqrt(theta2)
        A = np.sin(theta) / theta
        B = (1.0 - np.cos(theta)) / theta2
    wx = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], np.float64
    )
    R = np.eye(3) + A * wx + B * (wx @ wx)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.astype(np.float32)
    T[:3, 3] = p6[:3].astype(np.float32)
    return T


@dataclass(eq=False)
class Frame:
    index: int
    points: np.ndarray       # (P, 3) float32, zero-padded
    points_cos: np.ndarray   # (P,) float32
    valid: np.ndarray        # (P,) bool
    n_points: int
    pose6: np.ndarray        # (6,) float32 world pose [t, w]
    rel_pose: np.ndarray | None = None  # (4,4) tracker's frame-to-frame motion
    has_gt_pose: bool = False
    hit_ratio: float = 0.0
    _dev: tuple | None = None  # cached device copies of (points, cos, valid)

    def device_arrays(self):
        """Device copies of the immutable point buffers, uploaded once.

        The reference shipped every frame through pickle twice (tracker ->
        queue -> mapper); here the tracker, BA, and voxel insertion all
        reuse one upload (the host<->device link is the scarce resource).
        """
        if self._dev is None:
            self._dev = (
                jnp.asarray(self.points),
                jnp.asarray(self.points_cos),
                jnp.asarray(self.valid),
            )
        return self._dev

    @classmethod
    def from_raw(
        cls,
        index: int,
        points: np.ndarray,
        cos: np.ndarray,
        pose: np.ndarray | None,
        pad: int,
        has_gt_pose: bool = False,
    ) -> "Frame":
        n = min(len(points), pad)
        if len(points) > pad:  # keep a uniform subset if the scan overflows
            sel = np.random.default_rng(index).choice(len(points), pad, replace=False)
            points, cos = points[sel], cos[sel]
            n = pad
        P = np.zeros((pad, 3), np.float32)
        C = np.ones((pad,), np.float32)
        V = np.zeros((pad,), bool)
        P[:n] = points[:n]
        C[:n] = cos[:n]
        V[:n] = True
        pose6 = (
            pose6_from_matrix_np(pose)
            if pose is not None
            else np.zeros(6, np.float32)
        )
        return cls(index, P, C, V, n, pose6.astype(np.float32), has_gt_pose=has_gt_pose)

    def pose_matrix(self) -> np.ndarray:
        return matrix_from_pose6_np(self.pose6)

    def cropped(self, key_distance: float, pad: int) -> "Frame":
        """Keyframe crop: |x|,|y|,|z| < key_distance + 0.01 in the sensor
        frame (mapping.py:269-276)."""
        vd = key_distance + 0.01
        m = self.valid & np.all(np.abs(self.points) < vd, axis=-1)
        pts = self.points[m]
        cos = self.points_cos[m]
        f = Frame.from_raw(self.index, pts, cos, None, pad)
        f.pose6 = self.pose6.copy()
        f.has_gt_pose = self.has_gt_pose
        return f

    def without_back_points(self, key_distance: float) -> "Frame":
        """remove_back_points (mapping.py:235-255): drop far points opposite
        the motion direction (cos(angle to -motion_xy) >= 0.7 beyond
        key_distance)."""
        if self.rel_pose is None:
            rel_xy = np.array([1.0, 0.0])
        else:
            rel_xy = np.array([self.rel_pose[0, 3], self.rel_pose[1, 3]])
        pts_xy = self.points[:, :2]
        norm = np.linalg.norm(pts_xy, axis=-1) * (np.linalg.norm(rel_xy) + 1e-12)
        cos_back = np.sum(-pts_xy * rel_xy, axis=-1) / np.maximum(norm, 1e-12)
        dist = np.linalg.norm(self.points, axis=-1)
        remove = (cos_back >= 0.7) & (dist > key_distance)
        f = Frame(
            self.index,
            self.points.copy(),
            self.points_cos.copy(),
            self.valid & ~remove,
            int((self.valid & ~remove).sum()),
            self.pose6.copy(),
            self.rel_pose,
            self.has_gt_pose,
        )
        return f
