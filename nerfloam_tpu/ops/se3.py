"""Differentiable SE(3) pose parameterization.

Equivalent of the reference's ``OptimizablePose`` (/root/reference/src/
se3pose.py:8-92) but in closed form instead of 10-term Taylor series. The
parameterization is the same 6-vector ``[t (3), w (3)]`` where ``t`` is the
raw translation (NOT the se(3) exp-coupled translation) and ``R = exp([w]x)``
via Rodrigues. Gradients flow through both; the small-angle regime uses
series expansions selected with ``jnp.where`` on the *inputs* so gradients
stay finite at theta = 0 (the reference used a global Taylor series for the
same reason; ours is exact outside the switch point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-8  # theta^2 switch point for series branches

# Small geometry matmuls (3x3 rotations applied to points/dirs) must run at
# true f32: the default matmul precision lowers f32 dots to bfloat16 passes
# (on TPU MXU and, in this build, on CPU too), which injects ~1e-3 relative
# error — enough to shift world points by >0.1 m at LiDAR range and corrupt
# voxel assignment. Measured: ATE doubled before this was pinned.
_HI = jax.lax.Precision.HIGHEST


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x for w (..., 3) -> (..., 3, 3)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([O, -w2, w1], axis=-1),
            jnp.stack([w2, O, -w0], axis=-1),
            jnp.stack([-w1, w0, O], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """A = sin(t)/t and B = (1-cos(t))/t^2 with grad-safe small-angle branch."""
    small = theta2 < _SMALL
    # Clamp the value fed to sqrt so the non-taken branch stays finite and
    # differentiable (standard safe-where pattern).
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe_t2)
    a_exact = jnp.sin(theta) / theta
    b_exact = (1.0 - jnp.cos(theta)) / safe_t2
    a_series = 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0
    b_series = 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0
    return jnp.where(small, a_series, a_exact), jnp.where(small, b_series, b_exact)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: exp([w]x) for w (..., 3) -> rotation matrices (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B = _sinc_coeffs(theta2)
    wx = skew(w)
    wx2 = jnp.matmul(wx, wx, precision=_HI)
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * wx + B[..., None, None] * wx2


def log_so3(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Matrix log: rotation (..., 3, 3) -> axis-angle (..., 3).

    Same role as the reference's ``OptimizablePose.log`` (se3pose.py:38-45)
    but via quaternion extraction (Shepperd's method: pick the numerically
    dominant of the four 1 +/- trace combinations) so it stays accurate in
    float32 all the way to theta = pi, where the reference's skew-part
    formula degenerates. Angle returned in [0, pi].
    """
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    r21 = R[..., 2, 1] - R[..., 1, 2]
    r02 = R[..., 0, 2] - R[..., 2, 0]
    r10 = R[..., 1, 0] - R[..., 0, 1]
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    # 4q_i^2 for i in (w, x, y, z); >= 0 up to rounding.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    sw = 2.0 * jnp.sqrt(jnp.maximum(tw, eps))
    sx = 2.0 * jnp.sqrt(jnp.maximum(tx, eps))
    sy = 2.0 * jnp.sqrt(jnp.maximum(ty, eps))
    sz = 2.0 * jnp.sqrt(jnp.maximum(tz, eps))
    # Candidate quaternions (w, x, y, z) from each branch.
    qw = jnp.stack([sw * 0.25, r21 / sw, r02 / sw, r10 / sw], axis=-1)
    qx = jnp.stack([r21 / sx, sx * 0.25, s01 / sx, s02 / sx], axis=-1)
    qy = jnp.stack([r02 / sy, s01 / sy, sy * 0.25, s12 / sy], axis=-1)
    qz = jnp.stack([r10 / sz, s02 / sz, s12 / sz, sz * 0.25], axis=-1)
    ts = jnp.stack([tw, tx, ty, tz], axis=-1)
    idx = jnp.argmax(ts, axis=-1)
    q = jnp.where(
        (idx == 0)[..., None],
        qw,
        jnp.where((idx == 1)[..., None], qx, jnp.where((idx == 2)[..., None], qy, qz)),
    )
    # Canonicalize to q_w >= 0 so theta lands in [0, pi].
    q = q * jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    vec = q[..., 1:4]
    n = jnp.linalg.norm(vec, axis=-1)
    theta = 2.0 * jnp.arctan2(n, q[..., 0])
    # theta/n -> 2/q_w as n -> 0; q_w ~ 1 there.
    small = n < 1e-6
    scale = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, n))
    return vec * scale[..., None]


# --- pose6 = [tx, ty, tz, wx, wy, wz] ------------------------------------


def pose_rotation(p6: jnp.ndarray) -> jnp.ndarray:
    return exp_so3(p6[..., 3:6])


def pose_translation(p6: jnp.ndarray) -> jnp.ndarray:
    return p6[..., 0:3]


def pose_matrix(p6: jnp.ndarray) -> jnp.ndarray:
    """pose6 (..., 6) -> homogeneous transform (..., 4, 4)."""
    R = pose_rotation(p6)
    t = pose_translation(p6)
    batch = p6.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=p6.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def pose_from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform (..., 4, 4) -> pose6 (..., 6)."""
    w = log_so3(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, w], axis=-1)


def transform_points(p6: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points: R @ p + t. pts (..., N, 3) with pose6 (..., 6)."""
    R = pose_rotation(p6)
    t = pose_translation(p6)
    return jnp.matmul(pts, jnp.swapaxes(R, -1, -2), precision=_HI) + t[..., None, :]


def rotate_dirs(p6: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Rotate direction vectors by the pose rotation (no translation)."""
    R = pose_rotation(p6)
    return jnp.matmul(dirs, jnp.swapaxes(R, -1, -2), precision=_HI)


def inv_transform_points(p6: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply the INVERSE pose to points: R^T @ (p - t)."""
    R = pose_rotation(p6)
    t = pose_translation(p6)
    return jnp.matmul(pts - t[..., None, :], R, precision=_HI)


def compose_matrices(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(A, B, precision=_HI)


def invert_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.matmul(Rt, t[..., None], precision=_HI)[..., 0])
    out = out.at[..., 3, 3].set(1.0)
    return out
