"""Scan-to-scan projective point-to-plane odometry constraint.

A map-independent relative-motion observation added to the GN tracker's
normal equations (tpu_specs.s2s_weight > 0). Motivation (docs/PERF.md,
EVAL_r02/r03): after the vertical-sink fixes the replica's residual drift
is ALONG-TRACK — the SDF map constrains forward motion weakly in
corridor-like scenes (self-similar geometry along the direction of travel)
and any settled field bias integrates into the trajectory. The previous
scan is a bias-free reference for the relative pose.

TPU-first design (no KD-trees, no per-point search loops — the reference
has no scan-to-scan term at all; classic LOAM builds kd-trees per scan):

  - The PREVIOUS scan is rasterized once per frame into a fixed-shape
    spherical range image (scatter-min depth election, the same
    representative-election trick as voxel_map.insert_points), with
    per-pixel world-frame surface points and central-difference normals.
  - Each tracker iteration projects the CURRENT ray subset into the
    previous sensor frame (projective data association: one gather per
    point instead of a nearest-neighbor search), gates by depth agreement,
    and accumulates Huber-weighted point-to-plane residuals
    r = n_w . (p_w(pose) - q_w) into the same 6x6 system as the SDF
    residuals, with the identical left-perturbation Jacobian chain
    J = [n_w, (p_w - t) x n_w].

Everything is fixed-shape and fully batched: build = two scatters + two
rolls, per-iteration cost = one (B*A) gather over N rays. The constraint
composes with the SDF term — it observes frame-to-frame motion, the SDF
term anchors the global map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerfloam_tpu.ops import se3


class Scan2ScanParams(NamedTuple):
    """Static configuration (hashable; part of TrackParams)."""

    weight: float = 0.0      # per-residual weight in the GN system; 0 = off.
    #   The SDF term's Hessian mass is ~1e4-1e5 (131k samples x O(1)
    #   weights); N~2048 s2s residuals at weight w contribute ~2048*w, so
    #   w in the 5-50 range makes the terms comparable. Tuned on the
    #   replica gate.
    n_elev: int = 64         # range-image elevation bins (~beam count)
    n_az: int = 1024         # range-image azimuth bins
    gate_dist: float = 1.0   # drop correspondences with |r| beyond this (m)
    huber: float = 0.2       # Huber transition for the residual (m)
    min_depth: float = 2.0
    max_depth: float = 60.0


class PrevScan(NamedTuple):
    """Rasterized previous scan (world frame), built once per frame."""

    q_w: jnp.ndarray      # (B, A, 3) per-pixel surface point, world frame
    n_w: jnp.ndarray      # (B, A, 3) per-pixel unit normal, world frame
    pix_valid: jnp.ndarray  # (B, A) bool — point AND normal valid
    depth: jnp.ndarray    # (B, A) per-pixel range (prev sensor frame)
    pose6: jnp.ndarray    # (6,) previous frame pose
    elev_min: jnp.ndarray  # () scan elevation span (radians)
    elev_max: jnp.ndarray  # ()


def _angles(pts: jnp.ndarray):
    """(…, 3) sensor-frame points -> (azimuth, elevation, range)."""
    d = jnp.linalg.norm(pts, axis=-1)
    az = jnp.arctan2(pts[..., 1], pts[..., 0])           # [-pi, pi)
    horiz = jnp.linalg.norm(pts[..., :2], axis=-1)
    elev = jnp.arctan2(pts[..., 2], horiz + 1e-12)
    return az, elev, d


def build_prev_scan(
    sp: Scan2ScanParams,
    points: jnp.ndarray,      # (P, 3) previous scan, sensor frame (padded)
    valid: jnp.ndarray,       # (P,) bool
    pose6: jnp.ndarray,       # (6,) previous frame pose
) -> PrevScan:
    """Rasterize the previous scan into a spherical range image.

    Per-pixel surface point = scatter-MEAN of the pixel's points. The mean
    of samples on a plane lies ON the plane, so planar point-to-plane
    residuals are unbiased; a min-depth election was tried first and
    REJECTED — the closest in-pixel point is systematically nearer the
    sensor than the association target on any obliquely-viewed surface
    (measured: a uniform -3..-6 cm residual offset on every surface of the
    corridor test, which a tracker would integrate as drift). Normals by
    central differences over the pixel grid (roll in azimuth — the scan
    wraps — shift+invalidate at the elevation edges), oriented toward the
    sensor.
    """
    B, A = sp.n_elev, sp.n_az
    az, elev, d = _angles(points)
    ok = valid & (d > sp.min_depth) & (d < sp.max_depth)

    # elevation span from the data (KITTI HDL-64E ~[-25, +2] deg; synthetic
    # worlds differ) with a half-bin pad so edge beams stay in range
    big = jnp.asarray(1e9, jnp.float32)
    e_min = jnp.min(jnp.where(ok, elev, big))
    e_max = jnp.max(jnp.where(ok, elev, -big))
    span = jnp.maximum(e_max - e_min, 1e-3)
    bi = jnp.clip(((elev - e_min) / span * (B - 1)).astype(jnp.int32), 0, B - 1)
    ai = jnp.clip(
        ((az + jnp.pi) / (2 * jnp.pi) * A).astype(jnp.int32), 0, A - 1
    )
    pix = bi * A + ai
    total = B * A

    dest = jnp.where(ok, pix, total)
    psum = jnp.zeros((total, 3), jnp.float32).at[dest].add(
        points, mode="drop"
    )
    cnt = jnp.zeros((total,), jnp.float32).at[dest].add(1.0, mode="drop")
    pts3 = psum / jnp.maximum(cnt, 1.0)[:, None]
    has_pt = cnt > 0
    depth = jnp.linalg.norm(pts3, axis=-1)

    P_img = pts3.reshape(B, A, 3)
    V_img = has_pt.reshape(B, A)

    # central-difference normals: azimuth wraps (roll), elevation clamps
    pa1, pa0 = jnp.roll(P_img, -1, axis=1), jnp.roll(P_img, 1, axis=1)
    va1, va0 = jnp.roll(V_img, -1, axis=1), jnp.roll(V_img, 1, axis=1)
    pe1 = jnp.concatenate([P_img[1:], P_img[-1:]], axis=0)
    pe0 = jnp.concatenate([P_img[:1], P_img[:-1]], axis=0)
    ve1 = jnp.concatenate([V_img[1:], jnp.zeros_like(V_img[-1:])], axis=0)
    ve0 = jnp.concatenate([jnp.zeros_like(V_img[:1]), V_img[:-1]], axis=0)
    n = jnp.cross(pa1 - pa0, pe1 - pe0)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-9)
    # orient toward the sensor (sensor-frame origin): n . p <= 0
    n = jnp.where(jnp.sum(n * P_img, axis=-1, keepdims=True) > 0, -n, n)
    n_ok = (
        V_img & va1 & va0 & ve1 & ve0 & (nn[..., 0] > 1e-6)
    )
    # NOTE: no range-discontinuity gate here — adjacent elevation bins on a
    # grazing ground plane legitimately differ by meters of range, so such a
    # gate removes exactly the ground pixels (measured: z convergence error
    # 2.5 cm -> 42 cm on the corridor test). Corner/occlusion pixels are
    # handled by incidence weighting in s2s_system instead.

    # to world frame (fixed for the whole tracking step)
    q_w = se3.transform_points(pose6, P_img.reshape(-1, 3)).reshape(B, A, 3)
    n_w = se3.rotate_dirs(pose6, n.reshape(-1, 3)).reshape(B, A, 3)
    return PrevScan(
        q_w=q_w, n_w=n_w, pix_valid=n_ok,
        depth=depth.reshape(B, A), pose6=pose6,
        elev_min=e_min, elev_max=e_max,
    )


def s2s_system(
    sp: Scan2ScanParams,
    prev: PrevScan,
    pose6: jnp.ndarray,       # (6,) current pose estimate
    pts: jnp.ndarray,         # (N, 3) current ray subset, sensor frame
    rvalid: jnp.ndarray,      # (N,) bool
):
    """Point-to-plane normal-equation contributions at the current pose.

    Returns (H (6,6), b (6,), loss ()) — LOCAL sums; the caller psums them
    alongside the SDF term under dp sharding.
    """
    B, A = sp.n_elev, sp.n_az
    p_w = se3.transform_points(pose6, pts)                       # (N, 3)
    # projective association: current points into the previous sensor frame
    p_prev = se3.inv_transform_points(prev.pose6, p_w)
    az, elev, d = _angles(p_prev)
    span = jnp.maximum(prev.elev_max - prev.elev_min, 1e-3)
    bi_f = (elev - prev.elev_min) / span * (B - 1)
    bi = jnp.clip(bi_f.astype(jnp.int32), 0, B - 1)
    ai = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * A).astype(jnp.int32), 0, A - 1)
    in_img = (
        (bi_f >= -0.5) & (bi_f <= B - 0.5)
        & (d > sp.min_depth) & (d < sp.max_depth)
    )
    pix = bi * A + ai
    q = prev.q_w.reshape(-1, 3)[pix]                             # (N, 3)
    n = prev.n_w.reshape(-1, 3)[pix]
    pv = prev.pix_valid.reshape(-1)[pix]
    pd = prev.depth.reshape(-1)[pix]

    r = jnp.sum(n * (p_w - q), axis=-1)                          # (N,)
    m = (
        rvalid & in_img & pv
        & (jnp.abs(r) < sp.gate_dist)
        & (jnp.abs(d - pd) < 2.0 * sp.gate_dist)
    )
    # Huber IRLS weight (incidence weighting was tried and REJECTED: it
    # de-weights the grazing ground — the very surface that constrains z —
    # and measured z convergence got worse, 2.5 -> 4.9 cm on the corridor
    # test)
    absr = jnp.abs(r)
    w = jnp.where(absr <= sp.huber, 1.0, sp.huber / jnp.maximum(absr, 1e-9))
    w = jnp.where(m, w * sp.weight, 0.0)

    t = se3.pose_translation(pose6)
    J = jnp.concatenate([n, jnp.cross(p_w - t, n)], axis=-1)     # (N, 6)
    Jw = J * w[:, None]
    H = jnp.einsum("ni,nj->ij", Jw, J,
                   precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("ni,n->i", Jw, r,
                   precision=jax.lax.Precision.HIGHEST)
    loss = jnp.sum(w * r * r)
    return H, b, loss
