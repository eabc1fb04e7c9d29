"""Trilinear interpolation of voxel-corner embeddings.

Equivalent of the reference's ``trilinear_interp`` / ``offset_points`` /
``get_embeddings`` chain (/root/reference/src/variations/render_helpers.py:
39-70), fused into one function. Corner ordering follows the reference's
octree corner convention (x slowest, z fastest): corner j sits at offset
((j >> 2) & 1, (j >> 1) & 1, j & 1) in units of voxel size, matching
``incr_x/y/z`` in sparse_octree/src/octree.cpp:12-14.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# (8, 3) corner offsets, reference corner order (octree.cpp:12-14).
CORNER_OFFSETS = np.array(
    [[(j >> 2) & 1, (j >> 1) & 1, j & 1] for j in range(8)], dtype=np.int32
)


def trilinear_weights(p: jnp.ndarray) -> jnp.ndarray:
    """Weights for fractional position p (..., 3) in [0,1]^3 -> (..., 8).

    w_j = prod_axis (p*q_j + (1-p)(1-q_j)) with q_j the corner offset —
    identical formula to render_helpers.py:41.
    """
    q = jnp.asarray(CORNER_OFFSETS, dtype=p.dtype)  # (8, 3)
    pq = p[..., None, :] * q + (1.0 - p[..., None, :]) * (1.0 - q)
    return jnp.prod(pq, axis=-1)


def interp_corner_features(
    sample_xyz: jnp.ndarray,
    voxel_center: jnp.ndarray,
    corner_feats: jnp.ndarray,
    voxel_size: float,
) -> jnp.ndarray:
    """Interpolate (..., 8, F) corner features at world points (..., 3).

    ``voxel_center`` is the world-space center of the sample's voxel;
    p = (x - center)/voxel_size + 0.5 lands in [0,1]^3 for in-voxel points
    (render_helpers.py:65 semantics).
    """
    p = (sample_xyz - voxel_center) / voxel_size + 0.5
    w = trilinear_weights(p)  # (..., 8)
    return jnp.sum(w[..., None] * corner_feats.astype(w.dtype), axis=-2)
