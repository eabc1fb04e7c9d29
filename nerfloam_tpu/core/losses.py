"""SDF training losses.

Equivalent of the reference ``Criterion`` (/root/reference/src/criterion.py):
  - free-space loss: predicted SDF pushed to +1 at samples in front of the
    measured surface (z < d - trunc),
  - truncated SDF loss: (z + sdf * trunc) pushed to the measured distance d
    inside the truncation band,
  - count-balancing weights fs_weight / sdf_weight from the per-batch sample
    counts (criterion.py:67-90),
  - both z and d scaled by the per-point ray/ground-normal cosine
    (criterion.py:34-35) to correct grazing ground returns,
  - optional eikonal loss on the SDF spatial gradient (criterion.py:104-113;
    never enabled by the reference's call sites, supported here for parity).

Static-shape port notes: the reference compacts to hit rays and averages
over all (hit_rays x max_samples) elements including padding. We keep fixed
(R, M) shapes with masks and normalize by |hit rays| * M. The absolute loss
scale therefore differs by a constant factor, which is irrelevant under Adam
(scale-invariant per parameter); the fs/sdf ratio — the quantity that shapes
the field — uses identical count-balancing weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

MAX_DEPTH = 10000.0  # sentinel depth for invalid samples


def sdf_losses(
    z_vals: jnp.ndarray,       # (R, M) sample depths (MAX_DEPTH where invalid)
    sdf: jnp.ndarray,          # (R, M) predicted SDF (1.0 where invalid)
    valid_mask: jnp.ndarray,   # (R, M) bool sample validity
    ray_mask: jnp.ndarray,     # (R,) bool — ray hit at least one voxel
    gt_points: jnp.ndarray,    # (R, 3) sensor-frame measured points
    points_cos: jnp.ndarray,   # (R,) ground-normal cosine weights
    truncation: float,
    max_depth: float,
    fs_weight: float,
    sdf_weight: float,
    axis_name: str | None = None,
    sdf_bias=0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted free-space + truncated-SDF loss. Returns (loss, loss_dict).

    ``axis_name``: when the R rays are sharded over a mesh axis (shard_map),
    every count/sum reduction goes through a psum so each device computes
    the GLOBAL loss — per-device grads are then partial sums whose psum is
    exactly the single-device gradient (core/ba.py multi-chip path).

    ``sdf_bias``: band-target offset, scalar or (R, 1) per-ray — the
    tracker passes the mapped field's measured surface offset
    (BAResult.surface_bias EMA, resolved per ray by ground class) so pose
    optimization targets sdf = bias at measured points instead of 0,
    cancelling the field-fit bias that otherwise integrates into drift.
    Mapping always passes 0 (it DEFINES the offset).
    """
    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    gt_distance = jnp.linalg.norm(gt_points, axis=-1) * points_cos  # (R,)
    z = z_vals * points_cos[:, None]  # (R, M)
    d = gt_distance[:, None]

    valid = valid_mask & ray_mask[:, None]

    front_mask = (z < (d - truncation)) & valid
    back_mask = (z > (d + truncation)) & valid
    depth_ok = (gt_distance > 0.0) & (gt_distance < max_depth)
    sdf_mask = valid & ~front_mask & ~back_mask & depth_ok[:, None]

    num_fs = allsum(jnp.sum(front_mask))
    num_sdf = allsum(jnp.sum(sdf_mask))
    total = jnp.maximum(num_fs + num_sdf, 1).astype(z.dtype)
    fs_count_w = 1.0 - num_fs.astype(z.dtype) / total
    sdf_count_w = 1.0 - num_sdf.astype(z.dtype) / total

    # Normalizer: |hit rays| * M (constant-factor-off from the reference's
    # dynamic (hit_rays x max_len); see module docstring).
    denom = jnp.maximum(
        allsum(jnp.sum(ray_mask)) * z.shape[1], 1
    ).astype(z.dtype)

    fm = front_mask.astype(z.dtype)
    fs_se = jnp.square(sdf * fm - fm)
    fs_loss = (allsum(jnp.sum(fs_se)) / denom) * fs_count_w

    sm = sdf_mask.astype(z.dtype)
    sdf_se = jnp.square((z + (sdf - sdf_bias) * truncation) * sm - d * sm)
    sdf_loss = (allsum(jnp.sum(sdf_se)) / denom) * sdf_count_w

    loss = fs_weight * fs_loss + sdf_weight * sdf_loss
    return loss, {"fs_loss": fs_loss, "sdf_loss": sdf_loss, "loss": loss}


def eikonal_loss(sdf_grad: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """|| |grad sdf| - 1 ||^2 over masked samples (criterion.py:104-113)."""
    norms = jnp.linalg.norm(sdf_grad, axis=-1)
    m = mask.astype(norms.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.square(norms - 1.0) * m) / denom
