"""Fused render step: sample -> gather corners -> trilinear interp -> SDF MLP.

Equivalent of the reference ``render_rays`` chain (/root/reference/src/
variations/render_helpers.py:190-318: ray_intersect -> ray_sample ->
get_features -> decoder forward) but as ONE jit-fused graph with static
shapes: no hit-mask host round trips, no CPU embedding-id gather
(render_helpers.py:88), no chunking (XLA tiles the MLP matmuls itself).

Output contract mirrors render_rays' return dict: z_vals (MAX_DEPTH where
invalid), sdf (1.0 where invalid — the reference's ``masked_scatter_ones``
at render_helpers.py:301), ray_mask, valid_mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerfloam_tpu.core.losses import MAX_DEPTH
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.models.decoder import decoder_apply
from nerfloam_tpu.ops.interp import interp_corner_features
from nerfloam_tpu.ops.raycast import (
    RaycastConfig,
    place_samples_cdf,
    sample_rays_cdf,
)


class RenderOutput(NamedTuple):
    z_vals: jnp.ndarray      # (R, M)
    sdf: jnp.ndarray         # (R, M)
    ray_mask: jnp.ndarray    # (R,)
    valid_mask: jnp.ndarray  # (R, M)
    sampled_xyz: jnp.ndarray  # (R, M, 3) world positions (eikonal support)


def field_at(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    xyz: jnp.ndarray,
    active_id: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """SDF at world points (..., 3) inside active surface voxels (...,).

    The feature path of get_features/get_embeddings (render_helpers.py:62-93)
    without the CPU remap table; also serves as the reference's eval_points
    (render_helpers.py:157) — SDF evaluation at arbitrary world points. TPU layout: one contiguous (8*F)=128-lane
    packed row per sample from ``state.packed`` (built by refresh_active) —
    measured ~26x faster on v5e than 8 scattered F=16 corner-row gathers,
    and the BA scatter-add backward gets the same 128-lane win.
    """
    F = map_cfg.feat_dim
    safe = jnp.clip(active_id, 0)
    rows = state.packed[safe]                            # (..., 8F) one row each
    embs = rows.reshape(rows.shape[:-1] + (8, F))        # (..., 8, F)
    center = (
        state.active_coords[safe].astype(jnp.float32) + 0.5
    ) * map_cfg.voxel_size
    feats = interp_corner_features(xyz, center, embs, map_cfg.voxel_size)
    return decoder_apply(decoder_params, decoder_meta, feats, compute_dtype)[..., 0]


def render_rays(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    decoder_params,
    decoder_meta,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_cap: jnp.ndarray,
    ray_valid: jnp.ndarray,
    key: jax.Array,
    compute_dtype=jnp.float32,
    occupancy=None,
    jitter_u=None,
) -> RenderOutput:
    """``occupancy``: optional cached (cdf, n_occ) from
    ops.raycast.march_occupancy — skips the coarse march (used by
    fixed-ray tracking, where the march is hoisted out of the Adam loop).
    ``jitter_u``: optional externally-drawn (R, n_samples) placement jitter
    (multi-chip BA draws it at global shape and slices per device)."""
    if occupancy is None:
        z, lid, valid, ray_mask = sample_rays_cdf(
            state, map_cfg, rc, rays_o, rays_d, t_cap, key, u=jitter_u
        )
    else:
        cdf, n_occ = occupancy
        z, lid, valid, ray_mask = place_samples_cdf(
            state, map_cfg, rc, cdf, n_occ, rays_o, rays_d, t_cap, key,
            u=jitter_u,
        )
    ray_mask = ray_mask & ray_valid
    valid = valid & ray_valid[:, None]

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    sdf = field_at(state, map_cfg, decoder_params, decoder_meta, xyz, lid, compute_dtype)
    sdf = jnp.where(valid, sdf, 1.0)
    z_out = jnp.where(valid, z, MAX_DEPTH)
    return RenderOutput(z_out, sdf, ray_mask, valid, xyz)
