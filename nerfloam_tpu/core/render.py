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
    HitTable,
    RaycastConfig,
    place_samples_cdf,
    sample_from_hits,
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
    # Voxel center from the sample's own cell — NO coords gather: every
    # caller derives active_id from lookup_active(floor(xyz/vs)), and by
    # grid_active's construction active_coords[aid] == floor(xyz/vs) for
    # valid samples (invalid ones are masked downstream). Saves one
    # (..., 3) random gather per sample on the hot path (~1-2 ms/iter
    # at the KITTI budget; scripts/profile_render.py).
    rows = state.packed[jnp.clip(active_id, 0)]          # (..., 8F) one row each
    return field_from_embs(
        map_cfg, decoder_params, decoder_meta, xyz, rows, compute_dtype
    )


def field_from_embs(
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    xyz: jnp.ndarray,     # (..., 3)
    embs: jnp.ndarray,    # (..., 8F) packed corner rows per sample
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Trilinear interp + decoder on pre-selected packed corner rows; the
    interp cell is the sample's own cell (see field_at)."""
    F = map_cfg.feat_dim
    embs8 = embs.reshape(embs.shape[:-1] + (8, F))
    center = (
        jnp.floor(xyz / map_cfg.voxel_size) + 0.5
    ) * map_cfg.voxel_size
    feats = interp_corner_features(xyz, center, embs8, map_cfg.voxel_size)
    return decoder_apply(decoder_params, decoder_meta, feats, compute_dtype)[..., 0]


def hit_rows(state: vm.MapState, ht: HitTable) -> jnp.ndarray:
    """(R, H, 8F) packed corner rows per HIT — the hits sampler's only
    per-iteration gather (<= max_hits rows per ray instead of one grid
    lookup + one packed row per sample)."""
    return state.packed[jnp.clip(ht.aid, 0)]


def select_rows(onehot: jnp.ndarray, rows_h: jnp.ndarray) -> jnp.ndarray:
    """Distribute per-hit packed rows to samples: (R, M, H) x (R, H, 8F) ->
    (R, M, 8F) one-hot contraction on the MXU. HIGHEST precision: the
    default TPU matmul precision would round the f32 embeddings to bf16
    before the f32 trilinear interp."""
    return jnp.einsum(
        "rmh,rhf->rmf", onehot, rows_h, precision=jax.lax.Precision.HIGHEST
    )


def render_rays_hits(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    decoder_params,
    decoder_meta,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    ht: HitTable,
    ray_valid: jnp.ndarray,
    key: jax.Array,
    compute_dtype=jnp.float32,
    jitter_u=None,
    rows_h: jnp.ndarray | None = None,
) -> RenderOutput:
    """render_rays over a prebuilt HitTable (rc.sampler == "hits"): exact
    per-voxel-path-length inverse-CDF placement + in-register voxel
    resolution. ``rays_o/rays_d`` may reflect a newer pose than the one the
    table was built at (tracking moves millimeters within a step — same
    approximation as the hoisted occupancy march). ``rows_h``: optional
    pre-gathered hit_rows (callers differentiating w.r.t. a packed-table
    variable pass the gather done against that variable)."""
    from nerfloam_tpu.ops.raycast import resolve_cells_in_hits

    z, _, _, pvalid, ray_mask = sample_from_hits(
        ht, rc.n_samples, key, u=jitter_u
    )
    ray_mask = ray_mask & ray_valid
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    # re-resolve every sample's voxel at the CURRENT pose (the table was
    # built at the step's start pose) — see resolve_cells_in_hits
    cells = jnp.floor(xyz / map_cfg.voxel_size).astype(jnp.int32)
    onehot, aid, found = resolve_cells_in_hits(ht, cells)
    valid = pvalid & found & ray_valid[:, None]
    if rows_h is None:
        rows_h = hit_rows(state, ht)
    embs = select_rows(onehot, rows_h)
    sdf = field_from_embs(
        map_cfg, decoder_params, decoder_meta, xyz, embs, compute_dtype
    )
    sdf = jnp.where(valid, sdf, 1.0)
    z_out = jnp.where(valid, z, MAX_DEPTH)
    return RenderOutput(z_out, sdf, ray_mask, valid, xyz)


def band_sample_z(
    key: jax.Array,
    depth: jnp.ndarray,   # (R,) measured sensor distance ||p||
    cos: jnp.ndarray,     # (R,) ground-normal cosine weights
    truncation: float,
    n: int,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(R, n) stratified depths spanning the cosine-widened truncation band.

    The inverse-CDF samples spread over ALL occupied corridor along the ray
    (tens of meters of grazing ground voxels on an outdoor scan), so only a
    few land inside the truncation band — the zero crossing is constrained
    mostly by the free-space side and the fitted surface can sit several cm
    off with a nearly flat along-track pose valley (the ~3 cm/frame drift
    measured on the KITTI replica). Explicit band samples at
    z = d ± truncation/cos · u put guaranteed constraint density on BOTH
    sides of every measured surface point. The reference has no analog (its
    sampler is occupied-voxel-uniform, sample_gpu.cu:133-239); this is a
    deliberate quality improvement, flag-gated by tpu_specs.band_samples.
    """
    if u is None:
        u = jax.random.uniform(key, depth.shape + (n,))
    off = (jnp.arange(n, dtype=jnp.float32) + u) / n * 2.0 - 1.0
    half = truncation / jnp.maximum(cos, 0.05)
    return depth[:, None] + off * half[:, None]


def band_samples(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,   # (R, 3)
    z: jnp.ndarray,        # (R, K) band depths (band_sample_z)
    ray_valid: jnp.ndarray,
    compute_dtype=jnp.float32,
):
    """Evaluate the field at explicit band depths: (z, sdf, valid) columns
    shaped like render_rays output, for concatenation into the band loss."""
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    cells = jnp.floor(xyz / map_cfg.voxel_size).astype(jnp.int32)
    aid = vm.lookup_active(state, map_cfg, cells)
    valid = (aid >= 0) & ray_valid[:, None] & (z > 0)
    sdf = field_at(
        state, map_cfg, decoder_params, decoder_meta, xyz, aid, compute_dtype
    )
    sdf = jnp.where(valid, sdf, 1.0)
    return jnp.where(valid, z, MAX_DEPTH), sdf, valid


def extra_surface_columns(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    origin: jnp.ndarray,    # (R, 3)
    wdirs: jnp.ndarray,     # (R, 3)
    dnorm: jnp.ndarray,     # (R,) measured sensor distance ||p||
    pcos: jnp.ndarray,      # (R,) ground-normal cosines
    ray_valid: jnp.ndarray,
    truncation: float,
    n_anchor: int,
    n_band: int,
    key: jax.Array,
    compute_dtype=jnp.float32,
    band_u: jnp.ndarray | None = None,
):
    """(z, sdf, valid) columns for the anchor + band extra samples, ready to
    concatenate onto a RenderOutput before the band loss. Shared by the Adam
    tracker and BA (the GN tracker builds its own columns — it needs ids,
    not sdf values). ``band_u``: optional externally-drawn (R, n_band)
    jitter (multi-chip BA draws it at global ray shape and slices per
    device, like render_rays' jitter_u)."""
    cols = []
    if n_anchor:
        cols.append(jnp.repeat(dnorm[:, None], n_anchor, axis=1))
    if n_band:
        cols.append(
            band_sample_z(key, dnorm, pcos, truncation, n_band, u=band_u)
        )
    z = jnp.concatenate(cols, axis=1)
    return band_samples(
        state, map_cfg, decoder_params, decoder_meta,
        origin, wdirs, z, ray_valid, compute_dtype,
    )


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
