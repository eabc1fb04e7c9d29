"""Ray sampling against the voxel map: jittered-grid stratified sampling.

TPU-native replacement for the reference's two CUDA kernels:
  - octree DFS ray intersection (`svo_intersect_point_kernel`,
    third_party/sparse_voxels/src/intersect_gpu.cu:193-272, wrapped by
    ray_intersect at src/variations/voxel_helpers.py:531-567), and
  - per-segment inverse-CDF sampling (`inverse_cdf_sampling_kernel`,
    sample_gpu.cu:133-239, wrapped by ray_sample at voxel_helpers.py:571-598).

Observation driving the redesign: the reference's composite effect is
*uniform stratified samples at `step_size` spacing restricted to occupied
voxels along the ray* (segment probabilities are proportional to in-voxel
path length and the total step count is total-path / step_size). On TPU we
get the same distribution with one fused, fixed-shape computation:

  1. stratified depths t_k = (k + u_k) * step over the whole ray,
  2. ONE dense-grid gather per sample -> lattice id + surface test,
  3. per-ray stream compaction (cumsum + scatter) to a static sample budget.

No tree traversal, no per-ray stacks, no dynamic shapes. Sample validity
beyond each ray's useful range (measured distance + truncation band) is
masked — those samples are provably loss-neutral in the reference (they land
in its `back_mask` and are excluded from every loss term, criterion.py:73-82).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerfloam_tpu.map import voxel_map as vm


class RaycastConfig(NamedTuple):
    """Static sampling parameters (hashable)."""

    step_world: float   # sample spacing in meters (= step_size * voxel_size)
    n_slots: int        # stratified slots along the ray (ceil(max_depth/step))
    n_samples: int      # static per-ray sample budget after compaction
    voxel_size: float
    max_depth: float
    coarse_step: float = 0.0  # occupancy-march spacing for the inverse-CDF
    #                           sampler; 0 -> voxel_size (midpoint probes at
    #                           voxel pitch; set to voxel_size/2 to also catch
    #                           voxels crossed obliquely by short path
    #                           segments — A/B'd in docs/PERF.md)
    n_coarse: int = 0         # coarse slots; 0 -> ceil(max_depth/coarse_step)
    sampler: str = "grid"     # "grid": per-sample fine grid lookup (round-2
    #   path); "hits": per-step hit table (build_hit_table) + in-register
    #   placement/selection — ~3x fewer random gathers per optimizer
    #   iteration, and the sample distribution matches the reference's
    #   per-voxel-path-length inverse CDF exactly (sample_gpu.cu:133-239)
    max_hits: int = 20        # "hits" sampler: hit-list cap per ray, nearest
    #   first (the reference's hard-coded n_max=20, voxel_helpers.py:533)


def _coarse_shape(rc: RaycastConfig) -> tuple[float, int]:
    step = rc.coarse_step if rc.coarse_step > 0 else rc.voxel_size
    n = rc.n_coarse if rc.n_coarse > 0 else int(-(-rc.max_depth // step))
    return step, n


def march_occupancy(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,   # (R, 3)
    t_cap: jnp.ndarray,    # (R,)
):
    """Pass 1 of the inverse-CDF sampler: coarse occupancy CDF per ray.
    Split out so a tracking step can march once and re-place jittered
    samples every iteration (the pose moves millimeters within one step;
    the fine lookup in pass 2 re-validates every sample against the grid).
    Returns (cdf (R, S), n_occ (R,))."""
    cstep, S = _coarse_shape(rc)
    t_c = (jnp.arange(S, dtype=jnp.float32) + 0.5) * cstep
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_c[None, :, None]
    cells = jnp.floor(pts / rc.voxel_size).astype(jnp.int32)
    lid = vm.lookup_active(state, map_cfg, cells)
    occ = (lid >= 0) & (t_c[None, :] <= t_cap[:, None])
    cdf = jnp.cumsum(occ.astype(jnp.float32), axis=-1)
    return cdf, cdf[:, -1]


def place_samples_cdf(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    cdf: jnp.ndarray,      # (R, S) from march_occupancy
    n_occ: jnp.ndarray,    # (R,)
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_cap: jnp.ndarray,
    key: jax.Array,
    jitter: bool = True,
    u: jnp.ndarray | None = None,
):
    """Pass 2: stratified quantile placement + exact fine-voxel lookup.

    ``u``: optional externally-drawn (R, M) jitter in (0, 1) — the
    multi-chip BA path draws it at GLOBAL ray shape and slices per device
    so any dp reproduces the single-chip sample stream exactly."""
    R, S = cdf.shape
    M = rc.n_samples
    cstep, _ = _coarse_shape(rc)
    ray_mask = n_occ > 0
    if u is None:
        if jitter:
            u = jax.random.uniform(key, (R, M), minval=1e-4, maxval=1.0 - 1e-4)
        else:
            u = jnp.full((R, M), 0.5)
    q = (jnp.arange(M, dtype=jnp.float32)[None, :] + u) / M * n_occ[:, None]
    j = jnp.sum((cdf[:, None, :] < q[:, :, None]).astype(jnp.int32), axis=-1)
    j = jnp.clip(j, 0, S - 1)
    cdf_j = jnp.take_along_axis(cdf, j, axis=-1)
    frac = jnp.clip(q - (cdf_j - 1.0), 0.0, 1.0)
    z = (j.astype(jnp.float32) + frac) * cstep
    fpts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    fcells = jnp.floor(fpts / rc.voxel_size).astype(jnp.int32)
    flid = vm.lookup_active(state, map_cfg, fcells)
    valid = ray_mask[:, None] & (flid >= 0) & (z <= t_cap[:, None])
    return (
        jnp.where(valid, z, 0.0),
        jnp.where(valid, flid, -1),
        valid,
        ray_mask,
    )


class HitTable(NamedTuple):
    """Per-ray voxel hit list with exact AABB segment bounds — the working
    set of the "hits" sampler. Built ONCE per optimizer step (tracking) or
    per BA step (superset rays); every optimizer iteration then places
    samples and resolves their voxels entirely in registers, with the only
    remaining gather being one packed row per HIT (<= max_hits per ray)
    instead of one grid lookup + one packed row per SAMPLE.

    Semantic contract = the reference's ray_intersect output
    (voxel_helpers.py:531-567): up to H hits per ray, sorted by entry
    depth, exact slab-test [t_near, t_far], segments clipped to the ray's
    useful range t_cap."""

    aid: jnp.ndarray      # (R, H) int32 active ids, -1 pad
    t_near: jnp.ndarray   # (R, H) f32 entry depth (>= 0)
    seg: jnp.ndarray      # (R, H) f32 in-voxel path length (clipped, >= 0)
    cdf: jnp.ndarray      # (R, H) f32 cumsum(seg)
    cell: jnp.ndarray     # (R, H, 3) int32 hit voxel lattice cells — used to
    #   RE-RESOLVE samples against the table as the pose moves during the
    #   optimizer loop (resolve_cells_in_hits): the grid sampler re-looks up
    #   every sample's voxel each iteration, and a tracker stepping
    #   centimeters per iteration needs that revalidation or the field
    #   evaluation silently mixes one voxel's corners with another's cell
    ray_mask: jnp.ndarray  # (R,) bool — any hit with positive segment


def build_hit_table(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,   # (R, 3)
    t_cap: jnp.ndarray,    # (R,)
) -> HitTable:
    """March the coarse probes once and compact first-touch voxels into a
    static (R, max_hits) hit list with exact slab bounds.

    The probed cell IS the hit voxel's lattice cell (grid_active maps a
    cell to the voxel at that cell), so the slab test needs no coordinate
    gather — the march's (R, S) grid lookup is the only gather here.
    """
    R = rays_o.shape[0]
    H = rc.max_hits
    cstep, S = _coarse_shape(rc)

    t_c = (jnp.arange(S, dtype=jnp.float32) + 0.5) * cstep
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_c[None, :, None]
    cells = jnp.floor(pts / rc.voxel_size).astype(jnp.int32)
    lid = vm.lookup_active(state, map_cfg, cells)                 # (R, S)
    occ_lid = jnp.where(t_c[None, :] <= t_cap[:, None] + cstep, lid, -1)

    # first probe of each contiguous same-voxel run = one hit (re-entry
    # after a gap counts again, like the DFS emitting the voxel when the
    # ray grazes back in — duplicate slabs are identical and rare)
    prev = jnp.concatenate(
        [jnp.full((R, 1), -2, jnp.int32), occ_lid[:, :-1]], axis=1
    )
    new_hit = (occ_lid >= 0) & (occ_lid != prev)

    pos = jnp.cumsum(new_hit.astype(jnp.int32), axis=-1) - 1
    keep = new_hit & (pos < H)
    dest = jnp.where(keep, pos, H)
    rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, S))
    slot = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (R, S))
    aid = jnp.full((R, H + 1), -1, jnp.int32).at[rows, dest].set(
        occ_lid
    )[:, :H]
    hslot = jnp.zeros((R, H + 1), jnp.int32).at[rows, dest].set(slot)[:, :H]

    # exact slab test at (R, H): hit cell re-derived from the probe point
    # (pure math), AABB = [cell, cell+1] * voxel_size
    ht = (hslot.astype(jnp.float32) + 0.5) * cstep                 # (R, H)
    hpts = rays_o[:, None, :] + rays_d[:, None, :] * ht[..., None]
    hcell = jnp.floor(hpts / rc.voxel_size)                        # (R, H, 3)
    vmin = hcell * rc.voxel_size
    vmax = vmin + rc.voxel_size
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (vmin - rays_o[:, None, :]) * inv_d[:, None, :]
    t1 = (vmax - rays_o[:, None, :]) * inv_d[:, None, :]
    t_near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    t_far = jnp.minimum(
        jnp.min(jnp.maximum(t0, t1), axis=-1), t_cap[:, None]
    )
    seg = jnp.where(aid >= 0, jnp.maximum(t_far - t_near, 0.0), 0.0)
    cdf = jnp.cumsum(seg, axis=-1)
    return HitTable(
        aid, t_near, seg, cdf, hcell.astype(jnp.int32), cdf[:, -1] > 0.0
    )


def pack_hit_table(ht: HitTable) -> jnp.ndarray:
    """(R, 7H) f32 row per ray [aid, t_near, seg, cdf, cell xyz] — ONE
    wide-row gather re-slices a ray subset (BA draws n_rays from the marched
    superset). aid/cells are exact in f32 below 2^24."""
    return jnp.concatenate(
        [
            ht.aid.astype(jnp.float32), ht.t_near, ht.seg, ht.cdf,
            ht.cell.astype(jnp.float32).reshape(ht.cell.shape[:-2] + (-1,)),
        ],
        axis=-1,
    )


def unpack_hit_table(packed: jnp.ndarray) -> HitTable:
    H = packed.shape[-1] // 7
    aid = packed[..., :H].astype(jnp.int32)
    t_near = packed[..., H: 2 * H]
    seg = packed[..., 2 * H: 3 * H]
    cdf = packed[..., 3 * H: 4 * H]
    cell = packed[..., 4 * H:].reshape(packed.shape[:-1] + (H, 3)).astype(
        jnp.int32
    )
    return HitTable(aid, t_near, seg, cdf, cell, cdf[..., -1] > 0.0)


def sample_from_hits(
    ht: HitTable,
    n_samples: int,
    key: jax.Array,
    jitter: bool = True,
    u: jnp.ndarray | None = None,
):
    """Stratified inverse-CDF placement over the hit segments — the exact
    distribution of the reference's inverse_cdf_sampling (samples
    proportional to in-voxel path length, sample_gpu.cu:133-239), computed
    entirely in registers: the hit index per sample comes from a
    compare-count against the (R, H) cdf and every per-sample attribute is
    a one-hot contraction over H. NO gathers.

    Returns (z (R, M), onehot (R, M, H) f32, aid (R, M), valid (R, M),
    ray_mask (R,)).
    """
    R, H = ht.aid.shape
    M = n_samples
    total = ht.cdf[:, -1]
    if u is None:
        if jitter:
            u = jax.random.uniform(key, (R, M), minval=1e-4, maxval=1.0 - 1e-4)
        else:
            u = jnp.full((R, M), 0.5)
    q = (jnp.arange(M, dtype=jnp.float32)[None, :] + u) / M * total[:, None]
    j = jnp.sum((ht.cdf[:, None, :] < q[:, :, None]).astype(jnp.int32), axis=-1)
    j = jnp.clip(j, 0, H - 1)
    onehot_b = (
        jnp.arange(H, dtype=jnp.int32)[None, None, :] == j[..., None]
    )                                                              # (R, M, H)
    onehot = onehot_b.astype(jnp.float32)
    # one stacked contraction for the per-sample segment attributes;
    # HIGHEST precision — default TPU matmul precision rounds the f32
    # operands to bf16, which would corrupt depths
    vals = jnp.stack([ht.cdf, ht.seg, ht.t_near], axis=-1)         # (R, H, 3)
    picked = jnp.einsum(
        "rmh,rhk->rmk", onehot, vals, precision=jax.lax.Precision.HIGHEST
    )
    cdf_j, seg_j, tn_j = picked[..., 0], picked[..., 1], picked[..., 2]
    aid = jnp.max(jnp.where(onehot_b, ht.aid[:, None, :], -1), axis=-1)
    frac = jnp.clip(
        (q - (cdf_j - seg_j)) / jnp.where(seg_j > 0, seg_j, 1.0), 0.0, 1.0
    )
    # shrink away from the exit face so floor(xyz/voxel) stays in the hit
    # voxel (field_at derives the interp cell from the sample position)
    z = tn_j + jnp.clip(frac, 1e-4, 1.0 - 1e-4) * seg_j
    valid = (total > 0)[:, None] & (aid >= 0) & (seg_j > 0)
    return (
        jnp.where(valid, z, 0.0),
        onehot,
        jnp.where(valid, aid, -1),
        valid,
        ht.ray_mask,
    )


def resolve_cells_in_hits(ht: HitTable, cells: jnp.ndarray):
    """Re-resolve sample cells (R, K, 3) against the ray's hit list by CELL
    EQUALITY: onehot (R, K, H) of the hit whose voxel contains the sample's
    current position, its aid, and a found mask.

    This is the in-register equivalent of the grid sampler's per-iteration
    fine lookup: as the pose moves within an optimizer step, a sample that
    drifts into another hit voxel of the same ray re-resolves to it, and one
    that leaves the hit set is invalidated — without this, the field
    evaluation mixes the stale voxel's corners with the new position's cell
    and the tracker's gradient points nowhere (measured: the Adam tracker
    diverges monotonically)."""
    eq = jnp.all(
        cells[:, :, None, :] == ht.cell[:, None, :, :], axis=-1
    ) & (ht.aid[:, None, :] >= 0)                                  # (R, K, H)
    count = jnp.sum(eq.astype(jnp.float32), axis=-1, keepdims=True)
    onehot = eq.astype(jnp.float32) / jnp.maximum(count, 1.0)
    aid = jnp.max(jnp.where(eq, ht.aid[:, None, :], -1), axis=-1)
    found = jnp.any(eq, axis=-1)
    return onehot, jnp.where(found, aid, -1), found


def match_z_in_hits(ht: HitTable, z: jnp.ndarray):
    """Resolve explicit depths (R, K) against the hit list: onehot (R, K, H)
    of the containing segment and its aid; aid = -1 where no segment
    contains z. In-register replacement for a fine grid lookup at depths
    known to lie inside hit voxels."""
    inside = (
        (z[..., None] >= ht.t_near[:, None, :])
        & (z[..., None] < ht.t_near[:, None, :] + ht.seg[:, None, :])
        & (ht.aid[:, None, :] >= 0)
    )                                                              # (R, K, H)
    # a re-entry artifact can list the same voxel twice with identical
    # bounds — normalize so the contraction still selects ONE row's worth
    count = jnp.sum(inside.astype(jnp.float32), axis=-1, keepdims=True)
    onehot = inside.astype(jnp.float32) / jnp.maximum(count, 1.0)
    aid = jnp.max(jnp.where(inside, ht.aid[:, None, :], -1), axis=-1)
    found = jnp.any(inside, axis=-1)
    return onehot, jnp.where(found, aid, -1), found


def sample_rays_cdf(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    rays_o: jnp.ndarray,   # (R, 3) world origins
    rays_d: jnp.ndarray,   # (R, 3) world unit directions
    t_cap: jnp.ndarray,    # (R,) per-ray max useful depth
    key: jax.Array,
    jitter: bool = True,
    u: jnp.ndarray | None = None,
):
    """Inverse-CDF stratified sampling over occupied voxels along each ray.

    Two fixed-shape passes — the exact semantics of the reference's
    ray_intersect + inverse_cdf_sampling chain (voxel_helpers.py:531-598,
    sample_gpu.cu:133-239: samples distributed proportionally to in-voxel
    path length, stratified + jittered), with the octree DFS replaced by a
    coarse occupancy march:

      1. march the ray at ``coarse_step`` spacing (default: voxel_size) and
         mark slots whose voxel is a surface voxel — one (R, S_c) grid gather;
      2. build the per-ray CDF of occupied slots (cumsum) and place the k-th
         sample at stratified quantile q_k = (k + u_k)/M * n_occ via
         searchsorted; the quantile's fractional part positions the sample
         *within* its slot, so the result is exactly inverse-CDF sampling of
         the piecewise-constant occupied-length density.

    Compared to the dense-grid variant (:func:`sample_along_rays`) this does
    ~40% fewer gathers and no (R, S) scatter, and samples are depth-sorted
    by construction. Returns the same contract:
      z (R, M) depths, lattice_id (R, M), valid (R, M), ray_mask (R,).
    """
    cdf, n_occ = march_occupancy(state, map_cfg, rc, rays_o, rays_d, t_cap)
    return place_samples_cdf(
        state, map_cfg, rc, cdf, n_occ, rays_o, rays_d, t_cap, key, jitter, u
    )


def ray_intersect(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    rays_o: jnp.ndarray,   # (R, 3) world origins
    rays_d: jnp.ndarray,   # (R, 3) world unit directions
    max_hits: int = 20,
):
    """Explicit ray/voxel intersection list — the reference's ray_intersect
    contract (voxel_helpers.py:531-567 wrapping svo_intersect_point_kernel,
    intersect_gpu.cu:193-272): up to ``max_hits`` hit voxels per ray, sorted
    by entry depth, with exact AABB entry/exit depths; -1 / +inf padding.

    TPU shape: candidates come from the fixed-shape coarse occupancy march
    (no per-ray DFS stack); each first-touch slot emits one hit whose
    [t_near, t_far] is the exact slab test against that voxel's AABB.
    Returns (active_id (R,H), t_near (R,H), t_far (R,H), hit_mask (R,)).
    """
    R = rays_o.shape[0]
    H = max_hits
    cstep, S = _coarse_shape(rc)

    t_c = (jnp.arange(S, dtype=jnp.float32) + 0.5) * cstep
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_c[None, :, None]
    cells = jnp.floor(pts / rc.voxel_size).astype(jnp.int32)
    lid = vm.lookup_active(state, map_cfg, cells)                 # (R, S)

    # first slot of each contiguous same-voxel run = one hit
    prev = jnp.concatenate([jnp.full((R, 1), -2, jnp.int32), lid[:, :-1]], axis=1)
    new_hit = (lid >= 0) & (lid != prev)

    # exact slab test against the hit voxel's AABB (RayAABBIntersection
    # semantics, intersect_gpu.cu:77-142). The hit voxel's min corner IS
    # the probed cell (grid_active maps a cell to the voxel at that cell),
    # so no coords gather is needed.
    vmin = cells.astype(jnp.float32) * rc.voxel_size
    vmax = vmin + rc.voxel_size
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (vmin - rays_o[:, None, :]) * inv_d[:, None, :]
    t1 = (vmax - rays_o[:, None, :]) * inv_d[:, None, :]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)

    # compact first-touch slots to H leading entries (already depth-ordered)
    pos = jnp.cumsum(new_hit.astype(jnp.int32), axis=-1) - 1
    keep = new_hit & (pos < H)
    dest = jnp.where(keep, pos, H)
    rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, S))
    aid = jnp.full((R, H + 1), -1, jnp.int32).at[rows, dest].set(lid)
    tn = jnp.full((R, H + 1), jnp.inf, jnp.float32).at[rows, dest].set(t_near)
    tf = jnp.full((R, H + 1), jnp.inf, jnp.float32).at[rows, dest].set(t_far)
    hit_mask = jnp.any(new_hit, axis=-1)
    return aid[:, :H], tn[:, :H], tf[:, :H], hit_mask


def ray_sample(
    aid: jnp.ndarray,     # (R, H) hit voxel active ids (-1 pad)
    t_near: jnp.ndarray,  # (R, H)
    t_far: jnp.ndarray,   # (R, H)
    n_samples: int,
    key: jax.Array,
    jitter: bool = True,
):
    """Inverse-CDF sampling over an explicit hit list — the reference's
    ray_sample contract (voxel_helpers.py:571-598 wrapping
    inverse_cdf_sampling_kernel, sample_gpu.cu:133-239): per-ray samples
    distributed proportionally to each hit segment's length, stratified and
    jittered. Returns (z (R, M), active_id (R, M), valid (R, M)).
    """
    R, H = aid.shape
    M = n_samples
    seg = jnp.where(aid >= 0, jnp.maximum(t_far - t_near, 0.0), 0.0)  # (R, H)
    cdf = jnp.cumsum(seg, axis=-1)
    total = cdf[:, -1]
    if jitter:
        u = jax.random.uniform(key, (R, M), minval=1e-4, maxval=1.0 - 1e-4)
    else:
        u = jnp.full((R, M), 0.5)
    q = (jnp.arange(M, dtype=jnp.float32)[None, :] + u) / M * total[:, None]
    j = jnp.sum((cdf[:, None, :] < q[:, :, None]).astype(jnp.int32), axis=-1)
    j = jnp.clip(j, 0, H - 1)
    cdf_j = jnp.take_along_axis(cdf, j, axis=-1)
    seg_j = jnp.take_along_axis(seg, j, axis=-1)
    frac = jnp.clip((q - (cdf_j - seg_j)) / jnp.where(seg_j > 0, seg_j, 1.0), 0, 1)
    tn_j = jnp.take_along_axis(t_near, j, axis=-1)
    z = tn_j + frac * seg_j
    ids = jnp.take_along_axis(aid, j, axis=-1)
    valid = (total[:, None] > 0) & (ids >= 0)
    return jnp.where(valid, z, 0.0), jnp.where(valid, ids, -1), valid


def sample_along_rays(
    state: vm.MapState,
    map_cfg: vm.MapConfig,
    rc: RaycastConfig,
    rays_o: jnp.ndarray,   # (R, 3) world origins
    rays_d: jnp.ndarray,   # (R, 3) world unit directions
    t_cap: jnp.ndarray,    # (R,) per-ray max useful depth
    key: jax.Array,
    jitter: bool = True,
):
    """Stratified occupied-voxel samples with static (R, n_samples) shape.

    Returns (z, lattice_id, valid, ray_mask):
      z          (R, n_samples) sample depths (0 where invalid),
      lattice_id (R, n_samples) surface-voxel lattice ids (-1 invalid),
      valid      (R, n_samples) bool,
      ray_mask   (R,) bool — ray touched at least one surface voxel
                 (the reference's `hits` contract, voxel_helpers.py:560).
    """
    R = rays_o.shape[0]
    S = rc.n_slots
    if jitter:
        u = jax.random.uniform(key, (R, S), minval=0.001, maxval=0.999)
    else:
        u = jnp.full((R, S), 0.5)
    t = (jnp.arange(S, dtype=jnp.float32)[None, :] + u) * rc.step_world  # (R,S)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]  # (R,S,3)
    cells = jnp.floor(pts / rc.voxel_size).astype(jnp.int32)
    lid = vm.lookup_active(state, map_cfg, cells)  # (R,S) active idx | -1
    valid = (lid >= 0) & (t <= t_cap[:, None])
    ray_mask = jnp.any(valid, axis=-1)

    # stream compaction: valid samples of each ray -> leading slots
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    keep = valid & (pos < rc.n_samples)
    dest = jnp.where(keep, pos, rc.n_samples)  # trash column
    rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, S))

    M = rc.n_samples
    z_c = jnp.zeros((R, M + 1), jnp.float32).at[rows, dest].set(t)
    lid_c = jnp.full((R, M + 1), -1, jnp.int32).at[rows, dest].set(lid)
    val_c = jnp.zeros((R, M + 1), jnp.bool_).at[rows, dest].set(keep)
    return z_c[:, :M], lid_c[:, :M], val_c[:, :M], ray_mask
