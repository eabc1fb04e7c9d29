"""Device-resident sparse voxel map: unified lattice table + dense local grid.

This is the TPU-native replacement for the reference's pointer-based C++
octree (/root/reference/third_party/sparse_octree/src/octree.cpp) plus its
per-node embedding remap table (src/mapping.py:76, 293-339). Rationale:

  The reference allocates an octree node per lattice point: a directly
  observed voxel is a SURFACE leaf and its 7 other corner octants are
  FEATURE leaves, promoted to SURFACE when directly hit later
  (octree.cpp:68-109). Embedding rows are allocated per corner octant.
  Everything downstream consumes two flat products: per-surface-voxel
  corner indices (N,8) and voxel centers (mapping.py:319-339).

  We keep exactly those semantics but flatten the structure: one row per
  lattice point (= octree corner octant), where the row id IS the embedding
  row. ``is_surface`` marks directly-observed voxels (SURFACE vs FEATURE),
  ``corner_idx`` stores each surface voxel's 8 corner lattice ids
  (corner_idx[v, 0] == v, like the reference where corner 0 is the voxel's
  own octant). There are no pointers and no tree: spatial lookup goes
  through a dense *region-local* grid (cell -> lattice id) rebuilt around
  the sensor each frame by one scatter — every map operation is a
  fixed-shape gather/scatter, which is what the TPU memory system wants.

All functions are pure: they take and return a ``MapState`` pytree and are
jit-compatible with ``MapConfig`` passed statically. Capacity growth is
host-driven (see :func:`grow`): insert saturates safely at capacity, the
host detects it and re-runs the insert on a larger map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.interp import CORNER_OFFSETS


class MapConfig(NamedTuple):
    """Static (hashable) map parameters."""

    capacity: int          # max lattice points (= max embedding rows)
    grid_dim: tuple        # (Dx, Dy, Dz) region grid cells
    voxel_size: float
    feat_dim: int = 16
    emb_dtype: str = "float32"  # "float32" | "bfloat16"
    active_cap: int = 0         # max surface voxels in the per-frame active
    #                               set; 0 -> capacity (small maps / tests)
    support_dist: float = 0.0   # >0: insert_frame also allocates a SUPPORT
    #   voxel this many meters past each measured point (below ground
    #   points, behind wall points) so the negative side of the truncation
    #   band has sampleable voxels. Without it the SDF is unconstrained
    #   past the surface (observed-voxel-only allocation, like the
    #   reference octree), the fitted zero crossing sags away from the
    #   sensor, and tracking inherits a systematic sink (~1 cm/frame
    #   measured on the 500-frame KITTI replica). 0 = reference parity
    support_sym: bool = False   # with support_dist > 0: also allocate the
    #   mirror voxel on the SENSOR side (above ground / in front of walls)
    #   so the positive half of the truncation band is fully sampleable too


class MapState(NamedTuple):
    """Device pytree holding the entire map."""

    lat_coords: jnp.ndarray  # (C, 3) int32 global lattice coords per row
    is_surface: jnp.ndarray  # (C,) bool — directly observed voxel
    corner_idx: jnp.ndarray  # (C, 8) int32 corner lattice ids (surface rows)
    embeddings: jnp.ndarray  # (C, F) learned corner embeddings (zero-init,
    #                          matching mapping.py:305-307)
    num_lat: jnp.ndarray     # () int32 allocated rows
    grid: jnp.ndarray        # (Dx*Dy*Dz,) int32 cell -> lattice id | -1
    region_min: jnp.ndarray  # (3,) int32 lattice coord of grid cell (0,0,0)
    # -- per-frame active surface set (see refresh_active) ------------------
    # TPU rationale: the render hot loop must read one contiguous
    # 8*F=128-lane row per sample (512 B) instead of 8 scattered F=16 rows —
    # measured 26x faster on v5e, and the BA gradient scatter-add gets the
    # same win in reverse. These views are rebuilt once per frame and are
    # NOT checkpointed (derived state).
    active_ids: jnp.ndarray   # (A,) int32 lattice ids of active surface voxels
    n_active: jnp.ndarray     # () int32
    grid_active: jnp.ndarray  # (Dx*Dy*Dz,) int32 cell -> active idx | -1
    packed: jnp.ndarray       # (A, 8*F) corner features packed per voxel
    active_coords: jnp.ndarray  # (A, 3) int32 lattice coords of active voxels
    num_cand: jnp.ndarray = None  # () int32 — new-voxel candidates seen by
    #   the LAST insert; > the insert's cand_cap means candidates were
    #   dropped (host doubles the cap and re-runs, pipeline.check_map_overflow)
    upd_count: jnp.ndarray = None  # (C,) int32 — BA steps that touched each
    #   SURFACE voxel's row (bump_upd_count; keyed by the voxel's own lattice
    #   id, so counts survive recenter/grow). Convergence proxy: freshly
    #   allocated frontier voxels have low counts, settled interior high.
    #   The GN tracker down-weights residual samples in low-count voxels
    #   (TrackParams.maturity_warmup) — the measured along-track drift
    #   driver is the tracker registering against under-converged frontier
    #   voxels ahead of the sensor (EVAL_r04 frontier probe: +0.56 cm/f).


def acap(cfg: MapConfig) -> int:
    """Resolved active-set capacity (0 -> capacity)."""
    return cfg.active_cap if cfg.active_cap > 0 else cfg.capacity


def create(cfg: MapConfig) -> MapState:
    C = cfg.capacity
    A = acap(cfg)
    Dx, Dy, Dz = cfg.grid_dim
    return MapState(
        lat_coords=jnp.zeros((C, 3), jnp.int32),
        is_surface=jnp.zeros((C,), jnp.bool_),
        corner_idx=jnp.full((C, 8), -1, jnp.int32),
        embeddings=jnp.zeros((C, cfg.feat_dim), getattr(jnp, cfg.emb_dtype)),
        num_lat=jnp.zeros((), jnp.int32),
        grid=jnp.full((Dx * Dy * Dz,), -1, jnp.int32),
        region_min=jnp.zeros((3,), jnp.int32),
        active_ids=jnp.zeros((A,), jnp.int32),
        n_active=jnp.zeros((), jnp.int32),
        grid_active=jnp.full((Dx * Dy * Dz,), -1, jnp.int32),
        packed=jnp.zeros((A, 8 * cfg.feat_dim), jnp.float32),
        active_coords=jnp.zeros((A, 3), jnp.int32),
        num_cand=jnp.zeros((), jnp.int32),
        upd_count=jnp.zeros((C,), jnp.int32),
    )


def _flat_cell(rel: jnp.ndarray, grid_dim: tuple) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3) region-relative cells -> flat index + in-bounds mask."""
    Dx, Dy, Dz = grid_dim
    inb = (
        (rel[..., 0] >= 0) & (rel[..., 0] < Dx)
        & (rel[..., 1] >= 0) & (rel[..., 1] < Dy)
        & (rel[..., 2] >= 0) & (rel[..., 2] < Dz)
    )
    flat = (rel[..., 0] * Dy + rel[..., 1]) * Dz + rel[..., 2]
    return flat, inb


def lookup(state: MapState, cfg: MapConfig, coords: jnp.ndarray) -> jnp.ndarray:
    """Lattice ids for integer lattice coords (..., 3); -1 if absent/outside."""
    rel = coords - state.region_min
    flat, inb = _flat_cell(rel, cfg.grid_dim)
    total = int(np.prod(cfg.grid_dim))
    safe = jnp.clip(flat, 0, total - 1)
    lid = state.grid[safe]
    return jnp.where(inb, lid, -1)


def recenter(state: MapState, cfg: MapConfig, center_world: jnp.ndarray) -> MapState:
    """Rebuild the dense grid around a new world-space center.

    One pass over the lattice table: every allocated row whose coords fall
    in the new region is scattered into the fresh grid. Replaces octree
    traversal with a single fixed-shape scatter.
    """
    Dx, Dy, Dz = cfg.grid_dim
    total = Dx * Dy * Dz
    dims = jnp.array([Dx, Dy, Dz], jnp.int32)
    region_min = (
        jnp.floor(center_world / cfg.voxel_size).astype(jnp.int32) - dims // 2
    )
    C = cfg.capacity
    ids = jnp.arange(C, dtype=jnp.int32)
    rel = state.lat_coords - region_min
    flat, inb = _flat_cell(rel, cfg.grid_dim)
    ok = inb & (ids < state.num_lat)
    dest = jnp.where(ok, flat, total)  # out-of-range -> dropped
    grid = jnp.full((total,), -1, jnp.int32).at[dest].set(ids, mode="drop")
    return state._replace(grid=grid, region_min=region_min)


def lookup_active(state: MapState, cfg: MapConfig, coords: jnp.ndarray) -> jnp.ndarray:
    """Active-set indices for integer lattice coords (..., 3); -1 if the cell
    holds no active surface voxel. The active-set analog of :func:`lookup`."""
    rel = coords - state.region_min
    flat, inb = _flat_cell(rel, cfg.grid_dim)
    total = int(np.prod(cfg.grid_dim))
    safe = jnp.clip(flat, 0, total - 1)
    aid = state.grid_active[safe]
    return jnp.where(inb, aid, -1)


def refresh_active(state: MapState, cfg: MapConfig) -> MapState:
    """Rebuild the per-frame active surface set + packed corner table.

    Active = surface voxels inside the current region (the only voxels rays
    can sample this frame). Products:
      - active_ids/active_coords: compacted voxel rows (static ``active_cap``),
      - grid_active: region cell -> active index (sampler lookups),
      - packed: (A, 8F) corner features per active voxel — one contiguous
        512 B row per render sample instead of 8 scattered 64 B rows.

    Runs once per frame (between recenter and BA); amortized over the
    ~50 optimizer iterations that consume it. Replaces the reference's
    per-access map_states repackaging (mapping.py:319-339) which shipped the
    full embedding table through pickle every frame.
    """
    C = cfg.capacity
    A = acap(cfg)
    F = cfg.feat_dim
    total = int(np.prod(cfg.grid_dim))
    ids = jnp.arange(C, dtype=jnp.int32)
    rel = state.lat_coords - state.region_min
    flat, inb = _flat_cell(rel, cfg.grid_dim)
    act = inb & state.is_surface & (ids < state.num_lat)
    rank = jnp.cumsum(act.astype(jnp.int32)) - 1
    keep = act & (rank < A)
    dest = jnp.where(keep, rank, A)
    active_ids = jnp.zeros((A,), jnp.int32).at[dest].set(ids, mode="drop")
    n_active = jnp.sum(act, dtype=jnp.int32)  # true count (may exceed A)
    grid_active = jnp.full((total,), -1, jnp.int32).at[
        jnp.where(keep, flat, total)
    ].set(rank, mode="drop")
    cidx = state.corner_idx[active_ids]                       # (A, 8)
    packed = (
        state.embeddings[jnp.clip(cidx, 0)].astype(jnp.float32).reshape(A, 8 * F)
    )
    active_coords = state.lat_coords[active_ids]
    return state._replace(
        active_ids=active_ids,
        n_active=n_active,
        grid_active=grid_active,
        packed=packed,
        active_coords=active_coords,
    )


def active_overflowed(state: MapState, cfg: MapConfig) -> bool:
    """Host check: did the active set need more rows than active_cap?"""
    return int(state.n_active) > acap(cfg)


def reconcile_packed(
    state: MapState,
    cfg: MapConfig,
    new_packed: jnp.ndarray,   # (A, 8F) optimized packed table
    touched: jnp.ndarray,      # (A,) bool — voxels sampled during the BA step
    touched_cap: int,
    mode: str = "mean",
) -> jnp.ndarray:
    """Fold optimized packed-copy deltas back into canonical embeddings.

    BA optimizes the packed per-voxel corner copies (for the 128-lane
    gather/scatter fast path); a lattice corner shared by k voxels has k
    copies that may diverge during one BA step. Canonical semantics (the
    reference keeps ONE parameter per corner, octree.cpp:68-109 vertex
    sharing) are approximately restored here, once per BA step instead of
    per iteration. Touched voxels are compacted to a static ``touched_cap``
    so the scatter is 8*T rows, not 8*A.

    ``mode`` selects how a corner combines its k copies' deltas:
      - "mean": delta sum divided by the corner's touched multiplicity.
        Closest to the reference's update *magnitude*: Adam normalizes each
        per-copy step to ~lr regardless of gradient size, so summing k
        copies would scale the effective lr by ~k on shared corners.
      - "sum": raw delta sum (total-gradient-flow heuristic; the round-1
        behavior, kept for A/B).
    Neither is exactly one Adam chain per shared corner; the exact path is
    ``exact_embedding_grads`` in core/ba.py.

    Returns the new (C, F) embeddings array.
    """
    C = cfg.capacity
    A = acap(cfg)
    F = cfg.feat_dim
    rank = jnp.cumsum(touched.astype(jnp.int32)) - 1
    keep = touched & (rank < touched_cap)
    dest = jnp.where(keep, rank, touched_cap)
    rows = jnp.arange(A, dtype=jnp.int32)
    t_rows = jnp.zeros((touched_cap,), jnp.int32).at[dest].set(rows, mode="drop")
    t_valid = (
        jnp.zeros((touched_cap,), jnp.bool_).at[dest].set(keep, mode="drop")
    )
    delta = (new_packed[t_rows] - state.packed[t_rows]).reshape(touched_cap, 8, F)
    cids = state.corner_idx[state.active_ids[t_rows]]          # (T, 8)
    cflat = jnp.where(t_valid[:, None], cids, C).reshape(-1)
    if mode == "mean":
        mult = jnp.zeros((C,), jnp.float32).at[cflat].add(1.0, mode="drop")
        delta = delta.reshape(-1, F) / jnp.maximum(mult[jnp.clip(cflat, 0, C - 1)], 1.0)[:, None]
    elif mode == "sum":
        delta = delta.reshape(-1, F)
    else:
        raise ValueError(f"reconcile mode must be 'mean' or 'sum', got {mode!r}")
    emb = state.embeddings.at[cflat].add(
        delta.astype(state.embeddings.dtype), mode="drop"
    )
    return emb


def bump_upd_count(state: MapState, cfg: MapConfig,
                   touched: jnp.ndarray) -> jnp.ndarray:
    """(C,) upd_count with +1 at every ACTIVE voxel row touched this BA step
    (``touched`` is the (A,) mask core/ba.py accumulates from nonzero packed
    gradients). Keyed by lattice id via active_ids; padding rows carry
    touched=False (no gradients flow to them) so no spurious counts."""
    C = cfg.capacity
    dest = jnp.where(touched, state.active_ids, C)
    return state.upd_count.at[dest].add(1, mode="drop")


def pack_embeddings(state: MapState, cfg: MapConfig) -> jnp.ndarray:
    """(A, 8F) packed corner features from the CURRENT embeddings (the
    refresh_active packing step alone — used by the exact-gradient BA path
    and by tests)."""
    A = acap(cfg)
    F = cfg.feat_dim
    cidx = state.corner_idx[state.active_ids]
    return state.embeddings[jnp.clip(cidx, 0)].astype(jnp.float32).reshape(A, 8 * F)


def insert_points(
    state: MapState, cfg: MapConfig, points_world: jnp.ndarray,
    valid: jnp.ndarray, cand_cap: int = 0, append_active: bool = False,
) -> MapState:
    """Allocate voxels (and their corner lattice points) at observed points.

    Semantics match Octree::insert (octree.cpp:51-111): each observed voxel
    becomes SURFACE; its 8 corner lattice points are allocated (FEATURE) if
    absent; an existing FEATURE point directly observed is promoted to
    SURFACE. Points must lie inside the current region (callers recenter
    first); out-of-region points are dropped for this frame.

    ``cand_cap`` (static): when 0 < cand_cap < P, the new-voxel candidate
    set is compacted to cand_cap rows BEFORE the 8-corner allocation pass,
    so the expensive part runs on the (small) per-frame novelty set instead
    of all P input points. This is the single-pass support-voxel insert:
    with support populations the input is 2-3x points_pad but new voxels per
    frame stay far below points_pad. ``num_cand`` reports the true candidate
    count — if it exceeds cand_cap, the over-cap candidates were dropped
    this call and the host must re-run with a larger cap
    (pipeline.check_map_overflow).

    Overflow safety: if capacity is exhausted, new rows are dropped and
    affected voxels are NOT activated (their corner set would be
    incomplete); ``num_lat`` still reports the needed size so the host can
    :func:`grow` the map and re-run the insert.
    """
    P = points_world.shape[0]
    C = cfg.capacity
    total = int(np.prod(cfg.grid_dim))

    vox = jnp.floor(points_world / cfg.voxel_size).astype(jnp.int32)  # (P,3)

    # -- dedup observed voxels: representative election via one grid-sized
    # scatter + gather-back (replaces two stable argsorts; any duplicate may
    # win, we only need ONE candidate slot per cell) ------------------------
    rel = vox - state.region_min
    vflat, vox_inb = _flat_cell(rel, cfg.grid_dim)
    ok = valid & vox_inb
    slot = jnp.arange(P, dtype=jnp.int32)
    winner = jnp.full((total,), -1, jnp.int32).at[
        jnp.where(ok, vflat, total)
    ].set(slot, mode="drop")
    first = ok & (winner[jnp.clip(vflat, 0, total - 1)] == slot)

    lid0 = lookup(state, cfg, vox)
    already_surface = (lid0 >= 0) & state.is_surface[jnp.clip(lid0, 0)]
    cand = first & ~already_surface  # (P,)
    num_cand = jnp.sum(cand, dtype=jnp.int32)

    if cand_cap and cand_cap < P:
        # compact candidates to the static budget; everything below runs
        # on Pc rows instead of P
        Pc = cand_cap
        crank = jnp.cumsum(cand.astype(jnp.int32)) - 1
        keep = cand & (crank < Pc)
        cdest = jnp.where(keep, crank, Pc)
        vox_c = jnp.zeros((Pc, 3), jnp.int32).at[cdest].set(vox, mode="drop")
        cand_c = jnp.zeros((Pc,), jnp.bool_).at[cdest].set(keep, mode="drop")
    else:
        vox_c, cand_c = vox, cand
    Pc = vox_c.shape[0]

    # -- allocate missing corner lattice points (same trick on 8Pc corners) --
    offsets = jnp.asarray(CORNER_OFFSETS)  # (8, 3)
    corners = vox_c[:, None, :] + offsets[None]  # (Pc, 8, 3)
    cflat3 = corners.reshape(-1, 3)              # (8Pc, 3)
    c_rel = cflat3 - state.region_min
    c_flatidx, c_inb = _flat_cell(c_rel, cfg.grid_dim)
    c_lid = lookup(state, cfg, cflat3)
    c_ok = jnp.repeat(cand_c, 8) & c_inb & (c_lid < 0)
    cslot = jnp.arange(8 * Pc, dtype=jnp.int32)
    cwinner = jnp.full((total,), -1, jnp.int32).at[
        jnp.where(c_ok, c_flatidx, total)
    ].set(cslot, mode="drop")
    cnew = c_ok & (cwinner[jnp.clip(c_flatidx, 0, total - 1)] == cslot)

    ranks = jnp.cumsum(cnew.astype(jnp.int32)) - 1
    new_ids = state.num_lat + ranks  # valid where cnew
    fits = new_ids < C

    lat_coords = state.lat_coords.at[
        jnp.where(cnew & fits, new_ids, C)
    ].set(cflat3, mode="drop")
    grid = state.grid.at[
        jnp.where(cnew & fits, c_flatidx, total)
    ].set(jnp.where(fits, new_ids, -1), mode="drop")
    num_lat = state.num_lat + jnp.sum(cnew, dtype=jnp.int32)

    state = state._replace(lat_coords=lat_coords, grid=grid, num_lat=num_lat)

    # -- activate surface voxels with complete corner sets -----------------
    c_lid2 = lookup(state, cfg, corners)  # (Pc, 8) against the updated grid
    complete = jnp.all(c_lid2 >= 0, axis=-1)
    vox_id = c_lid2[:, 0]  # corner 0 == the voxel's own lattice point
    act = cand_c & complete
    dest = jnp.where(act, vox_id, C)
    is_surface = state.is_surface.at[dest].set(True, mode="drop")
    corner_idx = state.corner_idx.at[dest].set(c_lid2, mode="drop")
    state = state._replace(
        is_surface=is_surface, corner_idx=corner_idx, num_cand=num_cand
    )
    if not append_active:
        return state

    # -- incrementally append the newly activated voxels to the per-frame
    # active set (lazy-recenter mode, tpu_specs.recenter_margin > 0): the
    # frontier voxels created this frame must be sampleable by the NEXT
    # frame's tracker without a full refresh_active rebuild. Every activated
    # candidate is new to the set (cand excludes already-surface voxels and
    # refresh/append together cover all in-region surface voxels). Appended
    # rows beyond active_cap are dropped but counted in n_active, so the
    # host's check_active_overflow grows the cap and does a full rebuild.
    A = acap(cfg)
    F = cfg.feat_dim
    arank = jnp.cumsum(act.astype(jnp.int32)) - 1
    pos = state.n_active + arank
    fits = act & (pos < A)
    adest = jnp.where(fits, pos, A)  # A = out of bounds -> dropped
    active_ids = state.active_ids.at[adest].set(vox_id, mode="drop")
    active_coords = state.active_coords.at[adest].set(vox_c, mode="drop")
    vrel = vox_c - state.region_min
    vflat, _ = _flat_cell(vrel, cfg.grid_dim)
    grid_active = state.grid_active.at[
        jnp.where(fits, vflat, total)
    ].set(pos, mode="drop")
    rows = (
        state.embeddings[jnp.clip(c_lid2, 0)].astype(jnp.float32)
        .reshape(Pc, 8 * F)
    )
    packed = state.packed.at[adest].set(rows, mode="drop")
    n_active = state.n_active + jnp.sum(act, dtype=jnp.int32)
    return state._replace(
        active_ids=active_ids,
        active_coords=active_coords,
        grid_active=grid_active,
        packed=packed,
        n_active=n_active,
    )


def grow(state: MapState, cfg: MapConfig, new_capacity: int) -> tuple[MapState, MapConfig]:
    """Host-side capacity growth: copy rows into larger arrays (grid reused)."""
    new_cfg = cfg._replace(capacity=new_capacity)
    C = cfg.capacity
    bigger = create(new_cfg)
    bigger = bigger._replace(
        lat_coords=bigger.lat_coords.at[:C].set(state.lat_coords),
        is_surface=bigger.is_surface.at[:C].set(state.is_surface),
        corner_idx=bigger.corner_idx.at[:C].set(state.corner_idx),
        embeddings=bigger.embeddings.at[:C].set(state.embeddings),
        num_lat=jnp.minimum(state.num_lat, C),
        grid=state.grid,
        region_min=state.region_min,
        # active set: lattice ids survive growth unchanged (active_cap is
        # not grown here), so the per-frame views stay valid until the next
        # refresh_active
        active_ids=state.active_ids,
        n_active=state.n_active,
        grid_active=state.grid_active,
        packed=state.packed,
        active_coords=state.active_coords,
        upd_count=bigger.upd_count.at[:C].set(state.upd_count),
    )
    return bigger, new_cfg


def overflowed(state: MapState, cfg: MapConfig) -> bool:
    """Host check: did the last insert need more rows than capacity?"""
    return int(state.num_lat) > cfg.capacity


def voxel_centers(state: MapState, cfg: MapConfig) -> jnp.ndarray:
    """World centers of ALL lattice rows: (coords + 0.5) * voxel_size.

    Matches (voxels[:, :3] + side/2) * voxel_size with side = 1 for leaves
    (mapping.py:322).
    """
    return (state.lat_coords.astype(jnp.float32) + 0.5) * cfg.voxel_size


def surface_snapshot(state: MapState) -> dict:
    """Host export of surface voxels for meshing/diagnostics (dynamic shapes
    allowed — host side only)."""
    surf = np.array(state.is_surface)  # copy — jax buffers are read-only
    n = int(state.num_lat)
    surf[n:] = False
    idx = np.nonzero(surf)[0]
    return {
        "voxel_ids": idx,
        "coords": np.asarray(state.lat_coords)[idx],
        "corner_idx": np.asarray(state.corner_idx)[idx],
        "num_lat": n,
    }


def recenter_refresh(state: MapState, cfg: MapConfig, center_world: jnp.ndarray) -> MapState:
    """recenter + refresh_active fused into one dispatch (remote-device
    links pay per-dispatch latency; these always run back to back)."""
    return refresh_active(recenter(state, cfg, center_world), cfg)


def maybe_recenter_refresh(
    state: MapState, cfg: MapConfig, center_world: jnp.ndarray, margin: float
) -> MapState:
    """Lazy recenter (tpu_specs.recenter_margin): run the full grid rebuild +
    active refresh + repack only when the sensor moved more than ``margin``
    meters (max-abs over axes) from the current region center. Between
    recenters the region stays fixed and insert_points(append_active=True)
    keeps the active set current incrementally — the rebuild's ~55 ms/frame
    amortizes over margin/frame-step frames. ``margin`` must leave coverage
    slack: region half-extent >= max_depth + margin on every axis."""
    dims = jnp.asarray(cfg.grid_dim, jnp.int32)
    center_cells = state.region_min + dims // 2
    region_center = center_cells.astype(jnp.float32) * cfg.voxel_size
    delta = jnp.max(jnp.abs(center_world - region_center))
    return jax.lax.cond(
        delta > margin,
        lambda s: recenter_refresh(s, cfg, center_world),
        lambda s: s,
        state,
    )


def insert_frame(
    state: MapState,
    cfg: MapConfig,
    points_sensor: jnp.ndarray,  # (P, 3) sensor-frame points
    points_cos: jnp.ndarray,     # (P,) ground-normal cosines (1 = non-ground)
    valid: jnp.ndarray,          # (P,) bool
    pose6: jnp.ndarray,          # (6,)
    cand_cap: int = 0,           # see insert_points (single-pass support insert)
    append_active: bool = False,  # see insert_points (lazy-recenter mode)
) -> MapState:
    """World-transform + insert fused into one dispatch (create_voxels,
    mapping.py:283-291).

    With ``cfg.support_dist > 0`` each measured point also allocates one
    support voxel past the surface: straight DOWN in world frame for ground
    points (cos < 1 — the segmented ground's normal is ~vertical, and the
    grazing ray direction would barely leave the surface voxel), along the
    ray for everything else (walls/structures). One concatenated
    insert_points pass handles both populations; ``cand_cap`` keeps the
    corner-allocation pass at points_pad cost regardless of how many
    support populations are enabled.
    """
    world = se3.transform_points(pose6, points_sensor)
    if cfg.support_dist <= 0:
        return insert_points(state, cfg, world, valid, cand_cap, append_active)
    dirs = points_sensor / (
        jnp.linalg.norm(points_sensor, axis=-1, keepdims=True) + 1e-8
    )
    wdirs = se3.rotate_dirs(pose6, dirs)
    down = jnp.asarray([0.0, 0.0, -1.0], world.dtype)
    off = jnp.where(points_cos[:, None] < 0.999, down[None, :], wdirs)
    pts = [world, world + off * cfg.support_dist]
    if cfg.support_sym:
        pts.append(world - off * cfg.support_dist)
    return insert_points(
        state, cfg,
        jnp.concatenate(pts, axis=0),
        jnp.concatenate([valid] * len(pts), axis=0),
        cand_cap,
        append_active,
    )
