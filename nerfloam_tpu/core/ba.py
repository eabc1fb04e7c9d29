"""Windowed bundle adjustment: joint embeddings + decoder + keyframe poses.

Equivalent of the reference's bundle_adjust_frames (/root/reference/src/
variations/render_helpers.py:321-425) as one jitted program: the whole
iteration loop (ray resampling per keyframe, world-frame ray assembly,
render, loss, Adam step over three parameter groups) runs in a single
lax.fori_loop dispatch.

Parameter-group semantics match the reference:
  - embeddings at lr[0], decoder at lr[1] (only while update_decoder — the
    freeze_frame logic, mapping.py:196), keyframe poses at lr[2] with the
    anchor keyframe frozen (render_helpers.py:347);
  - a FRESH Adam state per call (the reference constructs a new
    torch.optim.Adam inside every bundle_adjust_frames call);
  - frozen groups are implemented by zeroing their gradients before Adam —
    with fresh per-call state this is exactly equivalent to excluding the
    group from the optimizer.

TPU redesign of the embedding update (measured on v5e): XLA's scatter-add
into (C, 16) corner rows runs at ~10 M rows/s — 2048x64x8 corner gradients
per iteration would cost ~100 ms/iter, dwarfing everything else. Instead BA
optimizes the *packed* per-voxel corner table (A, 8F=128 lanes) built by
refresh_active — its gather AND scatter run ~25x faster because a 512 B row
is a full 128-lane vector — and folds the per-copy deltas back into the
canonical shared-corner table once per BA step (voxel_map.reconcile_packed):
a lattice corner shared by k touched voxels receives the multiplicity-mean
(default) or sum of its k copies' deltas. This is an approximation of the
reference's one-Adam-chain-per-corner update, not an equivalence: within one
BA step copies of a shared corner may diverge, and Adam's per-parameter
normalization means neither combining rule reproduces the exact chain.
``exact_embedding_grads=True`` keeps the reference's exact
single-parameter-per-corner gradients (slow; tests/quality A/B use it to
bound the approximation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerfloam_tpu.core.losses import sdf_losses
from nerfloam_tpu.core.render import field_at, render_rays
from nerfloam_tpu.core.tracking import t_cap_for
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.map.voxel_map import MapConfig, MapState
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import RaycastConfig
from nerfloam_tpu.ops.sampling import sample_ray_indices


class BAParams(NamedTuple):
    """Static BA parameters."""

    n_frames: int        # window_size + 1 (tracked frame slot)
    n_rays: int          # rays per frame per iteration
    num_iterations: int
    truncation: float
    max_depth: float
    fs_weight: float
    sdf_weight: float
    compute_dtype: str = "float32"
    touched_cap: int = 1 << 16   # compaction budget for delta reconciliation
    exact_embedding_grads: bool = False  # reference-exact canonical path
    ray_superset: int = 2        # superset factor for the hoisted occupancy
    #   march: K = ray_superset*n_rays rays are Gumbel-drawn and marched
    #   ONCE per BA step; each iteration trains on a random n_rays subset
    #   with cached CDF rows. 0 = reference-exact per-iteration resampling
    #   + fresh march (render_helpers.py:366-388)
    reconcile_mode: str = "mean"  # shared-corner delta combining (see
    #   voxel_map.reconcile_packed): "mean" | "sum"
    surface_anchor: int = 0  # extra samples per ray AT the measured point
    #   (core/render.extra_surface_columns), repeated this many times as the
    #   anchor's loss weight: pins the SDF zero crossing. Experimental —
    #   not enabled by any shipped config; no recorded A/B. 0 = off
    band_samples: int = 0  # extra stratified samples per ray across the
    #   cosine-widened truncation band around the measured depth
    #   (core/render.band_sample_z); 0 = off
    measure_bias: bool = True  # compute BAResult.surface_bias (a field_at
    #   eval over the full (W, P) keyframe point set). Wired from
    #   tpu_specs.bias_correction: configs that never consume the bias
    #   skip the probe entirely.


class BAResult(NamedTuple):
    embeddings: jnp.ndarray  # (C, F) reconciled canonical table
    packed: jnp.ndarray      # (A, 8F) optimized packed table
    decoder_params: object
    poses: jnp.ndarray       # (W, 6)
    loss: jnp.ndarray
    touched_count: jnp.ndarray  # () int32 — voxels touched this BA step;
    #   > touched_cap means this result's reconcile was truncated: the host
    #   discards it and REPLAYS the step at a grown cap (losslessly) —
    #   pipeline._retry_ba_touched / _mega_finalize
    surface_bias: jnp.ndarray  # () mean field value at the active frames'
    #   measured surface points under the refined poses, on the FINAL
    #   field. The field's fit leaves a systematic offset at surfaces
    #   (capacity/smoothing equilibrium — docs/PERF.md vertical-sink
    #   section); a tracker that targets sdf = 0 displaces the pose by
    #   -offset every frame, which integrates into drift. The pipeline
    #   EMAs this into the NEXT frame's tracking band target (bias
    #   transfer): mapping defines the offset, tracking consumes it.
    #   A per-class (ground vs wall) split was A/B'd and measured WORSE
    #   than the pooled mean on the 500-frame replica (the ground-only
    #   EMA tracks the post-BA overfit transient at training points, not
    #   the settled offset the next tracker sees) — keep the pooled mean.
    upd_count: jnp.ndarray = None  # (C,) int32 per-voxel BA-touch counts
    #   (voxel_map.bump_upd_count) — the tracker's voxel-maturity signal
    #   (TrackParams.maturity_warmup). Applied alongside embeddings/packed.


def _local_cols(x: jnp.ndarray, axis_name: str | None, c: int) -> jnp.ndarray:
    """This device's column block of a globally-drawn (W, n_rays) array.

    Multi-chip ray sharding is global-draw-then-slice: every device draws
    the SAME per-iteration ray indices (replicated key) and trains on its
    own contiguous block, so the union over devices equals the single-chip
    draw exactly — dp only changes float reduction order."""
    if axis_name is None:
        return x
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, i * c, c, axis=1)


def _ba_core(
    axis_name: str | None,
    dp_size: int,
    map_state: MapState,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    bp: BAParams,
    decoder_params,
    decoder_meta,
    poses: jnp.ndarray,         # (W, 6)
    points: jnp.ndarray,        # (W, P, 3) sensor-frame (padded)
    points_cos: jnp.ndarray,    # (W, P)
    points_valid: jnp.ndarray,  # (W, P) bool
    frame_active: jnp.ndarray,  # (W,) bool
    pose_free: jnp.ndarray,     # (W,) bool — optimize this frame's pose
    update_decoder: jnp.ndarray,  # () bool
    lrs: jnp.ndarray,           # (3,) [emb, decoder, pose]
    key: jax.Array,
    proj_dir: jnp.ndarray | None = None,  # (W, 3) unit directions: remove
    #   this component from each frame's pose-translation update every
    #   iteration (degeneracy-aware BA, LOAM solution-remapping lineage —
    #   the field must never co-adapt with a pose shifted along an
    #   unobservable axis, or the shift is baked into the map and inherited
    #   by every later tracked frame). Zero rows = no projection. None =
    #   feature off (no extra compute).
) -> BAResult:
    """BA loop body, single-chip (axis_name=None) or inside shard_map.

    Multi-chip layout (SURVEY §2.3 TPU-native column): map + decoder +
    optimizer state replicated, training rays dp-sharded by column block,
    the coarse occupancy march replicated (once per step; cheap next to the
    iteration loop), loss reductions and parameter gradients psum'd over
    'dp' so every device applies the identical Adam update.
    """
    compute_dtype = jnp.dtype(bp.compute_dtype)
    W = bp.n_frames
    A = vm.acap(map_cfg)
    n_local = bp.n_rays // dp_size
    opt = optax.scale_by_adam()
    use_superset = bp.ray_superset > 0 and not bp.exact_embedding_grads
    # hits sampler (ops/raycast.HitTable): per-step hit table on the
    # superset rays, per-iteration in-register placement + per-hit packed
    # gather. The reference-exact fallbacks (ray_superset=0 /
    # exact_embedding_grads) keep the grid sampler.
    use_hits = use_superset and rc.sampler == "hits"

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    if use_superset:
        # hoisted march: draw a K-ray superset per frame and march its
        # occupancy ONCE (keyframe poses move sub-mm per step at lr_pose
        # ~1e-3; pass 2 re-validates every sample against the grid)
        K = bp.n_rays * bp.ray_superset
        key, k_sup = jax.random.split(key)
        sidx, svalid = jax.vmap(
            lambda k, v: sample_ray_indices(k, v, K)
        )(jax.random.split(k_sup, W), points_valid)         # (W, K)
        sup_pts = jnp.take_along_axis(points, sidx[..., None], axis=1)
        sup_cos = jnp.take_along_axis(points_cos, sidx, axis=1)
        sup_dirs = sup_pts / (
            jnp.linalg.norm(sup_pts, axis=-1, keepdims=True) + 1e-8
        )
        sup_tcap = t_cap_for(sup_pts, sup_cos, bp.truncation, bp.max_depth)
        wdirs0 = jax.vmap(se3.rotate_dirs)(poses, sup_dirs)
        origins0 = jnp.broadcast_to(
            se3.pose_translation(poses)[:, None, :], wdirs0.shape
        )
        from nerfloam_tpu.ops.raycast import (
            build_hit_table,
            march_occupancy,
            pack_hit_table,
            unpack_hit_table,
        )

        flatK = lambda x: x.reshape((W * K,) + x.shape[2:])
        if use_hits:
            ht_sup = build_hit_table(
                map_state, map_cfg, rc, flatK(origins0), flatK(wdirs0),
                flatK(sup_tcap),
            )
            # one (7H)-wide f32 row per ray: the per-iteration subset draw
            # re-slices the table with ONE wide-row gather
            sup_hits = pack_hit_table(ht_sup).reshape(W, K, 7 * rc.max_hits)
        else:
            sup_cdf, sup_nocc = march_occupancy(
                map_state, map_cfg, rc, flatK(origins0), flatK(wdirs0),
                flatK(sup_tcap),
            )
            sup_cdf = sup_cdf.reshape(W, K, -1)
            sup_nocc = sup_nocc.reshape(W, K)

    def loss_fn(opt_params, ridx, rvalid, k):
        emb_like, dec, pos = opt_params
        if bp.exact_embedding_grads:
            # canonical (C, F) params; repack fresh every iteration so the
            # gradient chain matches the reference's shared-corner params
            st = map_state._replace(embeddings=emb_like)
            st = st._replace(packed=vm.pack_embeddings(st, map_cfg))
        else:
            st = map_state._replace(packed=emb_like)
        ht_sub = None
        if use_superset:
            # ridx indexes the superset here
            pts = jnp.take_along_axis(sup_pts, ridx[..., None], axis=1)
            pcos = jnp.take_along_axis(sup_cos, ridx, axis=1)
            dirs = jnp.take_along_axis(sup_dirs, ridx[..., None], axis=1)
            if use_hits:
                occupancy = None
                ht_sub = unpack_hit_table(
                    jnp.take_along_axis(sup_hits, ridx[..., None], axis=1)
                    .reshape((W * n_local, -1))
                )
            else:
                occupancy = (
                    jnp.take_along_axis(sup_cdf, ridx[..., None], axis=1)
                    .reshape((W * n_local, -1)),
                    jnp.take_along_axis(sup_nocc, ridx, axis=1)
                    .reshape((W * n_local,)),
                )
        else:
            pts = jnp.take_along_axis(points, ridx[..., None], axis=1)
            pcos = jnp.take_along_axis(points_cos, ridx, axis=1)
            dirs = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
            occupancy = None
        wdirs = jax.vmap(se3.rotate_dirs)(pos, dirs)                # (W,N,3)
        origins = jnp.broadcast_to(
            se3.pose_translation(pos)[:, None, :], wdirs.shape
        )
        N = n_local
        flat = lambda x: x.reshape((W * N,) + x.shape[2:])
        t_cap = t_cap_for(flat(pts), flat(pcos), bp.truncation, bp.max_depth)
        # placement jitter drawn at GLOBAL ray shape then column-sliced, so
        # the sharded step reproduces the single-chip sample stream exactly
        Ms = rc.n_samples
        u_full = jax.random.uniform(
            k, (W * bp.n_rays, Ms), minval=1e-4, maxval=1.0 - 1e-4
        ).reshape(W, bp.n_rays, Ms)
        u_loc = _local_cols(u_full, axis_name, n_local).reshape(W * N, Ms)
        if use_hits:
            from nerfloam_tpu.core.render import render_rays_hits

            out = render_rays_hits(
                st, map_cfg, rc, dec, decoder_meta,
                flat(origins), flat(wdirs), ht_sub, flat(rvalid), k,
                compute_dtype, jitter_u=u_loc,
            )
        else:
            out = render_rays(
                st, map_cfg, rc, dec, decoder_meta,
                flat(origins), flat(wdirs), t_cap, flat(rvalid), k,
                compute_dtype, occupancy=occupancy, jitter_u=u_loc,
            )
        z_vals, sdf_v, valid_m = out.z_vals, out.sdf, out.valid_mask
        if bp.surface_anchor or bp.band_samples:
            from nerfloam_tpu.core.render import extra_surface_columns

            ub_loc = None
            if bp.band_samples:
                # same global-draw-then-slice as u_full: any dp reproduces
                # the single-chip band jitter exactly
                ub_full = jax.random.uniform(
                    jax.random.fold_in(k, 7), (W, bp.n_rays, bp.band_samples)
                )
                ub_loc = _local_cols(ub_full, axis_name, n_local).reshape(
                    W * N, bp.band_samples
                )
            ez, esdf, eval_ = extra_surface_columns(
                st, map_cfg, dec, decoder_meta, flat(origins), flat(wdirs),
                jnp.linalg.norm(flat(pts), axis=-1), flat(pcos),
                flat(rvalid), bp.truncation, bp.surface_anchor,
                bp.band_samples, jax.random.fold_in(k, 7), compute_dtype,
                band_u=ub_loc,
            )
            z_vals = jnp.concatenate([z_vals, ez], axis=1)
            sdf_v = jnp.concatenate([sdf_v, esdf], axis=1)
            valid_m = jnp.concatenate([valid_m, eval_], axis=1)
        loss, _ = sdf_losses(
            z_vals, sdf_v, valid_m, out.ray_mask,
            flat(pts), flat(pcos), bp.truncation, bp.max_depth,
            bp.fs_weight, bp.sdf_weight, axis_name=axis_name,
        )
        return loss

    emb0 = (
        map_state.embeddings if bp.exact_embedding_grads else map_state.packed
    )
    opt_state0 = opt.init((emb0, decoder_params, poses))
    touched0 = jnp.zeros((A,), jnp.bool_)

    def body(i, carry):
        emb, dec, pos, opt_state, key, touched, _ = carry
        key, k_s, k_r = jax.random.split(key, 3)
        if use_superset:
            K = bp.n_rays * bp.ray_superset
            ridx = jax.random.randint(k_s, (W, bp.n_rays), 0, K)
            rvalid = jnp.take_along_axis(svalid, ridx, axis=1)
        else:
            ridx, rvalid = jax.vmap(
                lambda k, v: sample_ray_indices(k, v, bp.n_rays)
            )(jax.random.split(k_s, W), points_valid)
        rvalid = rvalid & frame_active[:, None]
        # multi-chip: this device trains on its column block of the global
        # draw (identity when axis_name is None)
        ridx = _local_cols(ridx, axis_name, n_local)
        rvalid = _local_cols(rvalid, axis_name, n_local)

        loss, grads = jax.value_and_grad(loss_fn)((emb, dec, pos), ridx, rvalid, k_r)
        # Under shard_map(check_vma=False) the psum inside sdf_losses
        # transposes to a psum, so each device's grad already carries a
        # factor of dp on its local partial; the explicit allsum then sums
        # over devices — divide by dp to recover the true global gradient.
        # (Adam's scale invariance masked the stray factor; the contract
        # "dp only changes float reduction order" requires the exact grad.)
        grads = jax.tree.map(allsum, grads)
        if dp_size > 1:
            grads = jax.tree.map(lambda g: g / dp_size, grads)
        g_emb, g_dec, g_pos = grads
        if not bp.exact_embedding_grads:
            touched = touched | jnp.any(g_emb != 0.0, axis=-1)
        # group freezing (see module docstring)
        g_dec = jax.tree.map(
            lambda g: g * update_decoder.astype(g.dtype), g_dec
        )
        pose_mask = (pose_free & frame_active).astype(g_pos.dtype)[:, None]
        g_pos = g_pos * pose_mask

        updates, opt_state = opt.update((g_emb, g_dec, g_pos), opt_state)
        u_emb, u_dec, u_pos = updates
        emb = emb - lrs[0] * u_emb
        dec = jax.tree.map(lambda p, u: p - lrs[1] * u, dec, u_dec)
        if proj_dir is not None:
            # degeneracy gate: remove the unobservable component from the
            # translation update BEFORE it is applied, so the embeddings
            # (updated in the same iteration) fit the points at a pose that
            # never moved along that axis
            u_t = u_pos[:, :3]
            u_t = u_t - proj_dir * jnp.sum(
                u_t * proj_dir, axis=-1, keepdims=True
            )
            u_pos = jnp.concatenate([u_t, u_pos[:, 3:]], axis=1)
        pos = pos - lrs[2] * u_pos * pose_mask
        return emb, dec, pos, opt_state, key, touched, loss

    init = (emb0, decoder_params, poses, opt_state0, key, touched0,
            jnp.zeros((), jnp.float32))
    emb, dec, pos, _, _, touched, loss = jax.lax.fori_loop(
        0, bp.num_iterations, body, init
    )

    touched_count = jnp.sum(touched, dtype=jnp.int32)
    upd_count = vm.bump_upd_count(map_state, map_cfg, touched)
    if bp.exact_embedding_grads:
        new_emb = emb
    else:
        new_emb = vm.reconcile_packed(
            map_state, map_cfg, emb, touched, bp.touched_cap, bp.reconcile_mode
        )
    # Re-derive the packed table from the reconciled canonical embeddings:
    # between BA steps a shared corner has ONE value, exactly like the
    # reference's one-parameter-per-corner store (copies can only diverge
    # WITHIN a step). This also keeps every checkpoint/resume bit-stable —
    # the packed table is always f(embeddings) at frame boundaries.
    packed = vm.pack_embeddings(map_state._replace(embeddings=new_emb), map_cfg)

    # surface-bias measurement on the final field (see BAResult.surface_bias):
    # one forward eval over the active frames' measured points — points and
    # field are replicated under shard_map, so compute it on device 0's
    # slice-identical copy (no psum needed; identical on every device).
    # Static-gated: configs with bias_correction off skip the probe.
    if bp.measure_bias:
        st_eval = map_state._replace(packed=packed)
        xyz = jax.vmap(se3.transform_points)(pos, points)      # (W, P, 3)
        cells = jnp.floor(xyz / map_cfg.voxel_size).astype(jnp.int32)
        aid = vm.lookup_active(st_eval, map_cfg, cells)        # (W, P)
        depth = jnp.linalg.norm(points, axis=-1)
        m = (
            points_valid & frame_active[:, None] & (aid >= 0)
            & (depth > 0) & (depth < bp.max_depth)
        )
        sdf_pts = field_at(
            st_eval, map_cfg, dec, decoder_meta, xyz, aid, compute_dtype
        ).astype(jnp.float32)
        surface_bias = jnp.sum(
            jnp.where(m, sdf_pts, 0.0)
        ) / jnp.maximum(jnp.sum(m), 1).astype(jnp.float32)
    else:
        surface_bias = jnp.zeros((), jnp.float32)
    return BAResult(new_emb, packed, dec, pos, loss, touched_count,
                    surface_bias, upd_count)


def surface_bias_at(
    map_state: MapState,
    map_cfg: MapConfig,
    decoder_params,
    decoder_meta,
    pose6: jnp.ndarray,        # (6,)
    points: jnp.ndarray,       # (P, 3) sensor-frame
    points_valid: jnp.ndarray,  # (P,)
    max_depth: float,
    compute_dtype=jnp.float32,
    points_cos: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-class mean field value at one frame's measured surface points
    under its pose — the SETTLED-bias probe (tpu_specs.bias_source=
    'keyframe').

    The per-BA-step window probe (BAParams.measure_bias) reads the field
    right after optimizing on those very points, i.e. the post-BA overfit
    transient; the tracker meanwhile sees surfaces trained FRAMES ago. This
    probe evaluates the current keyframe's cloud instead — geometry whose
    training has settled — which is the offset the next tracked frame
    actually encounters (docs/PERF.md round-3 drift section).

    Returns (2, 2): row 0 = [ground mean, non-ground mean], row 1 = the
    two sample counts (0 count = no estimate this frame; the host EMA
    skips that class). Pooling rows with their counts reproduces the old
    scalar probe exactly; tpu_specs.bias_classes=2 keeps them separate —
    ground (most points, trained densely) and walls/structure (the
    range-constraining surfaces) can settle to different offsets, and a
    pooled target mis-places whichever class dominates less.
    NOTE: distinct from the round-2 REJECTED per-class split, which read
    the transient window probe (docs/PERF.md round-2 section)."""
    xyz = se3.transform_points(pose6, points)
    cells = jnp.floor(xyz / map_cfg.voxel_size).astype(jnp.int32)
    aid = vm.lookup_active(map_state, map_cfg, cells)
    depth = jnp.linalg.norm(points, axis=-1)
    m = points_valid & (aid >= 0) & (depth > 0) & (depth < max_depth)
    sdf_pts = field_at(
        map_state, map_cfg, decoder_params, decoder_meta, xyz, aid,
        compute_dtype,
    ).astype(jnp.float32)
    if points_cos is None:
        ground = jnp.zeros_like(m)
    else:
        ground = points_cos < 0.999
    out = []
    for cls in (m & ground, m & ~ground):
        c = jnp.sum(cls)
        s = jnp.sum(jnp.where(cls, sdf_pts, 0.0))
        out.append((s / jnp.maximum(c, 1).astype(jnp.float32),
                    c.astype(jnp.float32)))
    (bg, cg), (bn, cn) = out
    return jnp.stack([jnp.stack([bg, bn]), jnp.stack([cg, cn])])


@functools.partial(jax.jit, static_argnames=("map_cfg", "rc", "bp", "decoder_meta"))
def ba_step(
    map_state: MapState,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    bp: BAParams,
    decoder_params,
    decoder_meta,
    poses: jnp.ndarray,
    points: jnp.ndarray,
    points_cos: jnp.ndarray,
    points_valid: jnp.ndarray,
    frame_active: jnp.ndarray,
    pose_free: jnp.ndarray,
    update_decoder: jnp.ndarray,
    lrs: jnp.ndarray,
    key: jax.Array,
    proj_dir: jnp.ndarray | None = None,
) -> BAResult:
    """Single-chip BA step (see _ba_core for the full contract)."""
    return _ba_core(
        None, 1, map_state, map_cfg, rc, bp, decoder_params, decoder_meta,
        poses, points, points_cos, points_valid, frame_active, pose_free,
        update_decoder, lrs, key, proj_dir=proj_dir,
    )


def make_sharded_ba_step(mesh, map_cfg: MapConfig, rc: RaycastConfig,
                         bp: BAParams, decoder_meta):
    """The PRODUCTION BA step over a device mesh: the exact _ba_core body
    (Adam state, superset march, packed reconciliation, core/render render
    path) under shard_map with rays dp-sharded and grads psum'd over ICI.

    Map, decoder, poses, and optimizer state are replicated (in_specs P());
    sharding is by column block inside the body (global-draw-then-slice),
    so any dp produces the same sample set as a single chip and results
    differ only by float reduction order. Returns a jitted fn with the same
    runtime signature as :func:`ba_step` minus the static args.
    """
    from jax.sharding import PartitionSpec as P

    dp = int(mesh.shape["dp"])
    if bp.n_rays % dp != 0:
        raise ValueError(f"n_rays {bp.n_rays} not divisible by dp {dp}")

    def body(map_state, decoder_params, poses, points, points_cos,
             points_valid, frame_active, pose_free, update_decoder, lrs, key):
        return _ba_core(
            "dp", dp, map_state, map_cfg, rc, bp, decoder_params,
            decoder_meta, poses, points, points_cos, points_valid,
            frame_active, pose_free, update_decoder, lrs, key,
        )

    sharded = jax.shard_map(
        body, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )
    return jax.jit(sharded)
