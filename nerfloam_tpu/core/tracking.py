"""Frame-to-map tracking: SE(3) pose optimization against the frozen field.

Equivalent of the reference's track_frame (/root/reference/src/variations/
render_helpers.py:428-514) and the Tracking engine around it
(src/tracking.py:98-148), redesigned as ONE jitted program: the whole
N-iteration Adam loop runs inside lax.fori_loop, so a tracked frame is a
single device dispatch (the reference re-launched ~10 kernels × 25
iterations with host sync between each).

Per iteration (matching the reference's loop body):
  - Gumbel-resample N_rays from the frame's valid points,
  - rotate sensor-frame ray dirs by the current pose, origin = translation,
  - render through the frozen map/decoder,
  - free-space + truncated-SDF loss with ground-cosine correction,
  - Adam step on the 6-vector pose only.

The learning-rate schedule matches render_helpers.py:448-450 (x2 for the
first two frames, /3 after); the first tracked frame runs 5x iterations
(tracking.py:127). Total-miss fallback to the constant-velocity pose
(tracking.py:136-137) is decided by the host from the returned hit count.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerfloam_tpu.core.losses import sdf_losses
from nerfloam_tpu.core.render import render_rays
from nerfloam_tpu.map.voxel_map import MapConfig, MapState
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import RaycastConfig
from nerfloam_tpu.ops.sampling import sample_ray_indices


class TrackParams(NamedTuple):
    """Static tracking parameters."""

    n_rays: int
    num_iterations: int
    truncation: float
    max_depth: float
    fs_weight: float
    sdf_weight: float
    compute_dtype: str = "float32"
    resample_rays: bool = False  # True = reference-exact per-iteration
    #   Gumbel resampling + fresh occupancy march (lidarFrame.py:54-57);
    #   False = one ray batch + one march per step, jittered sample
    #   placement per iteration — ~2x faster, statistically equivalent for
    #   a 6-DoF problem with 2048 rays (validated on synthetic ATE)
    surface_anchor: int = 0  # extra samples AT each measured point
    #   (core/render.anchor_samples): pins the SDF zero crossing. The int
    #   is the loss weight (the anchor column is repeated that many times
    #   against the ~M stochastic band samples); 0 = off
    band_samples: int = 0  # extra stratified samples per ray across the
    #   cosine-widened truncation band around the measured depth
    #   (core/render.band_sample_z): guaranteed constraint density on both
    #   sides of every surface point; 0 = off
    s2s: object = None  # core.scan2scan.Scan2ScanParams | None — add the
    #   scan-to-scan projective point-to-plane term to the GN system
    #   (tpu_specs.s2s_weight > 0, GN tracker only). Map-independent
    #   relative-motion observation targeting along-track drift.
    maturity_warmup: int = 0  # > 0: down-weight residual samples that fall
    #   in under-converged voxels (GN tracker only). A voxel's maturity is
    #   its BA-touch count (MapState.upd_count); sample weight is scaled by
    #   maturity_floor + (1-floor) * min(count / maturity_warmup, 1).
    #   Rationale: the measured along-track drift driver is the tracker
    #   registering against freshly-allocated frontier voxels ahead of the
    #   sensor whose SDF hasn't converged (EVAL_r04 frontier probe:
    #   live-field pull +0.56 cm/f ~= the closed-loop invariant). The
    #   settled map behind/beside the sensor should dominate the pose.
    #   0 = off (reference parity). Scale-invariance note: when ALL samples
    #   are equally immature (bootstrap, new rooms) the weights scale H and
    #   b uniformly, so the GN step is unchanged — the floor only matters
    #   for mixed populations.
    maturity_floor: float = 0.25  # minimum maturity weight (see above)


class TrackResult(NamedTuple):
    pose: jnp.ndarray        # (6,) optimized pose
    hit_count: jnp.ndarray   # () int32 — hit rays at the last iteration
    loss: jnp.ndarray        # () float32 last-iteration loss


def _track_gn_core(
    axis_name: str | None,
    dp_size: int,
    map_state: MapState,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    tp: TrackParams,
    decoder_params,
    decoder_meta,
    init_pose: jnp.ndarray,
    points: jnp.ndarray,
    points_cos: jnp.ndarray,
    points_valid: jnp.ndarray,
    learning_rate: jnp.ndarray,  # unused (kept for signature parity)
    key: jax.Array,
    sdf_bias: jnp.ndarray | float = 0.0,  # band target offset — the mapped
    #   field's measured surface offset (BAResult.surface_bias EMA), as
    #   (2,) [ground, non-ground] or a scalar; pose optimization targets
    #   sdf = bias at measured points so the field's fit bias does not
    #   integrate into per-frame drift
    prev_scan=None,  # core.scan2scan.PrevScan — rasterized previous scan
    #   for the s2s term (required iff tp.s2s is set)
) -> TrackResult:
    """Levenberg-Marquardt pose tracking on the truncated-SDF residuals.

    Multi-chip (axis_name set, inside shard_map): rays are dp-sharded by
    global-draw-then-slice — every device draws the SAME Gumbel ray set
    from the replicated key and processes its contiguous block, so the
    union equals the single-chip draw exactly. The hit-table build / render
    work parallelizes over rays; the 6x6 normal equations, the
    count-balancing weights' sample counts, the loss, and the hit count
    are psum'd, so every device solves the identical system and applies
    the identical update — dp only changes float reduction order.

    TPU-first redesign of the reference's 25-step Adam loop
    (render_helpers.py:428-514): the pose is 6-DoF and the loss is a
    weighted least-squares over ~10^5 samples, so Gauss-Newton normal
    equations (6x6, built by one einsum over per-sample Jacobians) converge
    in a handful of iterations. Per iteration: one SDF forward + one
    input-gradient backward — same cost as one Adam step, ~4x fewer steps.

    Residuals mirror core.losses.sdf_losses exactly:
      front samples:  r = sdf - 1            (free space -> +1)
      band samples:   r = z cos + T sdf - d cos
    with the same count-balancing weights. The pose Jacobian uses the
    left-perturbation chain d xyz / d(dt, dtheta) = [I, -skew(xyz - t)].
    """
    compute_dtype = jnp.dtype(tp.compute_dtype)
    from nerfloam_tpu.ops.raycast import (
        build_hit_table,
        march_occupancy,
        place_samples_cdf,
        sample_from_hits,
    )

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    key, k_fixed = jax.random.split(key)
    ridx, rvalid = sample_ray_indices(k_fixed, points_valid, tp.n_rays)
    if axis_name is not None:
        n_loc = tp.n_rays // dp_size
        i = jax.lax.axis_index(axis_name)
        ridx = jax.lax.dynamic_slice_in_dim(ridx, i * n_loc, n_loc)
        rvalid = jax.lax.dynamic_slice_in_dim(rvalid, i * n_loc, n_loc)
    pts = points[ridx]
    pcos = points_cos[ridx]
    dirs = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
    t_cap = t_cap_for(pts, pcos, tp.truncation, tp.max_depth)
    d_meas = jnp.linalg.norm(pts, axis=-1) * pcos            # (N,)
    depth_ok = (d_meas > 0.0) & (d_meas < tp.max_depth)
    b2 = jnp.broadcast_to(
        jnp.asarray(sdf_bias, jnp.float32).reshape(-1)[:2], (2,)
    )
    bias_ray = jnp.where(pcos < 0.999, b2[0], b2[1])         # (N,)

    wdirs0 = se3.rotate_dirs(init_pose, dirs)
    origin0 = jnp.broadcast_to(se3.pose_translation(init_pose), wdirs0.shape)
    use_hits = rc.sampler == "hits"
    if use_hits:
        # hit table + per-hit packed rows hoisted out of the loop: every
        # iteration then places samples and selects corner rows entirely
        # in registers (ops/raycast.HitTable)
        ht0 = build_hit_table(map_state, map_cfg, rc, origin0, wdirs0, t_cap)
        from nerfloam_tpu.core.render import hit_rows, select_rows

        rows_h0 = hit_rows(map_state, ht0)
        occupancy = None
    else:
        occupancy = march_occupancy(
            map_state, map_cfg, rc, origin0, wdirs0, t_cap
        )

    T = tp.truncation

    # voxel-maturity weighting (TrackParams.maturity_warmup): per-ACTIVE-row
    # BA-touch counts, hoisted once — per-sample weights are one tiny (R, M)
    # int gather per iteration
    if tp.maturity_warmup > 0:
        cnt_active = map_state.upd_count[map_state.active_ids].astype(
            jnp.float32
        )                                                     # (A,)

        def maturity_w(aid):
            cnt = cnt_active[jnp.clip(aid, 0)]
            frac = jnp.minimum(cnt / float(tp.maturity_warmup), 1.0)
            return tp.maturity_floor + (1.0 - tp.maturity_floor) * frac
    else:
        maturity_w = None

    from nerfloam_tpu.core.render import field_from_embs

    def field_and_grad(xyz, embs):
        """SDF value + spatial gradient: one forward + one backward, on
        per-sample packed corner rows fixed for this iteration."""
        def f_sum(x):
            return jnp.sum(
                field_from_embs(
                    map_cfg, decoder_params, decoder_meta, x, embs,
                    compute_dtype,
                )
            )
        sdf_val = field_from_embs(
            map_cfg, decoder_params, decoder_meta, xyz, embs, compute_dtype
        )
        grad_val = jax.grad(f_sum)(xyz)
        return sdf_val, grad_val

    def _residual_parts(pose6, z, embs, vmask, mat_w=None):
        """sdf + residuals/weights at a pose, with FIXED sample depths z and
        corner rows. ``mat_w``: optional (N, M) per-sample voxel-maturity
        weight multiplied into the count-balanced weights."""
        wdirs = se3.rotate_dirs(pose6, dirs)
        t_pos = se3.pose_translation(pose6)
        origin = jnp.broadcast_to(t_pos, wdirs.shape)
        xyz = origin[:, None, :] + wdirs[:, None, :] * z[..., None]
        sdf = field_from_embs(
            map_cfg, decoder_params, decoder_meta, xyz, embs, compute_dtype
        )
        zc = z * pcos[:, None]
        d = d_meas[:, None]
        front = (zc < (d - T)) & vmask
        band = vmask & ~front & ~(zc > (d + T)) & depth_ok[:, None]
        num_fs = allsum(jnp.sum(front))    # GLOBAL counts: the balancing
        num_sdf = allsum(jnp.sum(band))    # weights must match single-chip
        tot = jnp.maximum(num_fs + num_sdf, 1).astype(jnp.float32)
        w_fs = tp.fs_weight * (1.0 - num_fs / tot)
        w_sdf = tp.sdf_weight * (1.0 - num_sdf / tot)
        r = jnp.where(
            front, sdf - 1.0, (zc + (sdf - bias_ray[:, None]) * T) - d
        )
        w = jnp.where(front, w_fs, w_sdf) * (front | band)
        if mat_w is not None:
            w = w * mat_w
        jscale = jnp.where(front, 1.0, T)
        return xyz, t_pos, r, w, jscale

    def body(i, carry):
        pose6, lam, key, _, _ = carry
        key, k_place, k_band = jax.random.split(key, 3)
        wdirs = se3.rotate_dirs(pose6, dirs)
        origin = jnp.broadcast_to(se3.pose_translation(pose6), wdirs.shape)
        if use_hits:
            from nerfloam_tpu.ops.raycast import resolve_cells_in_hits

            z, _, _, vmask, ray_mask = sample_from_hits(
                ht0, rc.n_samples, k_place
            )
            sxyz = origin[:, None, :] + wdirs[:, None, :] * z[..., None]
            scell = jnp.floor(sxyz / map_cfg.voxel_size).astype(jnp.int32)
            onehot, flid, found = resolve_cells_in_hits(ht0, scell)
            vmask = vmask & found
            embs = select_rows(onehot, rows_h0)
        else:
            z, flid, vmask, ray_mask = place_samples_cdf(
                map_state, map_cfg, rc, occupancy[0], occupancy[1],
                origin, wdirs, t_cap, k_place,
            )
            embs = map_state.packed[jnp.clip(flid, 0)]
        ray_mask = ray_mask & rvalid
        vmask = vmask & rvalid[:, None]
        mat_w = maturity_w(flid) if maturity_w is not None else None
        if tp.surface_anchor or tp.band_samples:
            from nerfloam_tpu.core.render import band_sample_z
            from nerfloam_tpu.map import voxel_map as _vm

            dnorm = jnp.linalg.norm(pts, axis=-1)
            extra = []
            if tp.surface_anchor:
                # samples AT the measured point: residual sdf*T lands in
                # the band-loss machinery below with zc = d exactly;
                # repeated tp.surface_anchor times as the anchor's weight
                extra.append(
                    jnp.repeat(dnorm[:, None], tp.surface_anchor, axis=1)
                )
            if tp.band_samples:
                extra.append(
                    band_sample_z(k_band, dnorm, pcos, T, tp.band_samples)
                )
            ez = jnp.concatenate(extra, axis=1)                  # (N, K)
            exyz = origin[:, None, :] + wdirs[:, None, :] * ez[..., None]
            ecell = jnp.floor(exyz / map_cfg.voxel_size).astype(jnp.int32)
            eaid = _vm.lookup_active(map_state, map_cfg, ecell)
            eval_ = (eaid >= 0) & rvalid[:, None] & (ez > 0)
            eembs = map_state.packed[jnp.clip(eaid, 0)]
            z = jnp.concatenate([z, ez], axis=1)
            vmask = jnp.concatenate([vmask, eval_], axis=1)
            embs = jnp.concatenate([embs, eembs], axis=1)
            if mat_w is not None:
                mat_w = jnp.concatenate([mat_w, maturity_w(eaid)], axis=1)

        xyz, t_pos, r, w, jscale = _residual_parts(
            pose6, z, embs, vmask, mat_w
        )
        _, g = field_and_grad(xyz, embs)
        loss_cur = allsum(jnp.sum(w * r * r))

        q = xyz - t_pos                                       # (N, M, 3)
        gj = g * jscale[..., None]
        J = jnp.concatenate([gj, jnp.cross(q, gj)], axis=-1)  # (N, M, 6)
        Jw = J * w[..., None]
        H = allsum(jnp.einsum(
            "nmi,nmj->ij", Jw, J, precision=jax.lax.Precision.HIGHEST
        ))
        b = allsum(jnp.einsum(
            "nmi,nm->i", Jw, r, precision=jax.lax.Precision.HIGHEST
        ))
        if tp.s2s is not None and prev_scan is not None:
            # scan-to-scan point-to-plane term on the same ray subset: the
            # residuals share this device's rays, so the psum'd sums equal
            # the single-chip system exactly (core/scan2scan.py)
            from nerfloam_tpu.core.scan2scan import s2s_system

            Hs, bs, ls = s2s_system(tp.s2s, prev_scan, pose6, pts, rvalid)
            H = H + allsum(Hs)
            b = b + allsum(bs)
            loss_cur = loss_cur + allsum(ls)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(Hd, b)
        # trust region: clip translation to 0.5 m, rotation to 0.1 rad
        dt = delta[:3]
        dth = delta[3:]
        dt = dt * jnp.minimum(1.0, 0.5 / (jnp.linalg.norm(dt) + 1e-12))
        dth = dth * jnp.minimum(1.0, 0.1 / (jnp.linalg.norm(dth) + 1e-12))
        R_new = se3.compose_matrices(se3.exp_so3(dth), se3.pose_rotation(pose6))
        pose_try = jnp.concatenate([pose6[:3] + dt, se3.log_so3(R_new)])

        # Fixed damping beats a same-sample accept/reject test here: the
        # jittered truncated-SDF loss is noisy enough that rejections stall
        # the small iteration budget (measured: accept-test LM diverged on
        # 60-frame sequences where fixed damping tracked fine)
        return pose_try, lam, key, allsum(jnp.sum(ray_mask)), loss_cur

    init = (init_pose, jnp.asarray(1e-2, jnp.float32), key,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))
    pose6, _, _, hits, loss = jax.lax.fori_loop(0, tp.num_iterations, body, init)
    pose6 = jnp.where(hits > 0, pose6, init_pose)
    return TrackResult(pose6, hits, loss)


@functools.partial(jax.jit, static_argnames=("map_cfg", "rc", "tp", "decoder_meta"))
def track_frame_gn(
    map_state: MapState,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    tp: TrackParams,
    decoder_params,
    decoder_meta,
    init_pose: jnp.ndarray,
    points: jnp.ndarray,
    points_cos: jnp.ndarray,
    points_valid: jnp.ndarray,
    learning_rate: jnp.ndarray,
    key: jax.Array,
    sdf_bias: jnp.ndarray | float = 0.0,
    prev_scan=None,
) -> TrackResult:
    """Single-chip LM/GN pose tracking (full contract: _track_gn_core)."""
    return _track_gn_core(
        None, 1, map_state, map_cfg, rc, tp, decoder_params, decoder_meta,
        init_pose, points, points_cos, points_valid, learning_rate, key,
        sdf_bias, prev_scan,
    )


def t_cap_for(points: jnp.ndarray, cos: jnp.ndarray, truncation: float, max_depth: float):
    """Per-ray useful sampling range: measured distance + the cosine-widened
    truncation band (samples beyond are in the reference's back_mask and
    loss-neutral; see ops/raycast.py docstring)."""
    d = jnp.linalg.norm(points, axis=-1)
    band = truncation / jnp.maximum(cos, 0.05)
    return jnp.minimum(d + band + 0.5, max_depth)


@functools.partial(jax.jit, static_argnames=("map_cfg", "rc", "tp", "decoder_meta"))
def track_frame(
    map_state: MapState,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    tp: TrackParams,
    decoder_params,
    decoder_meta,
    init_pose: jnp.ndarray,   # (6,)
    points: jnp.ndarray,      # (P, 3) sensor-frame points (padded)
    points_cos: jnp.ndarray,  # (P,)
    points_valid: jnp.ndarray,  # (P,) bool
    learning_rate: jnp.ndarray,  # () float32
    key: jax.Array,
    sdf_bias: jnp.ndarray | float = 0.0,  # see track_frame_gn: (2,)
    #   [ground, non-ground] or scalar band-target offset
) -> TrackResult:
    # tp.num_iterations is static: the first tracked frame uses a tp with 5x
    # iterations (tracking.py:127), costing one extra jit cache entry instead
    # of masked no-op iterations on every later frame.
    compute_dtype = jnp.dtype(tp.compute_dtype)
    opt = optax.scale_by_adam()
    opt_state = opt.init(init_pose)
    b2 = jnp.broadcast_to(
        jnp.asarray(sdf_bias, jnp.float32).reshape(-1)[:2], (2,)
    )

    # The Adam tracker ALWAYS uses the grid sampler: its loop explores up
    # to ~0.5 m within one step, far beyond the hit table's validity (built
    # at the init pose) — samples leaving the hit set would be invalidated
    # instead of re-resolved, and the dropped-constraint loss develops
    # spurious minima (measured: converges ~0.3 m off on a scene the grid
    # path tracks to 7 cm). The GN tracker (cm-accurate warm start,
    # track_frame_gn) and BA (sub-mm pose motion) use rc.sampler.
    occupancy = None
    if not tp.resample_rays:
        # one ray batch + one occupancy march per tracking step, hoisted out
        # of the Adam loop (pose moves millimeters within a step)
        key, k_fixed = jax.random.split(key)
        ridx0, rvalid0 = sample_ray_indices(k_fixed, points_valid, tp.n_rays)
        pts0 = points[ridx0]
        pcos0 = points_cos[ridx0]
        dirs0 = pts0 / (jnp.linalg.norm(pts0, axis=-1, keepdims=True) + 1e-8)
        t_cap0 = t_cap_for(pts0, pcos0, tp.truncation, tp.max_depth)
        from nerfloam_tpu.ops.raycast import march_occupancy

        wdirs0 = se3.rotate_dirs(init_pose, dirs0)
        origin0 = jnp.broadcast_to(se3.pose_translation(init_pose), wdirs0.shape)
        occupancy = march_occupancy(
            map_state, map_cfg, rc, origin0, wdirs0, t_cap0
        )

    def loss_fn(pose6, ridx, rvalid, k):
        k, k_extra = jax.random.split(k)
        if tp.resample_rays:
            pts = points[ridx]                   # (N, 3)
            pcos = points_cos[ridx]
            dirs = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
            t_cap = t_cap_for(pts, pcos, tp.truncation, tp.max_depth)
        else:
            pts, pcos, dirs, t_cap = pts0, pcos0, dirs0, t_cap0
        wdirs = se3.rotate_dirs(pose6, dirs)     # (N, 3)
        origin = jnp.broadcast_to(se3.pose_translation(pose6), wdirs.shape)
        out = render_rays(
            map_state, map_cfg, rc, decoder_params, decoder_meta,
            origin, wdirs, t_cap, rvalid, k, compute_dtype,
            occupancy=occupancy,
        )
        z_vals, sdf_v, valid_m = out.z_vals, out.sdf, out.valid_mask
        if tp.surface_anchor or tp.band_samples:
            from nerfloam_tpu.core.render import extra_surface_columns

            ez, esdf, eval_ = extra_surface_columns(
                map_state, map_cfg, decoder_params, decoder_meta,
                origin, wdirs, jnp.linalg.norm(pts, axis=-1), pcos, rvalid,
                tp.truncation, tp.surface_anchor, tp.band_samples,
                k_extra, compute_dtype,
            )
            z_vals = jnp.concatenate([z_vals, ez], axis=1)
            sdf_v = jnp.concatenate([sdf_v, esdf], axis=1)
            valid_m = jnp.concatenate([valid_m, eval_], axis=1)
        loss, _ = sdf_losses(
            z_vals, sdf_v, valid_m, out.ray_mask,
            pts, pcos, tp.truncation, tp.max_depth,
            tp.fs_weight, tp.sdf_weight,
            sdf_bias=jnp.where(pcos < 0.999, b2[0], b2[1])[:, None],
        )
        return loss, jnp.sum(out.ray_mask)

    def body(i, carry):
        pose6, opt_state, key, _, _ = carry
        key, k_sample, k_render = jax.random.split(key, 3)
        if tp.resample_rays:
            ridx, rvalid = sample_ray_indices(k_sample, points_valid, tp.n_rays)
        else:
            ridx, rvalid = ridx0, rvalid0
        (loss, hits), g = jax.value_and_grad(loss_fn, has_aux=True)(
            pose6, ridx, rvalid, k_render
        )
        updates, opt_state = opt.update(g, opt_state)
        pose6 = pose6 - learning_rate * updates
        return pose6, opt_state, key, hits, loss

    init = (
        init_pose,
        opt_state,
        key,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.float32),
    )
    pose6, _, _, hits, loss = jax.lax.fori_loop(0, tp.num_iterations, body, init)
    # total-miss fallback to the constant-velocity init (tracking.py:136-137),
    # decided on device so the pipeline needs no mid-frame host sync
    pose6 = jnp.where(hits > 0, pose6, init_pose)
    return TrackResult(pose6, hits, loss)
