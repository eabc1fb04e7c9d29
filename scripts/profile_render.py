"""Micro-breakdown of ONE render/BA iteration on the real chip.

Decomposes the ~12-14 ms render iteration (docs/PERF.md round-2 profile)
into its primitive stages so the round-3 fusion work targets the real
cost center. Methodology: the axon tunnel sync (~27 ms) swamps single
dispatches, so every stage is timed AMORTIZED — K chained iterations
inside one jitted fori_loop with a forced data dependency (a tiny carry
perturbs the input and absorbs a scalar of the output so XLA can neither
hoist nor dead-code the body), one value fetch at the end.

Run: python -u scripts/profile_render.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BENCH_OVERRIDES
from nerfloam_tpu.core import tracking as tr_mod
from nerfloam_tpu.core.frame import Frame, pose6_from_matrix_np
from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.core.render import field_at, render_rays
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.models.decoder import decoder_apply
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.interp import interp_corner_features
from nerfloam_tpu.ops.raycast import march_occupancy, place_samples_cdf
from nerfloam_tpu.utils.config import load_config

K = 30


def amortized(name, body, n=3, k=K):
    """body: (carry_scalar, i) -> carry_scalar; timed over k fori_loop iters."""

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, k, lambda i, c: body(c, i), c0)

    c0 = jnp.zeros((), jnp.float32)
    _ = float(run(c0))  # compile + warm
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        _ = float(run(c0))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts)) / k
    print(f"{name:>36s}: {dt*1e3:9.3f} ms/iter", flush=True)
    return dt


def dep_in(x, c):
    """Perturb input by the carry so the loop body can't be hoisted."""
    return x + c * 1e-30


def dep_out(x):
    """Scalar absorbed into the carry so the body can't be DCE'd."""
    return jnp.sum(x.astype(jnp.float32).ravel()[:64]) * 1e-30


def main():
    cfg = load_config("configs/synthetic/synthetic_small.yaml", BENCH_OVERRIDES)
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    frames = []
    for i in range(5):
        idx, pts, cos, pose = dataset[i]
        frames.append(Frame.from_raw(idx, pts, cos, None, slam.points_pad))
    frames[0].pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
    slam.process_first_frame(frames[0])
    for f in frames[1:3]:
        slam.process_frame(f)
    st = slam.state
    print("n_active:", int(st.map_state.n_active),
          "acap:", vm.acap(slam.map_cfg),
          "grid cells:", int(np.prod(slam.map_cfg.grid_dim)), flush=True)

    f = frames[3]
    key = jax.random.key(0)
    init6 = jnp.asarray(st.last_frame.pose6)
    pts_j = jnp.asarray(f.points)
    cos_j = jnp.asarray(f.points_cos)
    val_j = jnp.asarray(f.valid)

    for tag, R, M, rc in (
        ("track", slam.tp.n_rays, slam.rc_track.n_samples, slam.rc_track),
        ("ba", slam.bp_current.n_rays, slam.rc_map.n_samples, slam.rc_map),
    ):
        S = rc.n_coarse or int(-(-rc.max_depth // rc.voxel_size))
        print(f"--- {tag}: R={R} M={M} n_coarse={S}")
        ridx = jnp.arange(R) % slam.points_pad
        rpts = pts_j[ridx]
        dirs = rpts / (jnp.linalg.norm(rpts, axis=-1, keepdims=True) + 1e-8)
        wdirs = se3.rotate_dirs(init6, dirs)
        origin = jnp.broadcast_to(se3.pose_translation(init6), wdirs.shape)
        t_cap = tr_mod.t_cap_for(rpts, cos_j[ridx], 0.3, rc.max_depth)
        rval = val_j[ridx]

        cdf, nocc = march_occupancy(
            st.map_state, slam.map_cfg, rc, origin, wdirs, t_cap
        )
        z, lid, valid, rmask = place_samples_cdf(
            st.map_state, slam.map_cfg, rc, cdf, nocc, origin, wdirs, t_cap, key
        )
        xyz = origin[:, None, :] + wdirs[:, None, :] * z[..., None]

        def b_march(c, i):
            cdf_, nocc_ = march_occupancy(
                st.map_state, slam.map_cfg, rc, dep_in(origin, c), wdirs, t_cap
            )
            return c + dep_out(nocc_)

        amortized(f"march_occupancy({R}x{S})", b_march)

        def b_place(c, i):
            out = place_samples_cdf(
                st.map_state, slam.map_cfg, rc, dep_in(cdf, c), nocc,
                origin, wdirs, t_cap, jax.random.fold_in(key, i),
            )
            return c + dep_out(out[0])

        amortized(f"place_samples_cdf({R}x{M})", b_place)

        def b_fine(c, i):
            pts_ = dep_in(xyz, c)
            cells = jnp.floor(pts_ / slam.map_cfg.voxel_size).astype(jnp.int32)
            out = vm.lookup_active(st.map_state, slam.map_cfg, cells)
            return c + dep_out(out)

        amortized(f"fine_lookup({R}x{M})", b_fine)

        def b_gather(c, i):
            safe = jnp.clip(lid + (c * 1e-30).astype(jnp.int32), 0)
            rows = st.map_state.packed[safe]
            return c + dep_out(rows)

        amortized(f"packed_gather({R}x{M})", b_gather)

        def b_interp(c, i):
            F = slam.map_cfg.feat_dim
            safe = jnp.clip(lid, 0)
            rows = st.map_state.packed[safe]
            embs = dep_in(rows, c).reshape(rows.shape[:-1] + (8, F))
            center = (
                st.map_state.active_coords[safe].astype(jnp.float32) + 0.5
            ) * slam.map_cfg.voxel_size
            feats = interp_corner_features(
                xyz, center, embs, slam.map_cfg.voxel_size
            )
            out = decoder_apply(
                st.decoder_params, st.decoder_meta, feats, jnp.bfloat16
            )[..., 0]
            return c + dep_out(out)

        amortized(f"gather+interp+mlp({R}x{M})", b_interp)

        def b_fwd(c, i):
            out = render_rays(
                st.map_state, slam.map_cfg, rc, st.decoder_params,
                st.decoder_meta, dep_in(origin, c), wdirs, t_cap, rval,
                jax.random.fold_in(key, i), jnp.bfloat16,
            )
            return c + dep_out(out.sdf)

        amortized(f"render_rays fwd({R})", b_fwd)

        def b_fwd_hoist(c, i):
            out = render_rays(
                st.map_state, slam.map_cfg, rc, st.decoder_params,
                st.decoder_meta, dep_in(origin, c), wdirs, t_cap, rval,
                jax.random.fold_in(key, i), jnp.bfloat16,
                occupancy=(cdf, nocc),
            )
            return c + dep_out(out.sdf)

        amortized(f"render_rays fwd hoisted({R})", b_fwd_hoist)

        def loss_packed(packed, c, i):
            s = st.map_state._replace(packed=packed)
            out = render_rays(
                s, slam.map_cfg, rc, st.decoder_params, st.decoder_meta,
                dep_in(origin, c), wdirs, t_cap, rval,
                jax.random.fold_in(key, i), jnp.bfloat16,
            )
            return jnp.sum(jnp.where(out.valid_mask, out.sdf, 0.0) ** 2)

        gfn = jax.grad(loss_packed)

        def b_bwd(c, i):
            g = gfn(st.map_state.packed, c, i)
            return c + dep_out(g)

        amortized(f"render+packed_grad({R})", b_bwd)

    # Adam machinery cost on the packed table alone
    A = vm.acap(slam.map_cfg)
    Fp = 8 * slam.map_cfg.feat_dim
    opt = optax.scale_by_adam()
    g = jnp.ones((A, Fp), jnp.float32) * 1e-4
    p0 = st.map_state.packed
    opt_state = opt.init(p0)

    def b_adam(c, i):
        u, _s2 = opt.update(dep_in(g, c), opt_state)
        p = p0 - 0.01 * u
        return c + dep_out(p)

    amortized(f"adam_update_packed({A}x{Fp})", b_adam)


if __name__ == "__main__":
    main()
