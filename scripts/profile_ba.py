"""Decompose the BA step's on-chip cost (round-4 throughput work).

Times ba_step at several iteration counts (slope = per-iteration cost,
intercept = fixed per-step cost) and the fixed-cost constituents
individually: the hoisted superset march, reconcile_packed,
pack_embeddings, and the surface-bias probe. This tells the Pallas-fusion
work (docs/NEXT.md item 2) where the 172 ms BA step actually goes.

Run on the real chip: python -u scripts/profile_ba.py
Budget knobs mirror bench.py (BENCH_OVERRIDES); NERFLOAM_BENCH_SET adds
extra overrides, e.g. NERFLOAM_BENCH_SET=tpu_specs.compute_dtype=bfloat16.
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BENCH_OVERRIDES
from nerfloam_tpu.core import ba as ba_mod
from nerfloam_tpu.core.frame import Frame, pose6_from_matrix_np
from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.utils.config import load_config

SYNC_OVERHEAD_EST = 0.027  # measured fixed per-fetch tunnel latency (s)


def timeit(name, fn, *args, n=4, sync=None, **kw):
    out = fn(*args, **kw)
    _ = float(sync(out))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _ = float(sync(out))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) - SYNC_OVERHEAD_EST
    print(f"{name:>34s}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    extra = [s for s in os.environ.get("NERFLOAM_BENCH_SET", "").split(",") if s]
    cfg = load_config(
        "configs/synthetic/synthetic_small.yaml", BENCH_OVERRIDES + extra
    )
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
    print("num_lat:", int(st.map_state.num_lat),
          "n_active:", int(st.map_state.n_active),
          "active_cap:", slam.map_cfg.active_cap,
          "touched_cap:", slam.bp_current.touched_cap,
          "sampler:", slam.rc_map.sampler, flush=True)

    f = frames[3]
    key = jax.random.key(0)
    tgt = [f]
    p, c, v, po, act = slam._pad_for_ba(
        tgt, slam.bp_current.n_frames, slam.points_pad
    )
    args = (
        st.map_state, slam.map_cfg, slam.rc_map,
        st.decoder_params, st.decoder_meta,
        jnp.asarray(po), jnp.asarray(p), jnp.asarray(c), jnp.asarray(v),
        jnp.asarray(act), jnp.asarray(np.array([True])),
        jnp.asarray(True), jnp.asarray(slam.ba_lrs), key,
    )

    # --- iteration-count sweep: slope = per-iter, intercept = fixed --------
    times = {}
    for it in (1, 5, slam.bp_current.num_iterations):
        bp = slam.bp_current._replace(num_iterations=it)
        times[it] = timeit(
            f"ba_step({it} it)", ba_mod.ba_step,
            args[0], args[1], args[2], bp, *args[3:],
            sync=lambda r: r.loss,
        )
    its = sorted(times)
    slope = (times[its[-1]] - times[its[0]]) / (its[-1] - its[0])
    fixed = times[its[0]] - slope * its[0]
    print(f"  -> per-iteration {slope*1e3:7.2f} ms, fixed {fixed*1e3:7.2f} ms",
          flush=True)

    # actual touched voxels per step vs the static touched_cap (the
    # reconcile/scatter work is O(touched_cap) regardless of the real count
    # — right-sizing the cap is a direct fixed-cost lever)
    r = ba_mod.ba_step(args[0], args[1], args[2], slam.bp_current, *args[3:])
    print(f"touched_count: {int(r.touched_count)} "
          f"(cap {slam.bp_current.touched_cap})", flush=True)

    # --- probe off: what does measure_bias cost? ---------------------------
    bp_nb = slam.bp_current._replace(measure_bias=False)
    timeit(
        "ba_step(25 it, no bias probe)", ba_mod.ba_step,
        args[0], args[1], args[2], bp_nb, *args[3:],
        sync=lambda r: r.loss,
    )

    # --- fixed-cost constituents ------------------------------------------
    A = vm.acap(slam.map_cfg)
    touched = jnp.zeros((A,), jnp.bool_).at[: slam.bp_current.touched_cap // 2].set(True)
    packed_new = st.map_state.packed + 0.01
    rec = jax.jit(vm.reconcile_packed,
                  static_argnames=("cfg", "touched_cap", "mode"))
    timeit(
        "reconcile_packed", rec,
        st.map_state, slam.map_cfg, packed_new, touched,
        slam.bp_current.touched_cap, slam.bp_current.reconcile_mode,
        sync=lambda e: e[0, 0],
    )
    pk = jax.jit(vm.pack_embeddings, static_argnames=("cfg",))
    timeit(
        "pack_embeddings(full A)", pk,
        st.map_state, slam.map_cfg,
        sync=lambda p_: p_[0, 0],
    )

    # the hoisted superset march (hits table) at BA shapes
    from nerfloam_tpu.core.tracking import t_cap_for
    from nerfloam_tpu.ops import se3
    from nerfloam_tpu.ops.raycast import build_hit_table

    W = slam.bp_current.n_frames
    K = slam.bp_current.n_rays * max(slam.bp_current.ray_superset, 1)
    pts_j = jnp.asarray(p)
    ridx = jnp.arange(W * K) % slam.points_pad
    rpts = pts_j.reshape(-1, 3)[ridx]
    dirs = rpts / (jnp.linalg.norm(rpts, axis=-1, keepdims=True) + 1e-8)
    wdirs = se3.rotate_dirs(jnp.asarray(po)[0], dirs)
    origin = jnp.broadcast_to(se3.pose_translation(jnp.asarray(po)[0]), wdirs.shape)
    t_cap = t_cap_for(rpts, jnp.asarray(c).reshape(-1)[ridx], 0.3,
                      slam.rc_map.max_depth)
    bht = jax.jit(build_hit_table, static_argnames=("map_cfg", "rc"))
    timeit(
        f"build_hit_table({W}x{K})", bht,
        st.map_state, slam.map_cfg, slam.rc_map, origin, wdirs, t_cap,
        sync=lambda h: h.t_near.sum(),
    )

    # --- within-iteration decomposition at BA ray shapes -------------------
    from nerfloam_tpu.core.render import hit_rows, render_rays_hits
    from nerfloam_tpu.core.losses import sdf_losses
    from nerfloam_tpu.models.decoder import decoder_apply

    R = W * slam.bp_current.n_rays
    ht = bht(st.map_state, slam.map_cfg, slam.rc_map, origin[:R], wdirs[:R],
             t_cap[:R])
    rval = jnp.ones((R,), bool)
    cdt = jnp.dtype(slam.bp_current.compute_dtype)

    rfwd = jax.jit(lambda packed: render_rays_hits(
        st.map_state._replace(packed=packed), slam.map_cfg, slam.rc_map,
        st.decoder_params, st.decoder_meta, origin[:R], wdirs[:R], ht,
        rval, key, cdt,
    ).sdf.sum())
    timeit(f"render_hits fwd ({R}x{slam.rc_map.n_samples})", rfwd,
           st.map_state.packed, sync=lambda s: s)

    def loss_of(packed, dec):
        out = render_rays_hits(
            st.map_state._replace(packed=packed), slam.map_cfg, slam.rc_map,
            dec, st.decoder_meta, origin[:R], wdirs[:R], ht, rval, key, cdt,
        )
        loss, _ = sdf_losses(
            out.z_vals, out.sdf, out.valid_mask, out.ray_mask,
            rpts[:R], jnp.asarray(c).reshape(-1)[ridx][:R], 0.3,
            slam.rc_map.max_depth, 1.0, 10000.0,
        )
        return loss

    rbwd = jax.jit(jax.grad(loss_of, argnums=(0, 1)))
    timeit("render_hits fwd+bwd (emb+dec grads)", rbwd,
           st.map_state.packed, st.decoder_params,
           sync=lambda g: g[0][0, 0])

    # pure per-hit gather (the only per-iteration random gather on this path)
    ghr = jax.jit(lambda packed: hit_rows(
        st.map_state._replace(packed=packed), ht).sum())
    timeit(f"hit_rows gather ({R}x{slam.rc_map.max_hits})", ghr,
           st.map_state.packed, sync=lambda s: s)

    # MLP-only floor at the same sample count (fwd + param/input grads)
    S = R * slam.rc_map.n_samples
    feats = jnp.zeros((S, slam.map_cfg.feat_dim), cdt)

    def mlp_loss(dec, x):
        return decoder_apply(dec, st.decoder_meta, x, cdt).sum()

    mfwd = jax.jit(mlp_loss)
    timeit(f"decoder fwd ({S} samples)", mfwd, st.decoder_params, feats,
           sync=lambda s: s)
    mbwd = jax.jit(jax.grad(mlp_loss, argnums=(0, 1)))
    timeit("decoder fwd+bwd", mbwd, st.decoder_params, feats,
           sync=lambda g: g[1][0, 0])


if __name__ == "__main__":
    main()
