"""Per-stage on-chip timing at the KITTI bench budget.

Times each jitted stage of the pipeline separately so optimization targets
the real bottleneck. Sync via scalar value fetch (block_until_ready is
unreliable on the axon tunnel). Run: python -u scripts/profile_stages.py
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BENCH_OVERRIDES
from nerfloam_tpu.core import ba as ba_mod
from nerfloam_tpu.core import tracking as tr_mod
from nerfloam_tpu.core.frame import Frame, pose6_from_matrix_np
from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.core.render import render_rays
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import sample_rays_cdf
from nerfloam_tpu.utils.config import load_config

SYNC_OVERHEAD_EST = 0.027  # measured fixed per-fetch tunnel latency (s)


def timeit(name, fn, *args, n=4, sync=None, **kw):
    """fn must return something with a cheap scalar to fetch via sync(out)."""
    out = fn(*args, **kw)
    _ = float(sync(out))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _ = float(sync(out))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) - SYNC_OVERHEAD_EST
    print(f"{name:>28s}: {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    extra = [s for s in os.environ.get("NERFLOAM_BENCH_SET", "").split(",") if s]
    cfg = load_config(
        "configs/synthetic/synthetic_small.yaml", BENCH_OVERRIDES + extra
    )
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    print("grid_dim:", slam.map_cfg.grid_dim, "capacity:", slam.map_cfg.capacity,
          "active_cap:", slam.map_cfg.active_cap, flush=True)

    frames = []
    for i in range(5):
        idx, pts, cos, pose = dataset[i]
        frames.append(Frame.from_raw(idx, pts, cos, None, slam.points_pad))
    frames[0].pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
    slam.process_first_frame(frames[0])
    for f in frames[1:3]:
        slam.process_frame(f)
    print("num_lat:", int(slam.state.map_state.num_lat),
          "n_active:", int(slam.state.map_state.n_active), flush=True)

    st = slam.state
    f = frames[3]
    key = jax.random.key(0)

    init6 = jnp.asarray(st.last_frame.pose6)
    pts_j = jnp.asarray(f.points)
    cos_j = jnp.asarray(f.points_cos)
    val_j = jnp.asarray(f.valid)
    lr = jnp.asarray(0.01, jnp.float32)
    timeit(
        "track_frame(25it)", tr_mod.track_frame,
        st.map_state, slam.map_cfg, slam.rc_track, slam.tp,
        st.decoder_params, st.decoder_meta, init6, pts_j, cos_j, val_j, lr, key,
        sync=lambda r: r.loss,
    )

    tgt = [f]
    p, c, v, po, act = slam._pad_for_ba(tgt, slam.bp_current.n_frames, slam.points_pad)
    timeit(
        "ba_step(current,25it)", ba_mod.ba_step,
        st.map_state, slam.map_cfg, slam.rc_map, slam.bp_current,
        st.decoder_params, st.decoder_meta,
        jnp.asarray(po), jnp.asarray(p), jnp.asarray(c), jnp.asarray(v),
        jnp.asarray(act), jnp.asarray(np.array([True])),
        jnp.asarray(True), jnp.asarray(slam.ba_lrs), key,
        sync=lambda r: r.loss,
    )

    T = f.pose_matrix()
    world = jnp.asarray(f.points @ T[:3, :3].T + T[:3, 3], jnp.float32)
    ins = jax.jit(vm.insert_points, static_argnames=("cfg",))
    timeit(
        "insert_points(65k)", ins,
        st.map_state, slam.map_cfg, world, jnp.asarray(f.valid),
        sync=lambda s: s.num_lat,
    )

    rec = jax.jit(vm.recenter, static_argnames=("cfg",))
    timeit(
        "recenter", rec,
        st.map_state, slam.map_cfg, jnp.asarray(f.pose6[:3]),
        sync=lambda s: s.region_min[0],
    )

    ref = jax.jit(vm.refresh_active, static_argnames=("cfg",))
    timeit(
        "refresh_active", ref,
        st.map_state, slam.map_cfg,
        sync=lambda s: s.n_active,
    )

    # render sub-stages at track shapes (1 iteration)
    R = slam.tp.n_rays
    ridx = jnp.arange(R) % slam.points_pad
    rpts = pts_j[ridx]
    dirs = rpts / (jnp.linalg.norm(rpts, axis=-1, keepdims=True) + 1e-8)
    wdirs = se3.rotate_dirs(init6, dirs)
    origin = jnp.broadcast_to(se3.pose_translation(init6), wdirs.shape)
    t_cap = tr_mod.t_cap_for(rpts, cos_j[ridx], 0.3, slam.rc_track.max_depth)
    rval = val_j[ridx]

    sample_j = jax.jit(sample_rays_cdf, static_argnames=("map_cfg", "rc"))
    timeit(
        "sample_rays_cdf(2048)", sample_j,
        st.map_state, slam.map_cfg, slam.rc_track, origin, wdirs, t_cap, key,
        sync=lambda r: r[0].sum(),
    )

    render_j = jax.jit(
        render_rays, static_argnames=("map_cfg", "rc", "decoder_meta", "compute_dtype")
    )
    timeit(
        "render_rays(2048)", render_j,
        st.map_state, slam.map_cfg, slam.rc_track,
        st.decoder_params, st.decoder_meta,
        origin, wdirs, t_cap, rval, key, jnp.bfloat16,
        sync=lambda r: r.sdf.sum(),
    )

    def render_grad(pose6):
        wd = se3.rotate_dirs(pose6, dirs)
        og = jnp.broadcast_to(se3.pose_translation(pose6), wd.shape)
        out = render_rays(
            st.map_state, slam.map_cfg, slam.rc_track,
            st.decoder_params, st.decoder_meta,
            og, wd, t_cap, rval, key, jnp.bfloat16,
        )
        return jnp.sum(jnp.where(out.valid_mask, out.sdf, 0.0) ** 2)

    timeit("render+pose_grad(2048)", jax.jit(jax.grad(render_grad)), init6,
           sync=lambda g: g[0])


def profile_full_frames():
    """Wall-clock per process_frame after warmup (host+device, like bench)."""
    cfg = load_config("configs/synthetic/synthetic_small.yaml", BENCH_OVERRIDES)
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    frames = []
    for i in range(12):
        idx, pts, cos, pose = dataset[i]
        frames.append(Frame.from_raw(idx, pts, cos, None, slam.points_pad))
    frames[0].pose6 = pose6_from_matrix_np(dataset.get_init_pose(0))
    slam.process_first_frame(frames[0])
    for f in frames[1:5]:
        slam.process_frame(f)
    _ = float(slam.state.map_state.n_active)
    for f in frames[5:12]:
        t0 = time.perf_counter()
        slam.process_frame(f)
        _ = float(slam.state.map_state.n_active)
        print(f"frame {f.index}: {(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)
    slam.prof.report()


if __name__ == "__main__":
    if os.environ.get("PROFILE_FULL"):
        profile_full_frames()
    else:
        main()
