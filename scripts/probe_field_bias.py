"""Measure the mapped SDF's vertical ground bias, feedback-free.

Runs the pipeline in mapping-only mode (GT poses) on the KITTI-replica
world, then drops vertical probe lines at observed ground locations and
reports where the fitted SDF zero crossing sits relative to the true
ground plane (z = 0 in the synthetic world). A negative mean crossing
height = the fitted ground sags below truth = the tracker inherits a
per-frame sink (the failure measured on the 500-frame replica eval:
-0.97 cm/frame, docs/PERF.md).

Usage:
    python scripts/probe_field_bias.py [--set k=v ...] [--frames N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/synthetic/kitti_replica_ci.yaml")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--lines", type=int, default=2048)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.core.render import field_at
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.map import voxel_map as vm
    from nerfloam_tpu.utils.config import load_config

    overrides = [
        f"data_specs.n_frames={args.frames}",
        "data_specs.use_gt=True",
    ] + (args.set or [])
    cfg = load_config(args.config, overrides)
    ds = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, ds)
    slam.run()

    # ground probe lines: observed ground points (cos < 1) of a few frames;
    # track which source frame each line came from so bias can be resolved
    # by map age (settled interior vs the just-inserted frontier the
    # tracker actually localizes against)
    rng = np.random.default_rng(0)
    xy, src = [], []
    for i in range(0, args.frames, 5):
        _, pts, cos, pose = ds[i]
        g = pts[cos < 0.999]
        if not len(g):
            continue
        T = np.asarray(pose)
        w = g @ T[:3, :3].T + T[:3, 3]
        sel = w[rng.choice(len(w), min(200, len(w)), replace=False), :2]
        xy.append(sel)
        src.append(np.full(len(sel), i))
    xy = np.concatenate(xy)[: args.lines]
    src = np.concatenate(src)[: args.lines]

    Z = np.linspace(-0.45, 0.45, 31).astype(np.float32)
    pts3 = np.concatenate(
        [
            np.repeat(xy[:, None, :], len(Z), axis=1),
            np.broadcast_to(Z[None, :, None], (len(xy), len(Z), 1)),
        ],
        axis=-1,
    ).astype(np.float32)

    st = slam.state.map_state
    mc = slam.map_cfg
    p3 = jnp.asarray(pts3.reshape(-1, 3))
    cells = jnp.floor(p3 / mc.voxel_size).astype(jnp.int32)
    aid = vm.lookup_active(st, mc, cells)
    sdf = field_at(st, mc, slam.state.decoder_params, slam.state.decoder_meta,
                   p3, aid, jnp.float32)
    sdf = np.asarray(jnp.where(aid >= 0, sdf, np.nan)).reshape(len(xy), len(Z))

    # per-line zero crossing: first sign change scanning downward (z desc)
    crossings, cross_src = [], []
    order = np.argsort(-Z)
    for li, row in enumerate(sdf):
        r = row[order]
        zs = Z[order]
        ok = np.isfinite(r)
        r, zs = r[ok], zs[ok]
        if len(r) < 2:
            continue
        sgn = np.signbit(r)
        idx = np.nonzero(sgn[1:] != sgn[:-1])[0]
        if not len(idx):
            continue
        i = idx[0]
        z0, z1, f0, f1 = zs[i], zs[i + 1], r[i], r[i + 1]
        crossings.append(z0 + (z1 - z0) * (0.0 - f0) / (f1 - f0 + 1e-12))
        cross_src.append(src[li])
    crossings = np.asarray(crossings)
    cross_src = np.asarray(cross_src)
    cov_above = np.isfinite(sdf[:, Z >= 0]).mean()
    cov_below = np.isfinite(sdf[:, Z < 0]).mean()
    out = {
        "n_lines": int(len(sdf)),
        "n_crossings": int(len(crossings)),
        "crossing_mean_cm": round(float(np.mean(crossings)) * 100, 2)
        if len(crossings) else None,
        "crossing_median_cm": round(float(np.median(crossings)) * 100, 2)
        if len(crossings) else None,
        "sdf_at_surface_mean": round(float(np.nanmean(sdf[:, np.argmin(np.abs(Z))])), 4),
        "coverage_above_ground": round(float(cov_above), 3),
        "coverage_below_ground": round(float(cov_below), 3),
    }
    if len(crossings):
        cut = args.frames - 10
        settled = crossings[cross_src < cut]
        frontier = crossings[cross_src >= cut]
        if len(settled):
            out["crossing_settled_cm"] = round(float(np.mean(settled)) * 100, 2)
        if len(frontier):
            out["crossing_frontier_cm"] = round(float(np.mean(frontier)) * 100, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
