"""A/B quality harness: run the full pipeline on a synthetic gate config
under different knob settings and report trajectory + mesh metrics.

Usage:
  python scripts/ab_quality.py [--config configs/synthetic/synthetic_medium.yaml]
      [--variants default gn sum ...] [--seeds 11 13]

Prints one JSON line per (variant, seed) with raw/aligned ATE and mesh
F-score, plus wall-clock. This is the decision artifact for defaults
(track_method, reconcile_mode, coarse_factor) — see docs/PERF.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

VARIANTS = {
    "default": [],
    "sum": ["tpu_specs.reconcile_mode=sum"],
    "gn": ["tpu_specs.track_method=gn"],
    "gn16": ["tpu_specs.track_method=gn", "tpu_specs.track_gn_iterations=16"],
    "coarse_half": ["tpu_specs.coarse_factor=0.5"],
    "const_vel_full": ["tpu_specs.const_vel_full=true"],
    "gn_coarse_half": [
        "tpu_specs.track_method=gn", "tpu_specs.coarse_factor=0.5",
    ],
    "exact": ["tpu_specs.exact_embedding_grads=true"],
    "resample": ["tpu_specs.track_resample_rays=true"],
    "anchor": ["tpu_specs.surface_anchor=1"],
    "anchor8": ["tpu_specs.surface_anchor=8"],
    "band4": ["tpu_specs.band_samples=4"],
    "band8": ["tpu_specs.band_samples=8"],
    "anchor2band4": ["tpu_specs.surface_anchor=2", "tpu_specs.band_samples=4"],
    "support": ["tpu_specs.support_dist=-1"],
    "bias_corr": ["tpu_specs.bias_correction=true"],
}


def run_one(cfg_path, overrides, seed):
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils import evaluation as ev
    from nerfloam_tpu.utils.config import load_config

    cfg = load_config(
        cfg_path, list(overrides) + [f"tpu_specs.seed={seed}"]
    )
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    t0 = time.perf_counter()
    poses = slam.run()
    dt = time.perf_counter() - t0

    est = np.asarray(poses)
    gt = dataset.gt_trajectory()[: len(est)]
    out = {
        "ate_raw_m": round(ev.ate_rmse(est, gt, align=False), 4),
        "ate_aligned_m": round(ev.ate_rmse(est, gt, align=True), 4),
        "n_poses": len(est),
        "wall_s": round(dt, 1),
    }
    try:
        verts, faces = slam.extract_mesh()
        if len(faces):
            from nerfloam_tpu.data.synthetic import surface_samples

            mesh_samples = ev.sample_mesh_surface(verts, faces, 50000)
            gt_samples = surface_samples(dataset.world, 50000, extent=14.0)
            traj = gt[:, :3, 3]

            def near(p, r=14.0):
                d = np.min(
                    np.linalg.norm(p[:, None] - traj[None], axis=-1), axis=1
                )
                return p[d < r]

            m = ev.mesh_metrics(near(mesh_samples), near(gt_samples),
                                f_threshold=0.2)
            out["f_score"] = round(m["f_score"], 4)
            out["chamfer_l1_m"] = round(m["chamfer_l1_m"], 4)
    except Exception as e:  # mesh eval is best-effort in the harness
        out["mesh_error"] = str(e)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/synthetic/synthetic_medium.yaml")
    p.add_argument("--variants", nargs="+", default=["default"])
    p.add_argument("--seeds", nargs="+", type=int, default=[11])
    p.add_argument("--set", action="append", default=[],
                   help="extra overrides applied to every variant")
    args = p.parse_args()

    for name in args.variants:
        ov = VARIANTS[name] + args.set
        for seed in args.seeds:
            res = run_one(args.config, ov, seed)
            print(json.dumps({"variant": name, "seed": seed, **res}),
                  flush=True)


if __name__ == "__main__":
    main()
