"""KITTI-statistics replica evaluation: tracked ATE + SHINE-protocol mesh
quality on the corridor world (VERDICT r2 item 1 — the parity anchor in a
container with no real KITTI bits).

Usage:
  python scripts/eval_replica.py --config configs/synthetic/kitti_replica.yaml \
      [--set k=v ...] [--out EVAL_r02.md]

Mesh protocol: the mesh is built in the ESTIMATED frame, so before scoring
it is brought into the GT frame with the trajectory's Umeyama transform
(drift beyond a rigid transform still penalizes the score, as in any
odometry-built map). GT surface samples come from the analytic world,
restricted to the observed corridor; both clouds are cropped to the
near-trajectory region. f_score uses a 0.2 m threshold (SHINE's NCD
setting; voxel_size here is 0.3-0.4 m).
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


def observed_gt_cloud(dataset, stride: int = 4, per_frame: int = 6000,
                      voxel: float = 0.05, seed: int = 0):
    """Observed-surface GT: the dataset's own exact (noise-free) scan points
    at GT poses, accumulated and voxel-downsampled. This is what a
    survey-grade GT cloud covers in the real-data protocol — surfaces no
    scan ever saw (facade tops, far faces) are not legitimate completeness
    targets for a LiDAR map."""
    import numpy as np

    from nerfloam_tpu.map.mesher import downsample_points

    rng = np.random.default_rng(seed)
    gt = dataset.gt_trajectory()
    clouds = []
    for i in range(0, len(dataset), stride):
        _, pts, _, _ = dataset[i]
        if len(pts) > per_frame:
            pts = pts[rng.choice(len(pts), per_frame, replace=False)]
        T = gt[i]
        clouds.append(pts @ T[:3, :3].T + T[:3, 3])
    return downsample_points(
        np.concatenate(clouds).astype(np.float32), voxel
    )


def run_eval(cfg_path: str, overrides=None, mesh_samples_n: int = 200000,
             f_threshold: float = 0.2, crop_radius: float = 25.0,
             dump_traj: str | None = None):
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils import evaluation as ev
    from nerfloam_tpu.utils.config import load_config

    cfg = load_config(cfg_path, overrides or [])
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    t0 = time.perf_counter()
    poses = slam.run()
    wall = time.perf_counter() - t0

    est = np.asarray(poses)
    gt = dataset.gt_trajectory()[: len(est)]
    if dump_traj:
        # telemetry: (frame_index, hit_ratio, track_loss, surface_bias) per
        # tracked frame — divergence forensics for seed-fragility analysis
        tele = np.asarray(slam.state.frame_telemetry, np.float64).reshape(-1, 4)
        ba_d = np.asarray(
            slam.state.ba_delta_telemetry, np.float64
        ).reshape(-1, 4)
        np.savez(dump_traj, est=est, gt=gt, telemetry=tele, ba_delta=ba_d)
    out = {
        "n_frames": len(est),
        "wall_s": round(wall, 1),
        "scans_per_sec": round(len(est) / wall, 3),
        "ate_raw_m": round(ev.ate_rmse(est, gt, align=False), 4),
        "ate_aligned_m": round(ev.ate_rmse(est, gt, align=True), 4),
        # machine-visible overflow accounting (VERDICT r4 item 2): growth
        # events are lossless (grow + replay) but flag mis-sized budgets;
        # dropped_delta_events > 0 is a correctness defect and gated in CI
        "growth_events": int(sum(slam.overflow_events.values())),
        "overflow_events": {k: int(v) for k, v in slam.overflow_events.items()},
        "dropped_delta_events": int(slam.dropped_delta_events),
    }
    # per-frame drift rates (scripts/traj_decompose.py decomposition): these
    # are rate quantities, so unlike ATE they discriminate drift-class
    # regressions even at short horizons — the micro CI gate keys on them
    rel_e = np.linalg.inv(est[:-1]) @ est[1:]
    rel_g = np.linalg.inv(gt[:-1]) @ gt[1:]
    diff = rel_e[:, :3, 3] - rel_g[:, :3, 3]
    fwd = rel_g[:, :3, 3] / (
        np.linalg.norm(rel_g[:, :3, 3], axis=1, keepdims=True) + 1e-9
    )
    along = np.einsum("ij,ij->i", diff, fwd)
    lat = np.linalg.norm(diff - along[:, None] * fwd, axis=1)
    yaw_e = np.arctan2(rel_e[:, 1, 0], rel_e[:, 0, 0])
    yaw_g = np.arctan2(rel_g[:, 1, 0], rel_g[:, 0, 0])
    out.update({
        "drift_along_cm_f": round(float(along.mean()) * 100, 4),
        "drift_lat_cm_f": round(float(lat.mean()) * 100, 4),
        "drift_z_cm_f": round(float((diff[:, 2]).mean()) * 100, 4),
        "drift_yaw_deg_f": round(
            float(np.degrees(yaw_e - yaw_g).mean()), 5
        ),
    })
    # current-frame BA pose-refinement rates (pipeline.ba_delta_telemetry):
    # the estimated trajectory records the BA-refined pose, so a systematic
    # mean here is drift injected per frame by the BA step — the component
    # the open-loop tracker probes cannot see
    ba_d = np.asarray(slam.state.ba_delta_telemetry, np.float64).reshape(-1, 4)
    if len(ba_d):
        out.update({
            "ba_along_cm_f": round(float(ba_d[:, 1].mean()) * 100, 4),
            "ba_lat_cm_f": round(float(ba_d[:, 2].mean()) * 100, 4),
            "ba_z_cm_f": round(float(ba_d[:, 3].mean()) * 100, 4),
            "ba_along_cm_std": round(float(ba_d[:, 1].std()) * 100, 4),
        })

    # SHINE-protocol mesh eval: faces culled against the observed keyframe
    # cloud (clean_mesh), mesh brought into the GT frame by the trajectory
    # Umeyama transform, scored against observed-surface GT
    verts, faces = slam.extract_mesh(clean=True)
    out["mesh_verts"] = int(len(verts))
    if len(faces):
        mesh_pts = ev.sample_mesh_surface(verts, faces, mesh_samples_n)
        R, t = ev.umeyama_transform(est[:, :3, 3], gt[:, :3, 3])
        mesh_pts = mesh_pts @ R.T + t
        gt_pts = observed_gt_cloud(dataset)
        m = ev.mesh_metrics(mesh_pts, gt_pts, f_threshold=f_threshold)
        out.update({k: round(v, 4) for k, v in m.items()})
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/synthetic/kitti_replica.yaml")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--out", default=None, help="write a markdown report here")
    p.add_argument("--f-threshold", type=float, default=0.2)
    p.add_argument("--dump-traj", default=None,
                   help="save est+gt trajectories to this .npz")
    args = p.parse_args()

    res = run_eval(args.config, args.set, f_threshold=args.f_threshold,
                   dump_traj=args.dump_traj)
    print(json.dumps(res, indent=2))
    if args.out:
        lines = [
            "# KITTI-statistics replica evaluation",
            "",
            f"Config: `{args.config}`" + (f" + `{args.set}`" if args.set else ""),
            f"Date: {time.strftime('%Y-%m-%d')}",
            "",
            "| Metric | Value |",
            "|---|---|",
        ]
        for k, v in res.items():
            lines.append(f"| {k} | {v} |")
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
