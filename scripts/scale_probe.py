"""Structural scale probe: run N frames (GT poses by default) and log the
machinery the long-horizon runs exercise — capacity-tier growth, region
recenters far from the origin, keyframe-list growth, per-frame wall as the
map grows — then extract + score the final mesh (VERDICT r2 item 2's
"no structural failure" half; wall-clock-at-budget is the chip run's job).

Usage:
  python scripts/scale_probe.py --frames 2000 [--budget micro|ci]
      [--track] [--set k=v ...]
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

MICRO = [
    "data_specs.n_beams=32",
    "data_specs.n_azimuth=256",
    "tracker_specs.N_rays=512",
    "tracker_specs.num_iterations=12",
    "mapper_specs.N_rays_each=512",
    "mapper_specs.num_iterations=12",
    "tpu_specs.track_samples=48",
    "tpu_specs.map_samples=32",
    "tpu_specs.points_pad=16384",
    "tpu_specs.kf_points_pad=16384",
    "tpu_specs.map_capacity=524288",
    "tpu_specs.active_cap=131072",
    "tpu_specs.touched_cap=131072",
    "tpu_specs.bootstrap_steps=6",
    "tpu_specs.sampler=grid",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=2000)
    p.add_argument("--budget", choices=["micro", "ci"], default="micro")
    p.add_argument("--track", action="store_true",
                   help="track poses (default: GT poses, no tracking)")
    p.add_argument("--config",
                   default=os.path.join("configs", "synthetic",
                                        "kitti_replica_ci.yaml"),
                   help="base config (use kitti_replica.yaml + --budget ci "
                        "for the full-budget chip run)")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--report-every", type=int, default=50)
    p.add_argument("--json-out", default=None)
    p.add_argument("--dump-traj", default=None,
                   help="save est+gt trajectories to this .npz")
    args = p.parse_args()

    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils import evaluation as ev
    from nerfloam_tpu.utils.config import load_config

    overrides = (MICRO if args.budget == "micro" else []) + [
        f"data_specs.n_frames={args.frames}",
        f"data_specs.use_gt={not args.track}",
    ] + args.set
    cfg = load_config(args.config, overrides)
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)

    from nerfloam_tpu.core.frame import Frame
    from nerfloam_tpu.data.prefetch import PrefetchingLoader

    t0 = time.perf_counter()
    t_prev = t0
    # frame loop with periodic structural telemetry (mirrors slam.run())
    init_pose = dataset.get_init_pose(0)
    idx, pts, cos, pose = dataset[0]
    slam.process_first_frame(Frame.from_raw(
        idx, pts, cos, init_pose, slam.points_pad,
        has_gt_pose=pose is not None,
    ))
    done = 0
    for frame_id, (idx, pts, cos, pose) in PrefetchingLoader(
        dataset, list(range(1, len(dataset)))
    ):
        slam.process_frame(Frame.from_raw(
            idx, pts, cos, pose, slam.points_pad,
            has_gt_pose=pose is not None,
        ))
        done += 1
        if done % args.report_every == 0:
            now = time.perf_counter()
            st = slam.state
            pos = st.keyframes[-1].pose6[:3] if st.keyframes else [0, 0, 0]
            print(json.dumps({
                "frame": done,
                "s_per_frame": round((now - t_prev) / args.report_every, 2),
                "capacity": slam.map_cfg.capacity,
                "num_lat": int(st.map_state.num_lat),
                "keyframes": len(st.keyframes),
                "dist_from_origin_m": round(float(np.linalg.norm(pos)), 1),
            }), flush=True)
            t_prev = now
    poses = slam.finalize()
    wall = time.perf_counter() - t0

    est = np.asarray(poses)
    gt = dataset.gt_trajectory()[: len(est)]
    ba_d = np.asarray(slam.state.ba_delta_telemetry, np.float64).reshape(-1, 4)
    if args.dump_traj:
        tele = np.asarray(slam.state.frame_telemetry, np.float64).reshape(-1, 4)
        np.savez(args.dump_traj, est=est, gt=gt, telemetry=tele, ba_delta=ba_d)
    out = {
        "n_frames": len(est),
        "wall_s": round(wall, 1),
        "scans_per_sec": round(len(est) / wall, 3),
        "ate_raw_m": round(ev.ate_rmse(est, gt, align=False), 4),
        "ate_aligned_m": round(ev.ate_rmse(est, gt, align=True), 4),
        "final_capacity": slam.map_cfg.capacity,
        "final_num_lat": int(slam.state.map_state.num_lat),
        "keyframes": len(slam.state.keyframes),
        "growth_events": int(sum(slam.overflow_events.values())),
        "overflow_events": {k: int(v) for k, v in slam.overflow_events.items()},
        "dropped_delta_events": int(slam.dropped_delta_events),
    }
    if len(ba_d):
        out.update({
            "ba_along_cm_f": round(float(ba_d[:, 1].mean()) * 100, 4),
            "ba_lat_cm_f": round(float(ba_d[:, 2].mean()) * 100, 4),
            "ba_z_cm_f": round(float(ba_d[:, 3].mean()) * 100, 4),
        })
    t_mesh = time.perf_counter()
    verts, faces = slam.extract_mesh(clean=True)
    out["mesh_verts"] = int(len(verts))
    out["mesh_extract_s"] = round(time.perf_counter() - t_mesh, 1)
    # SHINE-protocol mesh scoring, same as scripts/eval_replica.py
    if len(faces):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from eval_replica import observed_gt_cloud

        mesh_pts = ev.sample_mesh_surface(verts, faces, 200000)
        R, t = ev.umeyama_transform(est[:, :3, 3], gt[:, :3, 3])
        mesh_pts = mesh_pts @ R.T + t
        gt_pts = observed_gt_cloud(dataset)
        m = ev.mesh_metrics(mesh_pts, gt_pts, f_threshold=0.2)
        out.update({k: round(v, 4) for k, v in m.items()})
    print(json.dumps(out), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
