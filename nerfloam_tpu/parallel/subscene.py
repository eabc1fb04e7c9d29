"""Subscene map partitioning: long sequences as a chain of bounded submaps.

The reference offers this only as a non-vendored git branch ("to process it
more fast", /root/reference/Readme.md:97-104): partition the trajectory into
subscenes, run SLAM per subscene, concatenate the meshes. Here it is a
first-class runner. Each subscene gets a fresh lattice map (bounded memory,
bounded region grid) and is initialized from the previous subscene's final
tracked pose, so the trajectory is continuous. Meshes are concatenated with
vertex offsets; trajectories chain directly.

This is also the DP axis for multi-sequence batches (BASELINE.json config 5):
independent subscenes/sequences can run on separate chips with no
communication — launch one process per device or use jax.device_put per
submap.
"""

from __future__ import annotations

import numpy as np

from nerfloam_tpu.core.frame import Frame, pose6_from_matrix_np
from nerfloam_tpu.core.pipeline import NerfLoamSLAM


def run_sequences_parallel(jobs, devices=None):
    """Multi-sequence device-parallel batch (BASELINE.json config 5):
    independent sequences (or subscene chains) run concurrently, one per
    chip, with NO cross-device communication — each pipeline's arrays and
    jitted programs are pinned to its device via jax.default_device, and
    one host thread per sequence keeps every chip's dispatch queue full.

    ``jobs``: list of (cfg, dataset) pairs. Returns a list of
    {"poses": [...], "mesh": (verts, faces)} in job order.
    """
    import concurrent.futures

    import jax

    devices = devices or jax.devices()

    def _one(i, cfg, dataset):
        dev = devices[i % len(devices)]
        with jax.default_device(dev):
            slam = NerfLoamSLAM(cfg, dataset)
            poses = slam.run()
            verts, faces = slam.extract_mesh()
        return {"poses": poses, "mesh": (verts, faces), "device": str(dev)}

    with concurrent.futures.ThreadPoolExecutor(
        max_workers=min(len(jobs), len(devices))
    ) as ex:
        futs = [ex.submit(_one, i, c, d) for i, (c, d) in enumerate(jobs)]
        return [f.result() for f in futs]


class SubsceneRunner:
    def __init__(self, cfg, dataset, logger=None, frames_per_subscene: int = 500):
        self.cfg = cfg
        self.dataset = dataset
        self.logger = logger
        self.frames_per_subscene = frames_per_subscene

    def run(self):
        tspec = self.cfg.tracker_specs
        start = int(tspec.get("start_frame", 0))
        end = int(tspec.get("end_frame", -1))
        stride = int(tspec.get("read_offset", 1))
        n = len(self.dataset)
        if end <= 0:
            end = n - 1
        end = min(end, n - 1)

        all_poses = []
        all_verts, all_faces = [], []
        init_pose = self.dataset.get_init_pose(start)
        sub_idx = 0
        frame_id = start
        while frame_id <= end:
            sub_end = min(frame_id + self.frames_per_subscene - 1, end)
            slam = NerfLoamSLAM(self.cfg, self.dataset, logger=None)

            idx, pts, cos, pose = self.dataset[frame_id]
            first = Frame.from_raw(idx, pts, cos, None, slam.points_pad,
                                   has_gt_pose=pose is not None)
            first.pose6 = pose6_from_matrix_np(init_pose)
            slam.process_first_frame(first)

            for fid in range(frame_id + 1, sub_end + 1):
                if fid % stride != 0:
                    continue
                idx, pts, cos, pose = self.dataset[fid]
                f = Frame.from_raw(idx, pts, cos, pose, slam.points_pad,
                                   has_gt_pose=pose is not None)
                slam.process_frame(f)

            poses = slam.finalize()
            all_poses.extend(poses)
            v, fcs = slam.extract_mesh()
            if len(v):
                offset = sum(len(x) for x in all_verts)
                all_verts.append(v)
                all_faces.append(fcs + offset)

            # chain: next subscene starts at this subscene's last tracked pose
            init_pose = slam.state.last_frame.pose_matrix()
            frame_id = sub_end + 1
            sub_idx += 1
            del slam  # free the submap

        verts = np.concatenate(all_verts) if all_verts else np.zeros((0, 3), np.float32)
        faces = np.concatenate(all_faces) if all_faces else np.zeros((0, 3), np.int32)
        if self.logger is not None:
            self.logger.log_mesh(verts, faces, name="final_mesh_subscenes.ply")
            self.logger.log_numpy_data(np.asarray(all_poses), "frame_poses")
        return all_poses, (verts, faces), sub_idx
