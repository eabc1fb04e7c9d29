"""KITTI odometry dataset (velodyne .bin scans).

Equivalent of /root/reference/src/dataset/kitti.py: float32 (N,4) .bin
scans, z > -3 m outlier drop (kitti.py:44-45), min/max range filter,
ground segmentation with normal cosines, GT poses from poses_lidar.txt.
"""

from __future__ import annotations

import os.path as osp
from glob import glob

import numpy as np

from nerfloam_tpu.data.base import LidarDataset


class DataLoader(LidarDataset):
    pose_file = "poses_lidar.txt"
    z_min = -3.0  # kitti.py:44-45 outlier drop, applied by base __getitem__

    def __init__(self, data_path, use_gt=False, max_depth=-1, min_depth=-1):
        self.num_bin = len(glob(osp.join(data_path, "velodyne/*.bin")))
        super().__init__(data_path, use_gt, max_depth, min_depth)

    def read_scan(self, index: int) -> np.ndarray:
        path = osp.join(self.data_path, "velodyne/{:06d}.bin".format(index))
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    def __len__(self):
        return self.num_bin
