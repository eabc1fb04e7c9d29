"""Minimal PCD reader (ASCII and binary), pure numpy.

The reference reads Newer College .pcd files through open3d
(/root/reference/src/dataset/ncd.py:50-52); open3d is not a dependency of
this framework, so we parse the PCD v0.7 format directly.
"""

from __future__ import annotations

import numpy as np


def read_pcd(path: str) -> np.ndarray:
    """Returns (N, 3) float32 xyz points."""
    with open(path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        n_points = 0
        data_mode = "ascii"
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            key = key.upper()
            if key == "FIELDS":
                fields = rest.split()
            elif key == "SIZE":
                sizes = [int(x) for x in rest.split()]
            elif key == "TYPE":
                types = rest.split()
            elif key == "COUNT":
                counts = [int(x) for x in rest.split()]
            elif key == "POINTS":
                n_points = int(rest)
            elif key == "DATA":
                data_mode = rest.strip().lower()
                break
        if not counts:
            counts = [1] * len(fields)
        np_types = {"F": "f", "I": "i", "U": "u"}
        dt = np.dtype(
            [
                (name, f"{np_types[t]}{s}", (c,) if c > 1 else ())
                for name, s, t, c in zip(fields, sizes, types, counts)
            ]
        )
        if data_mode == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n_points)
            idx = {name: i for i, name in enumerate(fields)}
            xyz = rows[:, [idx["x"], idx["y"], idx["z"]]]
        elif data_mode == "binary":
            rec = np.fromfile(f, dt, n_points)
            xyz = np.stack([rec["x"], rec["y"], rec["z"]], -1)
        elif data_mode == "binary_compressed":
            import lzf  # pragma: no cover — not in this image; gate clearly

            raise NotImplementedError("binary_compressed PCD not supported")
        else:
            raise ValueError(f"unknown PCD data mode {data_mode}")
    xyz = xyz.astype(np.float32)
    return xyz[np.all(np.isfinite(xyz), axis=-1)]
