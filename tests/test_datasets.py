"""Dataset loaders against real on-disk file formats (synthetic fixtures).

The reference loaders were only smoke-testable with hard-coded local paths
(SURVEY §4); here each format — KITTI velodyne .bin, MaiCity .bin, NCD .pcd
(ascii + binary) — is written as a fixture and read back through the public
DataLoader contract: (index, points (N,3) f32, cos (N,), pose|None).
"""

import os

import numpy as np
import pytest


def _scan_cloud(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    az = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(3.0, 30.0, n)
    z = rng.uniform(-1.5, 3.0, n)
    pts = np.stack([r * np.cos(az), r * np.sin(az), z], -1).astype(np.float32)
    # a ground disc so segmentation has something to find
    gr = rng.uniform(2.0, 25.0, n // 2)
    ga = rng.uniform(0, 2 * np.pi, n // 2)
    ground = np.stack(
        [gr * np.cos(ga), gr * np.sin(ga), np.full(n // 2, -1.7, np.float32)], -1
    ).astype(np.float32)
    return np.concatenate([pts, ground])


def _kitti_pose_rows(k):
    rows = []
    for i in range(k):
        T = np.eye(4)
        T[0, 3] = i * 1.5
        rows.append(T[:3].reshape(-1))
    return np.stack(rows)


@pytest.fixture()
def kitti_dir(tmp_path):
    d = tmp_path / "seq"
    (d / "velodyne").mkdir(parents=True)
    for i in range(3):
        pts = _scan_cloud(seed=i)
        arr = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], -1)
        arr.astype(np.float32).tofile(d / "velodyne" / f"{i:06d}.bin")
    np.savetxt(d / "poses_lidar.txt", _kitti_pose_rows(3))
    return str(d)


def test_kitti_loader(kitti_dir):
    from nerfloam_tpu.data.kitti import DataLoader

    ds = DataLoader(kitti_dir, use_gt=True, max_depth=25.0, min_depth=2.5)
    assert len(ds) == 3
    idx, pts, cos, pose = ds[1]
    assert idx == 1 and pts.dtype == np.float32 and pts.shape[1] == 3
    norms = np.linalg.norm(pts, axis=-1)
    assert norms.max() < 25.0 and norms.min() > 2.5
    assert (pts[:, 2] > -3.0).all()  # kitti z-outlier drop
    assert cos.shape == (len(pts),) and (cos > 0).all() and (cos <= 1.0 + 1e-6).all()
    # ground points get grazing-angle cosines < 1
    assert (cos < 0.999).sum() > 100
    np.testing.assert_allclose(pose[0, 3], 1.5, atol=1e-6)
    np.testing.assert_allclose(ds.get_init_pose(0), np.eye(4), atol=1e-6)


def test_maicity_loader(tmp_path):
    from nerfloam_tpu.data.maicity import DataLoader

    d = tmp_path / "01"
    (d / "velodyne").mkdir(parents=True)
    for i in range(2):
        pts = _scan_cloud(seed=i + 5)
        arr = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], -1)
        arr.astype(np.float32).tofile(d / "velodyne" / f"{i:05d}.bin")
    np.savetxt(d / "poses.txt", _kitti_pose_rows(2))
    ds = DataLoader(str(d), use_gt=True, max_depth=40.0, min_depth=1.0)
    assert len(ds) == 2
    idx, pts, cos, pose = ds[0]
    assert len(pts) > 1000 and pose.shape == (4, 4)


def _lzf_compress_literal(data: bytes) -> bytes:
    """Valid (if uncompressive) libLZF stream: literal runs of <= 32 bytes."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def _write_pcd(path, pts, mode):
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {len(pts)}\nDATA {mode}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if mode == "binary":
            f.write(pts.astype("<f4").tobytes())
        elif mode == "binary_compressed":
            import struct

            # field-major (all x, all y, all z), as PCL writes it
            soa = np.ascontiguousarray(pts.astype("<f4").T).tobytes()
            blob = _lzf_compress_literal(soa)
            f.write(struct.pack("<II", len(blob), len(soa)))
            f.write(blob)
        else:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n".encode())


@pytest.mark.parametrize(
    "binary", ["ascii", "binary", "binary_compressed"]
)
def test_ncd_loader(tmp_path, binary):
    from nerfloam_tpu.data.ncd import DataLoader

    d = tmp_path / "quad"
    (d / "pcd").mkdir(parents=True)
    pts0 = _scan_cloud(seed=9)
    # NCD filenames carry the +500 index offset (ncd.py:50)
    _write_pcd(d / "pcd" / "00500.pcd", pts0, binary)
    ds = DataLoader(str(d), use_gt=False, max_depth=50.0, min_depth=1.0)
    assert len(ds) == 1
    idx, pts, cos, pose = ds[0]
    assert pose is None
    assert len(pts) > 1000
    # hard-coded init pose when no GT (ncd.py:34-37)
    init = ds.get_init_pose(0)
    assert abs(init[1, 3] - 3.667865561670570873) < 1e-6


def test_pcd_roundtrip(tmp_path):
    from nerfloam_tpu.data.pcd_io import read_pcd

    pts = _scan_cloud(n=100, seed=1)[:100]
    for mode in ("ascii", "binary", "binary_compressed"):
        p = tmp_path / f"x_{mode}.pcd"
        _write_pcd(p, pts, mode)
        back = read_pcd(str(p))
        np.testing.assert_allclose(back, pts, atol=1e-4)


def test_lzf_decompress_backrefs():
    """Exercise every libLZF opcode class: literals, short/extended-length
    back references, overlapping (RLE) and non-overlapping copies."""
    from nerfloam_tpu.data.pcd_io import lzf_decompress

    # literal "abc" + overlapping backref dist 3 len 6 -> "abcabcabc"
    stream = bytes([2]) + b"abc" + bytes([(4 << 5) | 0, 2])
    assert lzf_decompress(stream, 9) == b"abcabcabc"

    # extended length (ctrl>>5 == 7): literal 8 bytes + backref len 7+3+2=12
    stream = bytes([7]) + b"01234567" + bytes([(7 << 5) | 0, 3, 7])
    assert lzf_decompress(stream, 20) == b"01234567" + b"01234567"[:8] + b"0123"

    # non-overlapping copy: 8 literals, backref dist 8 len 4 (bulk path)
    stream = bytes([7]) + b"abcdwxyz" + bytes([(2 << 5) | 0, 7])
    assert lzf_decompress(stream, 12) == b"abcdwxyzabcd"

    # corrupt: reference before stream start
    with pytest.raises(ValueError):
        lzf_decompress(bytes([0]) + b"a" + bytes([(2 << 5) | 0, 200]), 5)
