"""Native C++ preprocessing vs the numpy reference implementation."""

import numpy as np
import pytest

from nerfloam_tpu import native
from nerfloam_tpu.data.ground import segment_ground


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _scene(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(2, 25, n)
    ground = np.stack(
        [r * np.cos(ang), r * np.sin(ang), np.full(n, -1.7) + rng.normal(0, 0.02, n)],
        -1,
    )
    wall = np.stack(
        [np.full(800, 9.0), rng.uniform(-6, 6, 800), rng.uniform(-1.5, 3.0, 800)], -1
    )
    return np.concatenate([ground, wall]).astype(np.float32), n


def test_ground_seg_matches_numpy(lib):
    pts, n = _scene()
    res = native.segment_ground_native(pts)
    assert res is not None
    mask_c, cos_c = res
    mask_py, cos_py = segment_ground(pts)
    # both implementations find the ground and reject the wall
    assert mask_c[:n].mean() > 0.8
    assert mask_c[n:].mean() < 0.3
    agree = (mask_c == mask_py).mean()
    assert agree > 0.9, agree
    both = mask_c & mask_py
    np.testing.assert_allclose(cos_c[both], cos_py[both], atol=0.05)


def test_filter_scan(lib):
    rng = np.random.default_rng(1)
    scan = rng.uniform(-50, 50, (10000, 4)).astype(np.float32)
    out = native.filter_scan_native(scan, z_min=-3.0, min_d=5.0, max_d=40.0)
    assert out is not None
    d = np.linalg.norm(out, axis=-1)
    assert (out[:, 2] > -3.0).all()
    assert (d > 5.0).all() and (d < 40.0).all()
    # matches numpy filter
    m = (
        (scan[:, 2] > -3.0)
        & (np.linalg.norm(scan[:, :3], axis=-1) > 5.0)
        & (np.linalg.norm(scan[:, :3], axis=-1) < 40.0)
    )
    assert len(out) == m.sum()
    np.testing.assert_allclose(out, scan[m][:, :3])
