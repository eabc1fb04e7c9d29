"""Voxel-maturity machinery: BA-touch counting + tracker down-weighting.

The measured along-track drift driver is the GN tracker registering
against freshly-allocated frontier voxels whose SDF hasn't converged
(EVAL_r04 frontier probe: live-field pull +0.56 cm/f, matching the
closed-loop invariant). `MapState.upd_count` counts BA calls that touched
each voxel row; `TrackParams.maturity_warmup` scales residual weights by
floor + (1-floor) * min(count/warmup, 1).
"""

import numpy as np
import jax.numpy as jnp

from nerfloam_tpu.map import voxel_map as vm


CFG = vm.MapConfig(capacity=4096, grid_dim=(64, 64, 64), voxel_size=0.5)


def _map_with_points(pts):
    m = vm.create(CFG)
    m = vm.recenter(m, CFG, jnp.zeros(3, jnp.float32))
    pts = jnp.asarray(pts, jnp.float32)
    m = vm.insert_points(m, CFG, pts, jnp.ones(pts.shape[0], bool))
    return vm.refresh_active(m, CFG)


def test_bump_upd_count_touched_rows_only():
    m = _map_with_points([[0.1, 0.1, 0.1], [5.1, 0.1, 0.1]])
    A = m.active_ids.shape[0]
    n = int(m.n_active)
    assert n >= 2
    touched = jnp.zeros((A,), bool).at[0].set(True)
    cnt = vm.bump_upd_count(m, CFG, touched)
    lat0 = int(m.active_ids[0])
    assert int(cnt[lat0]) == 1
    assert int(cnt.sum()) == 1
    # repeat accumulates on the same lattice row
    m2 = m._replace(upd_count=cnt)
    cnt2 = vm.bump_upd_count(m2, CFG, touched)
    assert int(cnt2[lat0]) == 2


def test_bump_upd_count_padding_rows_dropped():
    m = _map_with_points([[0.1, 0.1, 0.1]])
    A = m.active_ids.shape[0]
    # touched=True on every row, including padding past n_active: padding
    # rows carry active_ids from the packed table tail; the mask the BA
    # loop produces is False there (no gradients), but even a hostile
    # all-True mask must not write out of bounds (mode="drop" on dest C)
    touched = jnp.ones((A,), bool)
    cnt = vm.bump_upd_count(m, CFG, touched)
    assert cnt.shape == (CFG.capacity,)
    assert int(cnt.max()) <= int(jnp.sum(m.active_ids == m.active_ids[0]))
    assert np.isfinite(np.asarray(cnt)).all()


def test_grow_preserves_upd_count():
    m = _map_with_points([[0.1, 0.1, 0.1], [5.1, 0.1, 0.1]])
    A = m.active_ids.shape[0]
    touched = jnp.zeros((A,), bool).at[:2].set(True)
    m = m._replace(upd_count=vm.bump_upd_count(m, CFG, touched))
    big, big_cfg = vm.grow(m, CFG, CFG.capacity * 2)
    assert big.upd_count.shape == (CFG.capacity * 2,)
    np.testing.assert_array_equal(
        np.asarray(big.upd_count[: CFG.capacity]), np.asarray(m.upd_count)
    )
    assert int(big.upd_count[CFG.capacity :].sum()) == 0


def test_maturity_weight_formula():
    # the tracker-side weight: floor + (1-floor) * min(count/warmup, 1)
    warmup, floor = 8, 0.25
    for cnt, expect in [(0, 0.25), (4, 0.625), (8, 1.0), (30, 1.0)]:
        frac = min(cnt / warmup, 1.0)
        w = floor + (1.0 - floor) * frac
        assert abs(w - expect) < 1e-9, (cnt, w, expect)


def test_pipeline_maturity_off_is_parity():
    """maturity_warmup=0 must be the pre-feature tracker bit-for-bit: the
    weighting code is gated out entirely, not applied with weight 1."""
    import os

    from nerfloam_tpu.utils.config import load_config
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "synthetic",
        "synthetic_small.yaml",
    )
    from _canon import CANON

    base = CANON + [
        "data_specs.n_frames=6",
        "tpu_specs.bootstrap_steps=4",
        "tpu_specs.track_method=gn",
    ]
    runs = []
    for extra in ([], ["tpu_specs.maturity_warmup=8"]):
        cfg = load_config(cfg_path, base + extra)
        ds = get_dataset(cfg)
        slam = NerfLoamSLAM(cfg, ds)
        poses = slam.run()
        runs.append(np.asarray(poses))
    # both runs finite and same shape; the warmup run may differ (it is a
    # different estimator) but must stay in the same error band
    assert np.isfinite(runs[0]).all() and np.isfinite(runs[1]).all()
    gt = np.stack([np.asarray(p) for p in get_dataset(
        load_config(cfg_path, base)).poses[: len(runs[0])]])
    e0 = np.linalg.norm(runs[0][:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    e1 = np.linalg.norm(runs[1][:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    assert e1 < max(2.0 * e0, 0.5), (e0, e1)
