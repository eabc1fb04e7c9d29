"""Voxel map insert/lookup/recenter semantics vs a pure-python octree model.

The python reference model reproduces Octree::insert semantics
(sparse_octree/src/octree.cpp:51-111): every observed voxel is SURFACE, its
8 corner lattice points are allocated, corners are shared between adjacent
voxels, FEATURE points are promoted on direct observation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.ops.interp import CORNER_OFFSETS


CFG = vm.MapConfig(capacity=4096, grid_dim=(64, 64, 64), voxel_size=0.5)


def make_map(center=(0.0, 0.0, 0.0), cfg=CFG):
    m = vm.create(cfg)
    return vm.recenter(m, cfg, jnp.asarray(center, jnp.float32))


def insert(m, pts, cfg=CFG):
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.ones(pts.shape[0], bool)
    return vm.insert_points(m, cfg, pts, valid)


def test_single_point_allocates_8_corners():
    m = make_map()
    m = insert(m, [[0.1, 0.1, 0.1]])
    assert int(m.num_lat) == 8
    snap = vm.surface_snapshot(m)
    assert len(snap["voxel_ids"]) == 1
    np.testing.assert_array_equal(snap["coords"][0], [0, 0, 0])
    # corner 0 is the voxel's own lattice point (octree.cpp find_octant(+0))
    assert snap["corner_idx"][0][0] == snap["voxel_ids"][0]
    # corners distinct
    assert len(set(snap["corner_idx"][0].tolist())) == 8


def test_adjacent_voxels_share_corners():
    m = make_map()
    m = insert(m, [[0.1, 0.1, 0.1], [0.6, 0.1, 0.1]])  # voxels (0,0,0),(1,0,0)
    # 8 + 8 - 4 shared = 12 lattice points
    assert int(m.num_lat) == 12
    snap = vm.surface_snapshot(m)
    assert len(snap["voxel_ids"]) == 2
    c0 = set(snap["corner_idx"][0].tolist())
    c1 = set(snap["corner_idx"][1].tolist())
    assert len(c0 & c1) == 4


def test_duplicate_points_idempotent():
    m = make_map()
    m = insert(m, [[0.1, 0.1, 0.1]] * 50)
    assert int(m.num_lat) == 8
    m2 = insert(m, [[0.1, 0.1, 0.1]])
    assert int(m2.num_lat) == 8
    np.testing.assert_array_equal(np.asarray(m2.corner_idx), np.asarray(m.corner_idx))


def test_insert_cand_compaction_matches_full():
    """cand_cap compaction (single-pass support insert) must produce the
    same map as the uncompacted path when the budget is sufficient, and
    report the true candidate count when it is not."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
    valid = jnp.asarray(rng.random(512) > 0.1)

    m_full = vm.insert_points(make_map(), CFG, jnp.asarray(pts), valid)
    m_cap = vm.insert_points(
        make_map(), CFG, jnp.asarray(pts), valid, cand_cap=448
    )
    n_cand = int(m_full.num_cand)
    assert n_cand <= 448  # budget sufficient for this scene
    assert int(m_cap.num_lat) == int(m_full.num_lat)
    assert int(m_cap.num_cand) == n_cand
    s_full, s_cap = vm.surface_snapshot(m_full), vm.surface_snapshot(m_cap)
    assert set(map(tuple, s_full["coords"])) == set(map(tuple, s_cap["coords"]))
    # same canonical corner-sharing structure (ids may be ordered differently)
    np.testing.assert_array_equal(
        np.asarray(m_full.lat_coords)[: n_cand],
        np.asarray(m_full.lat_coords)[: n_cand],
    )

    # starved budget: num_cand reports the full need, allocation is partial
    m_tiny = vm.insert_points(
        make_map(), CFG, jnp.asarray(pts), valid, cand_cap=8
    )
    assert int(m_tiny.num_cand) == n_cand
    assert len(vm.surface_snapshot(m_tiny)["voxel_ids"]) <= 8
    # re-running with a big enough cap completes the allocation (the
    # pipeline's check_cand_overflow retry path)
    m_retry = vm.insert_points(m_tiny, CFG, jnp.asarray(pts), valid,
                               cand_cap=448)
    s_retry = vm.surface_snapshot(m_retry)
    assert set(map(tuple, s_retry["coords"])) == set(map(tuple, s_full["coords"]))


def test_feature_promotion():
    """A corner lattice point later observed directly becomes SURFACE with
    its own full corner set (octree.cpp:104-105 promotion)."""
    m = make_map()
    m = insert(m, [[0.1, 0.1, 0.1]])
    # corner (1,1,1) of voxel (0,0,0) exists as FEATURE
    lid = vm.lookup(m, CFG, jnp.asarray([[1, 1, 1]], jnp.int32))
    assert int(lid[0]) >= 0
    assert not bool(m.is_surface[int(lid[0])])
    # observe it directly
    m = insert(m, [[0.6, 0.6, 0.6]])
    lid2 = vm.lookup(m, CFG, jnp.asarray([[1, 1, 1]], jnp.int32))
    assert int(lid2[0]) == int(lid[0])  # same lattice row — promoted, not new
    assert bool(m.is_surface[int(lid2[0])])
    snap = vm.surface_snapshot(m)
    assert len(snap["voxel_ids"]) == 2


def test_matches_python_octree_model():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, size=(500, 3)).astype(np.float32)
    m = make_map()
    m = insert(m, pts)

    # python model
    vox = np.unique(np.floor(pts / CFG.voxel_size).astype(int), axis=0)
    lattice = set()
    for v in vox:
        for off in CORNER_OFFSETS:
            lattice.add(tuple(v + off))
    assert int(m.num_lat) == len(lattice)
    snap = vm.surface_snapshot(m)
    got_vox = set(map(tuple, snap["coords"].tolist()))
    assert got_vox == set(map(tuple, vox.tolist()))
    # every corner id resolves to the right lattice coord
    lat = np.asarray(m.lat_coords)
    for i, v in enumerate(snap["coords"]):
        corner_coords = lat[snap["corner_idx"][i]]
        np.testing.assert_array_equal(corner_coords, v + CORNER_OFFSETS)


def test_negative_coords():
    m = make_map()
    m = insert(m, [[-3.2, -0.1, -7.9]])
    snap = vm.surface_snapshot(m)
    np.testing.assert_array_equal(
        snap["coords"][0], np.floor(np.array([-3.2, -0.1, -7.9]) / 0.5)
    )


def test_recenter_preserves_lookup():
    m = make_map()
    m = insert(m, [[0.1, 0.1, 0.1], [3.0, 3.0, 3.0]])
    before = vm.lookup(m, CFG, jnp.asarray([[0, 0, 0], [6, 6, 6]], jnp.int32))
    m2 = vm.recenter(m, CFG, jnp.asarray([2.0, 2.0, 2.0], jnp.float32))
    after = vm.lookup(m2, CFG, jnp.asarray([[0, 0, 0], [6, 6, 6]], jnp.int32))
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_out_of_region_points_dropped():
    m = make_map()
    m = insert(m, [[1000.0, 0.0, 0.0]])  # far outside the 64-cell region
    assert int(m.num_lat) == 0


def test_overflow_then_grow_recovers():
    small = vm.MapConfig(capacity=20, grid_dim=(64, 64, 64), voxel_size=0.5)
    m = make_map(cfg=small)
    pts = np.array([[i * 0.6, 0.1, 0.1] for i in range(8)], np.float32)  # ~32 lattice pts
    m1 = vm.insert_points(m, small, jnp.asarray(pts), jnp.ones(8, bool))
    assert vm.overflowed(m1, small)
    # grow and re-run the same insert — must converge to the full set
    m2, cfg2 = vm.grow(m1, small, 4096)
    m2 = vm.insert_points(m2, cfg2, jnp.asarray(pts), jnp.ones(8, bool))
    assert not vm.overflowed(m2, cfg2)
    snap = vm.surface_snapshot(m2)
    assert len(snap["voxel_ids"]) == 8
    # all corner sets complete and consistent
    lat = np.asarray(m2.lat_coords)
    for i, v in enumerate(snap["coords"]):
        np.testing.assert_array_equal(lat[snap["corner_idx"][i]], v + CORNER_OFFSETS)


def test_insert_jits_and_caches():
    m = make_map()
    f = jax.jit(vm.insert_points, static_argnums=1)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (64, 3)), jnp.float32)
    m1 = f(m, CFG, pts, jnp.ones(64, bool))
    m2 = f(m1, CFG, pts, jnp.ones(64, bool))
    assert int(m1.num_lat) == int(m2.num_lat)
