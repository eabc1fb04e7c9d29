"""Inverse-CDF sampler: contract + statistical parity with the dense sampler.

The reference distributes samples proportionally to in-voxel path length
(sample_gpu.cu:133-239). sample_rays_cdf must (a) only emit samples inside
surface voxels, depth-sorted, (b) allocate sample counts across occupied
segments proportionally to their marched length, (c) agree with the dense
jittered-grid sampler on which rays hit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.ops.raycast import RaycastConfig, sample_along_rays, sample_rays_cdf

VS = 0.5
MAX_DEPTH = 12.0
MAP_CFG = vm.MapConfig(capacity=1 << 14, grid_dim=(64, 64, 32), voxel_size=VS)
RC = RaycastConfig(
    step_world=0.25 * VS,
    n_slots=int(MAX_DEPTH / (0.25 * VS)) + 1,
    n_samples=48,
    voxel_size=VS,
    max_depth=MAX_DEPTH,
)


def build_wall_map():
    """Two slabs of surface voxels crossing +x rays: x in [4,5) and [8,10)."""
    m = vm.create(MAP_CFG)
    m = vm.recenter(m, MAP_CFG, jnp.zeros(3, jnp.float32))
    xs = []
    for xlo, xhi in ((4.0, 5.0), (8.0, 10.0)):
        gx = np.arange(xlo, xhi, VS)
        for x in gx:
            yy, zz = np.meshgrid(np.arange(-2, 2, VS), np.arange(-2, 2, VS))
            pts = np.stack(
                [np.full(yy.size, x + 0.25), yy.ravel() + 0.25, zz.ravel() + 0.25], -1
            )
            xs.append(pts)
    pts = np.concatenate(xs).astype(np.float32)
    pad = 1 << 13
    buf = np.zeros((pad, 3), np.float32)
    val = np.zeros((pad,), bool)
    buf[: len(pts)] = pts[:pad]
    val[: len(pts)] = True
    m = vm.insert_points(m, MAP_CFG, jnp.asarray(buf), jnp.asarray(val))
    assert not vm.overflowed(m, MAP_CFG)
    return vm.refresh_active(m, MAP_CFG)


def rays_along_x(R=64):
    o = np.zeros((R, 3), np.float32)
    o[:, 1] = np.linspace(-1.5, 1.5, R)
    o[:, 2] = 0.3
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (R, 1))
    t_cap = np.full((R,), MAX_DEPTH, np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_cap)


def test_cdf_sampler_contract():
    m = build_wall_map()
    o, d, t_cap = rays_along_x()
    z, lid, valid, ray_mask = sample_rays_cdf(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(0)
    )
    z, lid, valid, ray_mask = map(np.asarray, (z, lid, valid, ray_mask))
    assert ray_mask.all()
    assert valid.any(axis=1).all()
    # all valid samples reference active surface voxels
    assert (lid[valid] >= 0).all()
    lat_ids = np.asarray(m.active_ids)[lid[valid]]
    assert np.asarray(m.is_surface)[lat_ids].all()
    # depth-sorted per ray (among valid entries)
    for r in range(0, z.shape[0], 7):
        zz = z[r][valid[r]]
        assert (np.diff(zz) >= -1e-5).all()
    # samples only inside the two slabs (x = z since rays go +x from x=0)
    x = z[valid]
    in_slab = ((x > 4.0 - VS) & (x < 5.0 + VS)) | ((x > 8.0 - VS) & (x < 10.0 + VS))
    assert in_slab.all()


def test_cdf_sampler_density_proportional_to_path_length():
    m = build_wall_map()
    o, d, t_cap = rays_along_x()
    z, lid, valid, _ = sample_rays_cdf(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(1)
    )
    z, valid = np.asarray(z), np.asarray(valid)
    x = z[valid]
    n1 = ((x > 3.5) & (x < 5.5)).sum()  # ~1 m slab
    n2 = ((x > 7.5) & (x < 10.5)).sum()  # ~2 m slab
    ratio = n2 / max(n1, 1)
    assert 1.6 < ratio < 2.5, f"expected ~2x samples in 2x-long slab, got {ratio}"


def test_cdf_matches_dense_sampler_hits():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(32)
    _, _, v_cdf, rm_cdf = sample_rays_cdf(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(2)
    )
    _, _, v_dense, rm_dense = sample_along_rays(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(2)
    )
    assert (np.asarray(rm_cdf) == np.asarray(rm_dense)).all()
    # both samplers put comparable mass on each ray
    c1 = np.asarray(v_cdf).sum(1)
    c2 = np.asarray(v_dense).sum(1)
    assert (c1 > 0).all() and (c2 > 0).all()


def test_cdf_sampler_respects_t_cap():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(16)
    t_cap = jnp.full_like(t_cap, 6.0)  # exclude the far slab
    z, _, valid, ray_mask = sample_rays_cdf(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(3)
    )
    z, valid = np.asarray(z), np.asarray(valid)
    assert np.asarray(ray_mask).all()  # near slab still hit
    assert (z[valid] <= 6.0 + 1e-5).all()


def test_cdf_sampler_miss_ray():
    m = build_wall_map()
    o = jnp.asarray(np.array([[0.0, 0.0, 8.0]], np.float32))  # above the slabs
    d = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))
    t_cap = jnp.full((1,), MAX_DEPTH, jnp.float32)
    z, lid, valid, ray_mask = sample_rays_cdf(
        m, MAP_CFG, RC, o, d, t_cap, jax.random.key(4)
    )
    assert not bool(ray_mask[0])
    assert not np.asarray(valid).any()


def test_ray_intersect_exact_bounds():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(16)
    from nerfloam_tpu.ops.raycast import ray_intersect, ray_sample

    aid, tn, tf, hit = ray_intersect(m, MAP_CFG, RC, o, d, max_hits=20)
    aid, tn, tf, hit = map(np.asarray, (aid, tn, tf, hit))
    assert hit.all()
    got = aid >= 0
    # exact AABB bounds: entry/exit x of the hit voxel (rays go +x from x=0)
    coords = np.asarray(m.active_coords)
    for r in range(16):
        for h in np.nonzero(got[r])[0]:
            x0 = coords[aid[r, h], 0] * VS
            assert abs(tn[r, h] - x0) < 1e-4, (tn[r, h], x0)
            assert abs(tf[r, h] - (x0 + VS)) < 1e-4
        # depth-sorted
        tns = tn[r][got[r]]
        assert (np.diff(tns) > 0).all()
    # slabs are 2 + 4 voxels thick along x -> 6 hits per ray
    assert (got.sum(axis=1) == 6).all()


def test_ray_sample_from_hits_matches_segments():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(8)
    from nerfloam_tpu.ops.raycast import ray_intersect, ray_sample

    aid, tn, tf, hit = ray_intersect(m, MAP_CFG, RC, o, d, max_hits=20)
    z, ids, valid = ray_sample(aid, tn, tf, 64, jax.random.key(0))
    z, ids, valid = map(np.asarray, (z, ids, valid))
    assert valid.all()  # all rays fully covered by segments
    x = z[valid]
    in_slab = ((x >= 4.0 - 1e-4) & (x <= 5.0 + 1e-4)) | (
        (x >= 8.0 - 1e-4) & (x <= 10.0 + 1e-4)
    )
    assert in_slab.all()
    # ~2x samples in the 2x-long slab
    n1 = ((x > 3.5) & (x < 5.5)).sum()
    n2 = ((x > 7.5) & (x < 10.5)).sum()
    assert 1.7 < n2 / n1 < 2.4
