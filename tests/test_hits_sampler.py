"""Hit-table sampler (ops/raycast.build_hit_table / sample_from_hits):
contract, parity with the grid sampler's validity, and exactness of the
in-register field evaluation path (core/render.render_rays_hits) against
the per-sample gather path (field_at).
"""

import numpy as np
import jax
import jax.numpy as jnp

from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.ops.raycast import (
    RaycastConfig,
    build_hit_table,
    match_z_in_hits,
    pack_hit_table,
    sample_from_hits,
    unpack_hit_table,
)
from tests.test_cdf_sampler import (
    MAP_CFG,
    MAX_DEPTH,
    RC,
    VS,
    build_wall_map,
    rays_along_x,
)

RCH = RC._replace(sampler="hits", max_hits=20)


def test_hit_table_exact_bounds():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(16)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, t_cap)
    aid, tn, seg = map(np.asarray, (ht.aid, ht.t_near, ht.seg))
    assert np.asarray(ht.ray_mask).all()
    got = aid >= 0
    # slabs are 2 + 4 voxels thick along x -> 6 hits per ray, exact bounds
    assert (got.sum(axis=1) == 6).all()
    coords = np.asarray(m.active_coords)
    for r in range(16):
        hs = np.nonzero(got[r])[0]
        for h in hs:
            x0 = coords[aid[r, h], 0] * VS
            assert abs(tn[r, h] - x0) < 1e-4
            assert abs(seg[r, h] - VS) < 1e-4
        assert (np.diff(tn[r][got[r]]) > 0).all()


def test_hit_table_respects_t_cap():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(8)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, jnp.full_like(t_cap, 6.0))
    z, _, aid, valid, ray_mask = sample_from_hits(ht, 48, jax.random.key(0))
    z, valid = np.asarray(z), np.asarray(valid)
    assert np.asarray(ray_mask).all()
    assert (z[valid] <= 6.0 + 1e-5).all()
    assert valid.any(axis=1).all()


def test_sample_from_hits_distribution():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(64)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, t_cap)
    z, onehot, aid, valid, _ = sample_from_hits(ht, 48, jax.random.key(1))
    z, aid, valid = map(np.asarray, (z, aid, valid))
    assert valid.all()  # rays fully covered by segments
    x = z[valid]
    in_slab = ((x >= 4.0 - 1e-4) & (x <= 5.0 + 1e-4)) | (
        (x >= 8.0 - 1e-4) & (x <= 10.0 + 1e-4)
    )
    assert in_slab.all()
    n1 = ((x > 3.5) & (x < 5.5)).sum()
    n2 = ((x > 7.5) & (x < 10.5)).sum()
    assert 1.7 < n2 / n1 < 2.4, "2x-long slab should get ~2x samples"
    # every sample's aid is the voxel that contains it (lattice x == floor)
    coords = np.asarray(m.active_coords)
    got_x = coords[aid[valid], 0]
    assert (got_x == np.floor(x / VS)).all()
    # depth-sorted per ray
    zz = np.where(valid, z, np.inf)
    for r in range(0, 64, 9):
        zr = zz[r][np.isfinite(zz[r])]
        assert (np.diff(zr) >= -1e-5).all()


def test_pack_unpack_roundtrip():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(8)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, t_cap)
    ht2 = unpack_hit_table(pack_hit_table(ht))
    assert (np.asarray(ht2.aid) == np.asarray(ht.aid)).all()
    np.testing.assert_allclose(np.asarray(ht2.t_near), np.asarray(ht.t_near))
    np.testing.assert_allclose(np.asarray(ht2.seg), np.asarray(ht.seg))
    assert (np.asarray(ht2.ray_mask) == np.asarray(ht.ray_mask)).all()


def test_match_z_in_hits_agrees_with_grid_lookup():
    m = build_wall_map()
    o, d, t_cap = rays_along_x(32)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, t_cap)
    z = jnp.asarray(
        np.linspace(0.3, MAX_DEPTH - 0.3, 24, dtype=np.float32)[None, :]
    ).repeat(32, axis=0)
    _, aid, found = match_z_in_hits(ht, z)
    xyz = np.asarray(o)[:, None, :] + np.asarray(d)[:, None, :] * np.asarray(z)[..., None]
    cells = jnp.asarray(np.floor(xyz / VS).astype(np.int32))
    aid_grid = np.asarray(vm.lookup_active(m, MAP_CFG, cells))
    aid, found = np.asarray(aid), np.asarray(found)
    # wherever the grid sees an active voxel, the hit list agrees (all
    # hits fit in max_hits here); avoid exact voxel-boundary z values
    frac = (xyz[..., 0] / VS) % 1.0
    interior = (frac > 1e-3) & (frac < 1 - 1e-3)
    assert (found == (aid_grid >= 0))[interior].all()
    sel = found & interior
    assert (aid[sel] == aid_grid[sel]).all()


def test_render_rays_hits_matches_field_at():
    """The one-hot row-selection path must produce EXACTLY the same SDF as
    the per-sample gather path at the same positions."""
    from nerfloam_tpu.core.render import field_at, render_rays_hits
    from nerfloam_tpu.models.decoder import init_decoder

    m = build_wall_map()
    # non-trivial embeddings so a selection bug shows in the values
    emb = jax.random.normal(
        jax.random.key(7), m.embeddings.shape, m.embeddings.dtype
    )
    m = m._replace(embeddings=emb)
    m = vm.refresh_active(m, MAP_CFG)
    params, meta = init_decoder(jax.random.key(0), in_dim=MAP_CFG.feat_dim)
    o, d, t_cap = rays_along_x(16)
    ht = build_hit_table(m, MAP_CFG, RCH, o, d, t_cap)
    out = render_rays_hits(
        m, MAP_CFG, RCH, params, meta, o, d, ht,
        jnp.ones((16,), bool), jax.random.key(2),
    )
    valid = np.asarray(out.valid_mask)
    xyz = out.sampled_xyz
    cells = jnp.floor(xyz / VS).astype(jnp.int32)
    aid = vm.lookup_active(m, MAP_CFG, cells)
    sdf_ref = np.asarray(field_at(m, MAP_CFG, params, meta, xyz, aid))
    got = np.asarray(out.sdf)
    np.testing.assert_allclose(got[valid], sdf_ref[valid], rtol=1e-5, atol=1e-5)
    assert valid.any()


def test_track_frame_hits_close_to_grid():
    """Both samplers must recover the same pose on a simple scene."""
    from nerfloam_tpu.core.tracking import TrackParams, track_frame_gn
    from nerfloam_tpu.models.decoder import init_decoder
    from nerfloam_tpu.core.ba import BAParams, ba_step

    rng = np.random.default_rng(0)
    # synthetic scene: a wall at x=6 observed from origin
    yy, zz = np.meshgrid(
        np.linspace(-3, 3, 64), np.linspace(-2, 2, 48), indexing="ij"
    )
    pts = np.stack([np.full(yy.size, 6.0), yy.ravel(), zz.ravel()], -1)
    pts += rng.normal(0, 0.01, pts.shape)
    pad = 4096
    buf = np.zeros((pad, 3), np.float32)
    val = np.zeros((pad,), bool)
    buf[: len(pts)] = pts
    val[: len(pts)] = True
    cos = np.ones((pad,), np.float32)

    cfg = vm.MapConfig(capacity=1 << 14, grid_dim=(64, 64, 32), voxel_size=VS)
    m = vm.create(cfg)
    m = vm.recenter(m, cfg, jnp.zeros(3, jnp.float32))
    m = vm.insert_points(m, cfg, jnp.asarray(buf), jnp.asarray(val))
    m = vm.refresh_active(m, cfg)
    params, meta = init_decoder(jax.random.key(0), in_dim=cfg.feat_dim)

    rc_g = RC._replace(n_samples=32)
    rc_h = rc_g._replace(sampler="hits")
    bp = BAParams(
        n_frames=1, n_rays=512, num_iterations=40, truncation=0.6,
        max_depth=MAX_DEPTH, fs_weight=1.0, sdf_weight=1.0, measure_bias=False,
    )
    res = ba_step(
        m, cfg, rc_g, bp, params, meta,
        jnp.zeros((1, 6)), jnp.asarray(buf)[None], jnp.asarray(cos)[None],
        jnp.asarray(val)[None], jnp.ones((1,), bool), jnp.zeros((1,), bool),
        jnp.asarray(True), jnp.asarray([0.01, 0.001, 0.001], jnp.float32),
        jax.random.key(3),
    )
    m2 = m._replace(embeddings=res.embeddings, packed=res.packed)

    tp = TrackParams(
        n_rays=512, num_iterations=8, truncation=0.6, max_depth=MAX_DEPTH,
        fs_weight=1.0, sdf_weight=1.0,
    )
    true_pose = jnp.zeros((6,))
    init = jnp.asarray([0.12, -0.08, 0.05, 0.0, 0.0, 0.0], jnp.float32)
    poses = {}
    for name, rc_ in (("grid", rc_g), ("hits", rc_h)):
        r = track_frame_gn(
            m2, cfg, rc_, tp, res.decoder_params, meta, init,
            jnp.asarray(buf), jnp.asarray(cos), jnp.asarray(val),
            jnp.asarray(0.01), jax.random.key(4),
        )
        assert int(r.hit_count) > 0
        poses[name] = np.asarray(r.pose)
    # both recover x-translation; they must agree with each other closely
    assert abs(poses["grid"][0] - poses["hits"][0]) < 0.03, poses
    np.testing.assert_allclose(poses["grid"], poses["hits"], atol=0.05)
