"""Trilinear interpolation vs closed form; loss behavior on synthetic
truncated-SDF configurations (the golden-value tests SURVEY §4 calls for)."""

import numpy as np
import jax.numpy as jnp

from nerfloam_tpu.core import losses
from nerfloam_tpu.ops import interp


def test_trilinear_weights_sum_to_one():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(size=(256, 3)), jnp.float32)
    w = interp.trilinear_weights(p)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_trilinear_corner_exact():
    # at corner j the weight must be one-hot on j
    for j in range(8):
        p = jnp.asarray(interp.CORNER_OFFSETS[j], jnp.float32)[None]
        w = np.asarray(interp.trilinear_weights(p))[0]
        expect = np.zeros(8)
        expect[j] = 1.0
        np.testing.assert_allclose(w, expect, atol=1e-6)


def test_trilinear_matches_linear_field():
    # features = a . corner_pos + b is reproduced exactly by trilinear interp
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3,))
    b = rng.normal()
    vs = 0.3
    center = jnp.asarray([1.05, -0.45, 0.75], jnp.float32)  # voxel center
    corner_world = (
        np.asarray(center) - vs / 2 + interp.CORNER_OFFSETS * vs
    )  # (8,3)
    corner_feats = (corner_world @ a + b)[:, None]  # (8,1)
    pts = jnp.asarray(
        np.asarray(center) + (rng.uniform(size=(50, 3)) - 0.5) * vs, jnp.float32
    )
    out = interp.interp_corner_features(
        pts, center[None].repeat(50, 0), jnp.asarray(corner_feats, jnp.float32)[None].repeat(50, 0), vs
    )
    expect = np.asarray(pts) @ a + b
    np.testing.assert_allclose(np.asarray(out[:, 0]), expect, atol=1e-4)


def _loss_inputs(z, sdf, valid, ray_mask, gt, cos):
    return dict(
        z_vals=jnp.asarray(z, jnp.float32),
        sdf=jnp.asarray(sdf, jnp.float32),
        valid_mask=jnp.asarray(valid),
        ray_mask=jnp.asarray(ray_mask),
        gt_points=jnp.asarray(gt, jnp.float32),
        points_cos=jnp.asarray(cos, jnp.float32),
        truncation=0.3,
        max_depth=40.0,
        fs_weight=1.0,
        sdf_weight=10000.0,
    )


def test_perfect_sdf_zero_loss():
    # samples on a ray with gt depth 10; predicted sdf = (d - z)/trunc inside
    # the band and 1 in free space -> both losses vanish
    d = 10.0
    z = np.linspace(0.5, 10.2, 40)[None]
    sdf = np.clip((d - z) / 0.3, -1, 1)
    sdf[z < d - 0.3] = 1.0
    valid = np.ones_like(z, bool)
    gt = np.array([[10.0, 0.0, 0.0]])
    loss, ld = losses.sdf_losses(
        **_loss_inputs(z, sdf, valid, np.array([True]), gt, np.array([1.0]))
    )
    assert float(ld["fs_loss"]) < 1e-10
    assert float(ld["sdf_loss"]) < 1e-8


def test_wrong_sdf_positive_loss():
    d = 10.0
    z = np.linspace(0.5, 10.2, 40)[None]
    sdf = np.zeros_like(z)  # all-zero prediction: fs loss must fire
    valid = np.ones_like(z, bool)
    gt = np.array([[10.0, 0.0, 0.0]])
    loss, ld = losses.sdf_losses(
        **_loss_inputs(z, sdf, valid, np.array([True]), gt, np.array([1.0]))
    )
    # count-balancing weight (criterion.py:87) scales fs by 1 - n_fs/n_total
    assert float(ld["fs_loss"]) > 0.01
    assert float(ld["sdf_loss"]) > 0.0


def test_invalid_samples_ignored():
    d = 10.0
    z = np.linspace(0.5, 10.2, 40)[None]
    sdf_good = np.clip((d - z) / 0.3, -1, 1)
    sdf_good[z < d - 0.3] = 1.0
    # corrupt the second half but mark invalid (render pads sdf=1, z=MAX)
    valid = np.ones_like(z, bool)
    valid[:, 20:] = False
    z2 = z.copy()
    z2[:, 20:] = losses.MAX_DEPTH
    sdf2 = sdf_good.copy()
    sdf2[:, 20:] = 1.0
    gt = np.array([[10.0, 0.0, 0.0]])
    loss_a, _ = losses.sdf_losses(
        **_loss_inputs(z2, sdf2, valid, np.array([True]), gt, np.array([1.0]))
    )
    sdf3 = sdf2.copy()
    sdf3[:, 20:] = 1.0  # whatever the pad value is, loss must not change
    loss_b, _ = losses.sdf_losses(
        **_loss_inputs(z2, sdf3, valid, np.array([True]), gt, np.array([1.0]))
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_cosine_widens_band():
    # grazing ground return (cos=0.2): a sample 1 m beyond the measured depth
    # must land inside the truncation band (|z*cos - d*cos| < trunc).
    d = 10.0
    # one free-space sample keeps the count-balancing weights nontrivial
    z = np.array([[2.0, d + 1.0]])
    sdf = np.array([[1.0, 0.0]])
    valid = np.ones_like(z, bool)
    gt = np.array([[10.0, 0.0, 0.0]])
    _, ld_graze = losses.sdf_losses(
        **_loss_inputs(z, sdf, valid, np.array([True]), gt, np.array([0.2]))
    )
    _, ld_normal = losses.sdf_losses(
        **_loss_inputs(z, sdf, valid, np.array([True]), gt, np.array([1.0]))
    )
    assert float(ld_graze["sdf_loss"]) > 0.0  # in band -> sdf loss active
    assert float(ld_normal["sdf_loss"]) == 0.0  # out of band -> excluded


def test_eikonal():
    g = jnp.asarray(np.stack([np.ones(10), np.zeros(10), np.zeros(10)], -1), jnp.float32)
    assert float(losses.eikonal_loss(g, jnp.ones(10, bool))) < 1e-10
    assert float(losses.eikonal_loss(2 * g, jnp.ones(10, bool))) > 0.5
