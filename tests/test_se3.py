"""SE(3) exp/log tests, including the reference's own smoke case
(src/se3pose.py:95-106) and gradient checks near theta = 0 where the
reference needed its Taylor series."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfloam_tpu.ops import se3


def test_exp_log_roundtrip_reference_matrix():
    # The matrix from the reference's __main__ smoke test (se3pose.py:96-99).
    T = jnp.asarray(
        [
            [-0.955421, 0.119616, -0.269932, 2.655830],
            [0.295248, 0.388339, -0.872939, 2.981598],
            [0.000408, -0.913720, -0.406343, 1.368648],
            [0.000000, 0.000000, 0.000000, 1.000000],
        ]
    )
    p6 = se3.pose_from_matrix(T)
    back = se3.pose_matrix(p6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(T), atol=1e-5)


def test_exp_log_roundtrip_random():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 3)) * 1.5
    R = se3.exp_so3(jnp.asarray(w, jnp.float32))
    w2 = se3.log_so3(R)
    R2 = se3.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_exp_orthonormal():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    R = se3.exp_so3(w)
    eye = jnp.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_small_angle_gradients_finite():
    def f(w):
        return jnp.sum(se3.exp_so3(w) @ jnp.ones((3,)))

    for scale in [0.0, 1e-10, 1e-6, 1e-3]:
        g = jax.grad(f)(jnp.asarray([scale, 0.0, 0.0], jnp.float32))
        assert np.all(np.isfinite(np.asarray(g))), scale


def test_small_angle_matches_series():
    w = jnp.asarray([1e-5, -2e-5, 3e-5], jnp.float32)
    R = se3.exp_so3(w)
    approx = jnp.eye(3) + se3.skew(w)
    np.testing.assert_allclose(np.asarray(R), np.asarray(approx), atol=1e-8)


def test_transform_points_matches_matrix():
    rng = np.random.default_rng(2)
    p6 = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    out = se3.transform_points(p6, pts)
    T = se3.pose_matrix(p6)
    expect = pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_invert_matrix():
    rng = np.random.default_rng(3)
    p6 = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    T = se3.pose_matrix(p6)
    I = se3.invert_matrix(T) @ T
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_host_pose_helpers_match_device():
    from nerfloam_tpu.core.frame import matrix_from_pose6_np, pose6_from_matrix_np

    rng = np.random.default_rng(5)
    for _ in range(20):
        p6 = rng.normal(size=6).astype(np.float32)
        p6[3:] *= 0.8
        T_host = matrix_from_pose6_np(p6)
        T_dev = np.asarray(se3.pose_matrix(jnp.asarray(p6)))
        np.testing.assert_allclose(T_host, T_dev, atol=2e-6)
        back = pose6_from_matrix_np(T_host)
        np.testing.assert_allclose(
            matrix_from_pose6_np(back), T_host, atol=1e-5
        )
