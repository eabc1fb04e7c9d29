"""Config inheritance, PLY round-trip, ground segmentation, evaluation
metrics, Gumbel ray sampling, decoder shapes/init."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nerfloam_tpu.utils import evaluation as ev
from nerfloam_tpu.utils.config import load_config, derive_static_shapes
from nerfloam_tpu.utils.logger import read_ply, write_ply

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_config_base_inheritance():
    cfg = load_config(os.path.join(ROOT, "configs", "kitti", "kitti_00.yaml"))
    # leaf overrides
    assert cfg.data_specs["max_depth"] == 40
    assert cfg.tracker_specs["read_offset"] == 1
    # inherited base values
    assert cfg.mapper_specs["voxel_size"] == 0.3
    assert cfg.criteria["sdf_weight"] == 10000.0
    assert cfg.exp_name == "kitti/sequence00"


def test_config_cli_overrides():
    cfg = load_config(
        os.path.join(ROOT, "configs", "kitti", "kitti_00.yaml"),
        ["tracker_specs.num_iterations=7", "tpu_specs.compute_dtype=float32"],
    )
    assert cfg.tracker_specs["num_iterations"] == 7
    assert cfg.tpu_specs["compute_dtype"] == "float32"


def test_config_per_key_cli_flags():
    """Reference-parity flag promotion (demo/parser.py:14-20): every YAML
    key is its own --key flag; nested leaves as --group.key; --set wins."""
    from nerfloam_tpu.utils.config import parse_cli

    cfg_path = os.path.join(ROOT, "configs", "kitti", "kitti_00.yaml")
    args, cfg = parse_cli([
        cfg_path,
        "--exp_name", "flagged",                     # top-level scalar
        "--tracker_specs.num_iterations", "7",       # nested int
        "--mapper_specs.final_iter", "false",        # nested bool
        "--tpu_specs.bias_correction", "0",
        "--set", "mapper_specs.window_size=3",
    ])
    assert cfg.exp_name == "flagged"
    assert cfg.tracker_specs["num_iterations"] == 7
    assert cfg.mapper_specs["final_iter"] is False
    assert cfg.tpu_specs["bias_correction"] is False
    assert cfg.mapper_specs["window_size"] == 3
    # untouched keys keep their YAML values
    assert cfg.mapper_specs["voxel_size"] == 0.3
    assert args.resume is None


def test_derived_shapes():
    cfg = load_config(os.path.join(ROOT, "configs", "kitti", "kitti_00.yaml"))
    s = derive_static_shapes(cfg)
    assert s["track_step_world"] == 0.2 * 0.3
    assert s["map_step_world"] == 0.5 * 0.3
    assert s["track_n_slots"] >= 40 / (0.2 * 0.3)
    Dx, Dy, Dz = s["grid_dim"]
    assert Dx == Dy and Dz < Dx
    # region covers the tracked frame ball
    assert Dx * 0.3 / 2 >= 40


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    f = rng.integers(0, 100, (50, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, f)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)


def test_ground_segmentation():
    from nerfloam_tpu.data.ground import segment_ground

    rng = np.random.default_rng(0)
    n = 4000
    # flat ground at z=-1.7 with a vertical wall at x=8
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(2, 20, n)
    ground_pts = np.stack([r * np.cos(ang), r * np.sin(ang), np.full(n, -1.7)], -1)
    wall_z = rng.uniform(-1.5, 3.0, 500)
    wall_y = rng.uniform(-5, 5, 500)
    wall_pts = np.stack([np.full(500, 8.0), wall_y, wall_z], -1)
    pts = np.concatenate([ground_pts, wall_pts]).astype(np.float32)
    mask, cos = segment_ground(pts)
    assert mask[:n].mean() > 0.8          # ground found
    assert mask[n:].mean() < 0.3          # wall not ground
    # ground cosines match |dir_z| analytically
    dirs = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    g = mask[:n]
    np.testing.assert_allclose(cos[:n][g], np.abs(dirs[:n, 2][g]), atol=0.08)
    assert np.all(cos[n:][~mask[n:]] == 1.0)


def test_ate_umeyama():
    rng = np.random.default_rng(1)
    gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    # rigid transform of gt => aligned ATE ~ 0
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est = gt @ R.T + np.array([5.0, -3.0, 1.0])
    assert ev.ate_rmse(est, gt, align=True) < 1e-6
    assert ev.ate_rmse(est, gt, align=False) > 1.0


def test_mesh_metrics_identity():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    m = ev.mesh_metrics(pts, pts, f_threshold=0.1)
    assert m["f_score"] == 1.0
    assert m["accuracy_m"] < 1e-9


def test_crop_to_observed():
    rng = np.random.default_rng(3)
    # observed: points along a line corridor; GT: corridor + far blob
    obs = np.stack(
        [np.linspace(0, 10, 200), np.zeros(200), np.zeros(200)], axis=1
    ).astype(np.float32)
    near = obs + rng.normal(scale=0.1, size=obs.shape)   # within radius
    far = rng.normal(size=(300, 3)).astype(np.float32) + np.array([5, 50, 0])
    gt = np.concatenate([near, far]).astype(np.float32)
    kept = ev.crop_to_observed(gt, obs, radius=0.5)
    # everything within radius kept, everything beyond ~1.73*radius dropped
    assert len(kept) == len(near)
    assert np.abs(kept[:, 1]).max() < 2.0
    # degenerate: empty crop when nothing is near
    assert len(ev.crop_to_observed(far, obs, radius=0.5)) == 0


def test_gumbel_sampling_uniform_and_masked():
    from nerfloam_tpu.ops.sampling import sample_ray_indices

    valid = jnp.asarray(np.arange(1000) < 600)
    counts = np.zeros(1000)
    for i in range(50):
        idx, ok = sample_ray_indices(jax.random.key(i), valid, 64)
        idx = np.asarray(idx)
        assert np.asarray(ok).all()
        assert len(np.unique(idx)) == 64          # without replacement
        assert (idx < 600).all()                  # mask respected
        counts[idx] += 1
    # roughly uniform over valid slots
    assert counts[:600].std() / counts[:600].mean() < 0.7


def test_decoder_init_matches_torch_convention():
    from nerfloam_tpu.models.decoder import decoder_apply, init_decoder

    params, meta = init_decoder(jax.random.key(0), depth=2, width=256, in_dim=16)
    assert params["layers"][0]["w"].shape == (16, 256)
    assert params["layers"][1]["w"].shape == (256, 256)
    assert params["out"]["w"].shape == (256, 1)
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    b = 1 / np.sqrt(16)
    w = np.asarray(params["layers"][0]["w"])
    assert np.abs(w).max() <= b and np.abs(w).max() > b * 0.9
    out = decoder_apply(params, meta, jnp.zeros((4, 16)))
    assert out.shape == (4, 1)


def test_decoder_positional_embedders():
    from nerfloam_tpu.models.decoder import decoder_apply, init_decoder

    for emb, mr in [("nerf", 4), ("gaussian", 0)]:
        params, meta = init_decoder(
            jax.random.key(0), depth=2, width=64, in_dim=16, embedder=emb, multires=mr
        )
        out = decoder_apply(params, meta, jnp.ones((8, 16)))
        assert out.shape == (8, 1)
        assert np.isfinite(np.asarray(out)).all()
