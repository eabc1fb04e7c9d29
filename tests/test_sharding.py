"""Multi-chip layout tests on the 8-device virtual CPU mesh: the sharded BA
iteration must run, reduce gradients across dp, keep tp decoder math
equivalent to the single-device decoder, and the graft dryrun must pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfloam_tpu.parallel.sharding import make_mesh, shard_decoder_params


def test_mesh_shapes():
    m = make_mesh(8)
    assert m.shape["dp"] * m.shape["tp"] == 8
    m2 = make_mesh(2)
    assert m2.shape["dp"] * m2.shape["tp"] == 2


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tp_decoder_matches_single_device():
    """Column/row-split MLP inside shard_map == plain decoder_apply."""
    from nerfloam_tpu.models.decoder import decoder_apply, init_decoder

    params, meta = init_decoder(jax.random.key(0), depth=2, width=256, in_dim=16)
    x = jax.random.normal(jax.random.key(1), (64, 16), jnp.float32)
    ref = decoder_apply(params, meta, x)

    mesh = make_mesh(8)  # dp=4, tp=2
    sharded_params = shard_decoder_params(params, mesh)

    from jax.sharding import PartitionSpec as P
    from nerfloam_tpu.parallel.sharding import tp_decoder_apply

    spec = {
        "layers": [
            {"w": P(None, "tp"), "b": P("tp")},
            {"w": P("tp", None), "b": P()},
        ],
        "out": {"w": P(), "b": P()},
    }
    f = jax.jit(
        jax.shard_map(
            tp_decoder_apply,
            mesh=mesh,
            in_specs=(spec, P("dp", None)),
            out_specs=P("dp", None),
            check_vma=False,
        )
    )
    out = f(sharded_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out[2].sum()) > 0  # some rays hit the synthetic world


def _ba_problem():
    import __graft_entry__ as g
    from nerfloam_tpu.core import ba as ba_mod

    (map_cfg, rc, state, dec_params, dec_meta, pose6, _r, _c, _v, frame) = (
        g._build_tiny_problem(n_rays=256)
    )
    fpts, fcos, fval = frame
    bp = ba_mod.BAParams(
        n_frames=1, n_rays=256, num_iterations=4, truncation=0.3,
        max_depth=rc.max_depth, fs_weight=1.0, sdf_weight=1000.0,
    )
    args = (
        pose6[None], fpts[None], fcos[None], fval[None],
        jnp.ones((1,), bool), jnp.ones((1,), bool), jnp.asarray(True),
        jnp.asarray([0.02, 0.005, 0.001], jnp.float32), jax.random.key(3),
    )
    return map_cfg, rc, bp, state, dec_params, dec_meta, args


@pytest.mark.parametrize("superset", [2, 0])
def test_sharded_ba_step_matches_single_chip(superset):
    """The PRODUCTION sharded BA step (rays dp-sharded, grads psum'd) must
    reproduce the single-chip ba_step: sampling is global-draw-then-slice,
    so any dp trains on the same rays and only float reduction order
    differs (VERDICT r2 item 3)."""
    from jax.sharding import Mesh
    from nerfloam_tpu.core import ba as ba_mod

    map_cfg, rc, bp, state, dec_params, dec_meta, args = _ba_problem()
    bp = bp._replace(ray_superset=superset)

    ref = ba_mod.ba_step(
        state, map_cfg, rc, bp, dec_params, dec_meta, *args
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    step = ba_mod.make_sharded_ba_step(mesh, map_cfg, rc, bp, dec_meta)
    out = step(state, dec_params, *args)

    # Tolerances: psum reduction order differs from a single-device sum at
    # the ULP level, and Adam's first-step update is g/|g| — a sign flip on
    # a near-zero gradient moves that one parameter by the full lr. So we
    # require tight agreement in aggregate (poses, loss, the bulk of the
    # table) rather than elementwise bitwise equality.
    np.testing.assert_allclose(
        np.asarray(out.loss), np.asarray(ref.loss), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(ref.poses), atol=1e-3
    )
    diff = np.abs(np.asarray(out.embeddings) - np.asarray(ref.embeddings))
    assert float(diff.mean()) < 5e-4, diff.mean()
    assert float((diff > 1e-2).mean()) < 0.01, (diff > 1e-2).mean()
    assert abs(int(out.touched_count) - int(ref.touched_count)) <= 2


def test_sharded_grad_scale_matches_single_device():
    """Direct gradient-scale check of ba.py's dp reduction pattern (ADVICE
    r2): loss psum'd inside sdf_losses + allsum of grads + divide by dp must
    equal the single-device gradient EXACTLY in scale. Adam's scale
    invariance hides a stray dp factor in the end-to-end equivalence test,
    so this pins the raw gradient."""
    from jax.sharding import Mesh, PartitionSpec as P
    from nerfloam_tpu.core.losses import sdf_losses

    R, M, dp = 32, 8, 4
    trunc, max_depth = 0.3, 10.0
    k = jax.random.key(0)
    k1, k2, k3 = jax.random.split(k, 3)
    gt = jax.random.uniform(k1, (R, 3), minval=1.0, maxval=3.0)
    d = jnp.linalg.norm(gt, axis=-1, keepdims=True)
    # spread samples across free space and the truncation band
    z = jnp.linspace(0.3, 1.1, M)[None, :] * d
    sdf = 0.1 * jax.random.normal(k2, (R, M))
    valid = jax.random.uniform(k3, (R, M)) > 0.1
    raymask = jnp.ones((R,), bool)
    cos = jnp.ones((R,))

    def ref_loss(s):
        loss, _ = sdf_losses(z, s, valid, raymask, gt, cos, trunc,
                             max_depth, 1.0, 100.0)
        return loss

    g_ref = jax.grad(ref_loss)(sdf)

    n_loc = R // dp

    def sharded_grad(sdf_full):
        i = jax.lax.axis_index("dp")
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * n_loc, n_loc, 0)

        def local_loss(s_full):
            loss, _ = sdf_losses(
                sl(z), sl(s_full), sl(valid), sl(raymask), sl(gt), sl(cos),
                trunc, max_depth, 1.0, 100.0, axis_name="dp",
            )
            return loss

        g = jax.grad(local_loss)(sdf_full)
        return jax.lax.psum(g, "dp") / dp  # the ba.py pattern

    mesh = Mesh(np.asarray(jax.devices()[:dp]), ("dp",))
    f = jax.jit(jax.shard_map(
        sharded_grad, mesh=mesh, in_specs=P(), out_specs=P(),
        check_vma=False,
    ))
    g_sh = f(sdf)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5, atol=1e-8
    )


@pytest.mark.slow  # ~1.5 min on 1-core CPU: dp=4 staged pipeline
def test_pipeline_dp_runs_and_tracks():
    """Flag-gated multi-chip pipeline (tpu_specs.dp=4): staged tracked path
    with the sharded BA step processes frames and stays on-trajectory."""
    import os

    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils import evaluation as ev
    from nerfloam_tpu.utils.config import load_config

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "synthetic",
        "synthetic_small.yaml",
    )
    cfg = load_config(cfg_path, [
        "data_specs.n_frames=6",
        "tpu_specs.bootstrap_steps=4",
        "tracker_specs.num_iterations=10",
        "mapper_specs.num_iterations=10",
        "tpu_specs.dp=4",
    ])
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)
    assert slam.mesh is not None and slam.mesh.shape["dp"] == 4
    poses = slam.run()
    est = np.asarray(poses)
    gt = dataset.gt_trajectory()[: len(est)]
    assert ev.ate_rmse(est, gt, align=False) < 0.6


def test_sharded_gn_tracker_matches_single_chip():
    """The dp-sharded GN tracker (_track_gn_core under shard_map: rays
    global-draw-then-slice, H/b/counts/loss psum'd) must reproduce the
    single-chip track_frame_gn pose to float-reduction-order tolerance."""
    from jax.sharding import Mesh, PartitionSpec as P
    import __graft_entry__ as g
    from nerfloam_tpu.core import tracking as tr_mod

    (map_cfg, rc, state, dec_params, dec_meta, pose6, _r, _c, _v, frame) = (
        g._build_tiny_problem(n_rays=256)
    )
    fpts, fcos, fval = frame
    tp = tr_mod.TrackParams(
        n_rays=256, num_iterations=4, truncation=0.3,
        max_depth=rc.max_depth, fs_weight=1.0, sdf_weight=1000.0,
    )
    init = pose6 + jnp.asarray([0.05, -0.04, 0.02, 0, 0, 0.01], jnp.float32)
    lr = jnp.asarray(0.01, jnp.float32)
    key = jax.random.key(9)

    for sampler in ("grid", "hits"):
        rc_s = rc._replace(sampler=sampler)
        ref = tr_mod.track_frame_gn(
            state, map_cfg, rc_s, tp, dec_params, dec_meta, init,
            fpts, fcos, fval, lr, key,
        )
        dp = 4
        mesh = Mesh(np.asarray(jax.devices()[:dp]), ("dp",))

        def body(map_state, dec, init6, pts, cos, val, lr_, k):
            return tr_mod._track_gn_core(
                "dp", dp, map_state, map_cfg, rc_s, tp, dec, dec_meta,
                init6, pts, cos, val, lr_, k,
            )

        sharded = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
        ))
        out = sharded(state, dec_params, init, fpts, fcos, fval, lr, key)
        assert int(out.hit_count) == int(ref.hit_count), sampler
        np.testing.assert_allclose(
            np.asarray(out.pose), np.asarray(ref.pose), atol=2e-4,
            err_msg=sampler,
        )
