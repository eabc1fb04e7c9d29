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
