"""Multi-chip execution layouts: ray data-parallel x decoder tensor-parallel.

The reference is a single-GPU two-process system with no distributed story
(SURVEY §2.3). This module gives the TPU rebuild one, the JAX way: a device
mesh + shard_map with explicit collectives riding ICI.

Layouts:
  - ``dp`` (ray data parallelism): each chip renders a shard of the rays
    against a replicated map; embedding/decoder/pose gradients are
    psum-reduced. This is the natural scale-out for the BA hot loop — rays
    are embarrassingly parallel and the map snapshot is read-only within an
    iteration.
  - ``tp`` (decoder tensor parallelism): Megatron-style column/row split of
    the MLP hidden dimension with one psum per pair of layers. The decoder
    is small, so tp mainly demonstrates the layout plumbing; it becomes
    load-bearing for wider decoders.

``make_sharded_ba_iteration`` builds the full jitted multi-chip training
step used by ``__graft_entry__.dryrun_multichip`` and by multi-chip
deployments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfloam_tpu.core.losses import sdf_losses
from nerfloam_tpu.core.tracking import t_cap_for
from nerfloam_tpu.map.voxel_map import MapConfig, MapState
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import RaycastConfig


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // tp
    return Mesh(np.asarray(devs).reshape(dp, tp), ("dp", "tp"))


def shard_decoder_params(params, mesh: Mesh):
    """Place decoder params for tp: layer0 column-split, layer1+ row-split,
    output layer replicated."""

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {"layers": [], "out": {}}
    for i, layer in enumerate(params["layers"]):
        if i == 0:
            out["layers"].append(
                {"w": put(layer["w"], P(None, "tp")), "b": put(layer["b"], P("tp"))}
            )
        else:
            out["layers"].append(
                {"w": put(layer["w"], P("tp", None)), "b": put(layer["b"], P())}
            )
    out["out"]["w"] = put(params["out"]["w"], P())
    out["out"]["b"] = put(params["out"]["b"], P())
    if "gaussian_B" in params:
        out["gaussian_B"] = put(params["gaussian_B"], P())
    return out


def tp_decoder_apply(params, feats: jnp.ndarray, compute_dtype=jnp.float32):
    """Megatron split of the (none-embedder) SDF MLP inside shard_map:
    column-parallel first layer (local), row-parallel second layer with one
    psum over 'tp', replicated output head."""
    h = feats
    layers = params["layers"]
    # layer 0: (in, W/tp) column shard — local matmul, local relu
    h = jnp.maximum(
        jnp.dot(h.astype(compute_dtype), layers[0]["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32) + layers[0]["b"],
        0.0,
    )
    for layer in layers[1:]:
        # row shard: partial sums -> psum -> bias + relu
        part = jnp.dot(h.astype(compute_dtype), layer["w"].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        full = jax.lax.psum(part, "tp")
        hfull = jnp.maximum(full + layer["b"], 0.0)
        # re-shard back to the local column block for the next row layer
        tp_n = jax.lax.axis_size("tp")
        tp_i = jax.lax.axis_index("tp")
        block = hfull.shape[-1] // tp_n
        h = jax.lax.dynamic_slice_in_dim(hfull, tp_i * block, block, axis=-1)
    out = params["out"]
    sdf = (
        jnp.dot(hfull.astype(compute_dtype), out["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32) + out["b"]
    )
    return sdf


def make_sharded_ba_iteration(
    mesh: Mesh,
    map_cfg: MapConfig,
    rc: RaycastConfig,
    truncation: float,
    max_depth: float,
    fs_weight: float = 1.0,
    sdf_weight: float = 10000.0,
):
    """One multi-chip BA iteration: rays dp-sharded, decoder tp-sharded,
    map replicated; grads psum over dp (and tp contributions where sharded);
    parameters updated by the production optimizer (Adam, as core/ba.py).

    Returns (step, init_opt): ``opt_state = init_opt(map_state, dec, pose)``
    then ``packed, dec, pose, loss, opt_state = step(map_state, dec, pose,
    pts, cos, rvalid, lrs, key, opt_state)``.
    """

    def per_device(packed, dec, pose6, map_state, pts, cos, rvalid, key):
        # pts: (R_local, 3) sensor frame for ONE frame's rays; the map
        # (including the 128-lane packed corner table the render path
        # gathers from) is replicated, the packed-table gradient is the
        # only map-sized collective (psum over dp)

        def loss_fn(opt):
            packed_, dec_, pose_ = opt
            st = map_state._replace(packed=packed_)
            dirs = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
            wdirs = se3.rotate_dirs(pose_, dirs)
            origin = jnp.broadcast_to(se3.pose_translation(pose_), wdirs.shape)
            t_cap = t_cap_for(pts, cos, truncation, max_depth)

            # render with a tp-aware decoder: swap decoder_apply via closure
            z, aid, valid, ray_mask = _sample(st, origin, wdirs, t_cap, key)
            ray_mask = ray_mask & rvalid
            valid = valid & rvalid[:, None]
            xyz = origin[:, None, :] + wdirs[:, None, :] * z[..., None]
            feats = _interp(st, xyz, aid)
            sdf = tp_decoder_apply(dec_, feats)[..., 0]
            sdf = jnp.where(valid, sdf, 1.0)
            z_out = jnp.where(valid, z, 1e4)
            loss, _ = sdf_losses(
                z_out, sdf, valid, ray_mask, pts, cos,
                truncation, max_depth, fs_weight, sdf_weight,
            )
            # average the loss over dp shards => grads are implicitly averaged
            return jax.lax.pmean(loss, "dp")

        loss, grads = jax.value_and_grad(loss_fn)((packed, dec, pose6))
        g_packed, g_dec, g_pose = grads
        # rays are dp-sharded: every grad is a partial sum over local rays
        g_packed = jax.lax.psum(g_packed, "dp")
        g_pose = jax.lax.psum(g_pose, "dp")
        g_dec = jax.tree.map(lambda g: jax.lax.psum(g, "dp"), g_dec)
        return loss, g_packed, g_dec, g_pose

    def _sample(st, origin, wdirs, t_cap, key):
        from nerfloam_tpu.ops.raycast import sample_rays_cdf

        return sample_rays_cdf(st, map_cfg, rc, origin, wdirs, t_cap, key)

    def _interp(st, xyz, aid):
        from nerfloam_tpu.ops.interp import interp_corner_features

        F = map_cfg.feat_dim
        safe = jnp.clip(aid, 0)
        rows = st.packed[safe]
        embs = rows.reshape(rows.shape[:-1] + (8, F))
        # center from the sample's own cell (identical for valid samples;
        # see core/render.field_at) — no coords gather
        center = (
            jnp.floor(xyz / map_cfg.voxel_size) + 0.5
        ) * map_cfg.voxel_size
        return interp_corner_features(xyz, center, embs, map_cfg.voxel_size)

    shard_map = jax.shard_map

    dec_spec = {
        "layers": [
            {"w": P(None, "tp"), "b": P("tp")},
            {"w": P("tp", None), "b": P()},
        ],
        "out": {"w": P(), "b": P()},
    }
    map_spec = MapState(*(P() for _ in MapState._fields))

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(),                      # packed table (replicated; grads psum'd)
            dec_spec,                 # decoder params: tp layout
            P(),                      # pose
            map_spec,                 # map state (replicated)
            P("dp", None),            # rays: points
            P("dp"),                  # cos
            P("dp"),                  # valid
            P(),                      # key
        ),
        out_specs=(P(), P(), dec_spec, P()),
        check_vma=False,
    )

    import optax

    opt = optax.scale_by_adam()  # the production optimizer (core/ba.py uses
    #   the same transform; BA re-inits it per call, so threading the state
    #   across step calls here is the same chain semantics per window)

    @jax.jit
    def init_opt(map_state: MapState, dec_params, pose6):
        return opt.init((map_state.packed, dec_params, pose6))

    @jax.jit
    def step(map_state: MapState, dec_params, pose6, pts, cos, rvalid, lrs,
             key, opt_state):
        loss, g_packed, g_dec, g_pose = sharded(
            map_state.packed, dec_params, pose6, map_state, pts, cos, rvalid, key
        )
        updates, opt_state = opt.update((g_packed, g_dec, g_pose), opt_state)
        u_packed, u_dec, u_pose = updates
        packed = map_state.packed - lrs[0] * u_packed
        dec = jax.tree.map(lambda p, u: p - lrs[1] * u, dec_params, u_dec)
        pose = pose6 - lrs[2] * u_pose
        return packed, dec, pose, loss, opt_state

    return step, init_opt
