"""Shared SDF decoder MLP.

Equivalent of the reference decoder (/root/reference/src/variations/
lidar.py:80-131): Linear(in_dim -> width) + ReLU, (depth-1) hidden
Linear(width -> width) + ReLU (with optional skip concat), Linear(width -> 1).
All configs use depth=2, width=256, in_dim=16, no positional embedder —
that shape maps cleanly onto the MXU as three batched matmuls.

Parameters are a plain pytree (list of {"w","b"} dicts) — no framework
module classes; optimization is optax over the pytree. Initialization
replicates torch.nn.Linear defaults (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
both weight and bias) so training dynamics match the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class DecoderMeta(NamedTuple):
    """Static (hashable) decoder architecture descriptor, kept OUT of the
    parameter pytree so jax.grad sees pure arrays."""

    skips: tuple
    embedder: str
    multires: int


def positional_embedding_dim(in_dim: int, embedder: str, multires: int) -> int:
    if embedder == "none":
        return in_dim
    if embedder == "nerf":
        return in_dim * (2 * multires + 1)
    if embedder == "gaussian":
        return 93  # reference default mapping_size (lidar.py:16)
    raise NotImplementedError(f"unknown positional encoder: {embedder}")


def apply_positional_embedding(
    x: jnp.ndarray, embedder: str, multires: int, gaussian_B: jnp.ndarray | None = None
) -> jnp.ndarray:
    """NeRF sin/cos or Gaussian Fourier embeddings (lidar.py:6-68)."""
    if embedder == "none":
        return x
    if embedder == "nerf":
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires, dtype=x.dtype)
        xf = x[..., None, :] * freqs[:, None]  # (..., multires, D)
        enc = jnp.concatenate(
            [jnp.sin(xf), jnp.cos(xf)], axis=-1
        ).reshape(*x.shape[:-1], -1)
        return jnp.concatenate([x, enc], axis=-1)
    if embedder == "gaussian":
        return jnp.sin(x @ gaussian_B)
    raise NotImplementedError(embedder)


def init_decoder(
    key: jax.Array,
    depth: int = 2,
    width: int = 256,
    in_dim: int = 16,
    skips: tuple[int, ...] = (),
    embedder: str = "none",
    multires: int = 0,
    dtype=jnp.float32,
) -> Params:
    """Build decoder params. Layer shapes mirror lidar.py:105-107."""
    emb_dim = positional_embedding_dim(in_dim, embedder, multires)
    dims_in: List[int] = [emb_dim]
    for i in range(depth - 1):
        dims_in.append(width + emb_dim if i in skips else width)
    layers = []
    for d_in in dims_in:
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(d_in)
        layers.append(
            {
                "w": jax.random.uniform(k1, (d_in, width), dtype, -bound, bound),
                "b": jax.random.uniform(k2, (width,), dtype, -bound, bound),
            }
        )
    key, k1, k2 = jax.random.split(key, 3)
    bound = 1.0 / np.sqrt(width)
    out_layer = {
        "w": jax.random.uniform(k1, (width, 1), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (1,), dtype, -bound, bound),
    }
    params: Params = {"layers": layers, "out": out_layer}
    if embedder == "gaussian":
        key, kg = jax.random.split(key)
        params["gaussian_B"] = jax.random.normal(kg, (in_dim, 93), dtype) * 25.0
    meta = DecoderMeta(tuple(skips), embedder, multires)
    return params, meta


def decoder_apply(
    params: Params, meta: DecoderMeta, feats: jnp.ndarray, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """SDF values for interpolated features (..., in_dim) -> (..., 1).

    ``compute_dtype`` lets the hot path run the matmuls in bfloat16 on the
    MXU while parameters stay float32.
    """
    x = apply_positional_embedding(
        feats, meta.embedder, meta.multires, params.get("gaussian_B")
    )
    skips = meta.skips
    h = x
    for i, layer in enumerate(params["layers"]):
        w = layer["w"].astype(compute_dtype)
        h = jnp.maximum(
            jnp.dot(h.astype(compute_dtype), w, preferred_element_type=jnp.float32)
            + layer["b"],
            0.0,
        )
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    out = params["out"]
    w = out["w"].astype(compute_dtype)
    return (
        jnp.dot(h.astype(compute_dtype), w, preferred_element_type=jnp.float32)
        + out["b"]
    )
