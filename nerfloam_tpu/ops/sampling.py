"""Gumbel-top-k ray subsampling.

Equivalent of the reference's sampling_without_replacement / sample_rays
(/root/reference/src/utils/sample_util.py:4-20): uniform sampling without
replacement over the valid-point mask via Gumbel noise + top-k. Returns
indices plus a validity flag (a pick can land on a padded slot only when
fewer valid points than requested exist — flagged and masked downstream,
which the reference could not do)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_ray_indices(
    key: jax.Array, valid: jnp.ndarray, n_rays: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick ``n_rays`` indices uniformly w/o replacement from valid slots.

    valid: (P,) bool. Returns (idx (n_rays,) int32, picked_valid (n_rays,)).
    """
    logp = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, valid.shape, jnp.float32)
    _, idx = jax.lax.top_k(logp + g, n_rays)
    return idx.astype(jnp.int32), valid[idx]
