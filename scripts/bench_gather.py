"""Microbenchmark: XLA gather/scatter throughput on TPU for layout choices.

Decides the embedding-table layout for the render hot path: per-corner
(C, 16) rows vs per-voxel packed (C, 128) rows, f32 vs bf16, plus the
coarse-grid int lookup and the BA scatter-add backward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>44s}: {dt*1e3:8.2f} ms")
    return dt


def main():
    key = jax.random.key(0)
    C = 1 << 21           # 2M rows (KITTI-scale lattice)
    V = 1 << 18           # 262k surface voxels
    NS = 2048 * 128       # samples per tracking iteration

    k1, k2, k3, k4 = jax.random.split(key, 4)

    # --- per-sample corner gathers: (NS, 8) indices into (C, 16) ---
    tbl16 = jax.random.normal(k1, (C, 16), jnp.float32)
    tbl16b = tbl16.astype(jnp.bfloat16)
    idx8 = jax.random.randint(k2, (NS, 8), 0, C)
    g = jax.jit(lambda t, i: t[i])
    timeit("corner gather (NSx8) from (2M,16) f32", g, tbl16, idx8)
    timeit("corner gather (NSx8) from (2M,16) bf16", g, tbl16b, idx8)

    # --- per-voxel packed gathers: (NS,) indices into (C, 128) ---
    tbl128 = jax.random.normal(k1, (C, 128), jnp.float32)
    tbl128b = tbl128.astype(jnp.bfloat16)
    idx1 = jax.random.randint(k3, (NS,), 0, C)
    timeit("packed gather (NS,) from (2M,128) f32", g, tbl128, idx1)
    timeit("packed gather (NS,) from (2M,128) bf16", g, tbl128b, idx1)

    # --- packed gather from small voxel table ---
    vtbl = jax.random.normal(k1, (V, 128), jnp.float32)
    idxs = jax.random.randint(k3, (NS,), 0, V)
    timeit("packed gather (NS,) from (262k,128) f32", g, vtbl, idxs)

    # --- sorted vs random indices ---
    timeit("packed gather sorted idx (2M,128) f32", g, tbl128, jnp.sort(idx1))

    # --- grid lookup: (R*S,) into (20M,) int32 ---
    G = 288 * 288 * 60
    grid = jax.random.randint(k1, (G,), -1, 1000)
    gi = jax.random.randint(k4, (2048 * 200,), 0, G)
    timeit("grid lookup (410k,) from (5M,) int32", g, grid, gi)

    # --- scatter-add backward shapes ---
    upd16 = jax.random.normal(k4, (NS, 8, 16), jnp.float32)
    sc = jax.jit(lambda t, i, u: t.at[i].add(u))
    timeit("scatter-add (NSx8,16) into (2M,16) f32", sc, tbl16, idx8, upd16)
    upd128 = jax.random.normal(k4, (NS, 128), jnp.float32)
    timeit("scatter-add (NS,128) into (2M,128) f32", sc, tbl128, idx1, upd128)

    # --- pack step: (C,8) corner gather from (C,16) -> (C,128) ---
    cidx = jax.random.randint(k2, (C, 8), 0, C)
    pack = jax.jit(lambda t, i: t[i].reshape(C, 128))
    timeit("pack (2M,8)->(2M,128) gather f32", pack, tbl16, cidx)
    vidx = jax.random.randint(k2, (V, 8), 0, C)
    packv = jax.jit(lambda t, i: t[i].reshape(V, 128))
    timeit("pack (262k,8)->(262k,128) gather f32", packv, tbl16, vidx)

    # --- local-window one-hot matmul alternative ---
    R, M, L = 2048, 128, 160
    local = jax.random.normal(k1, (R, L, 16), jnp.float32)
    li = jax.random.randint(k2, (R, M), 0, L)
    def onehot_mm(local, li):
        oh = jax.nn.one_hot(li, L, dtype=jnp.bfloat16)      # (R, M, L)
        return jnp.einsum("rml,rlf->rmf", oh, local.astype(jnp.bfloat16))
    timeit("local one-hot matmul (R,128,160)@(160,16)", jax.jit(onehot_mm), local, li)
    def tal(local, li):
        return jnp.take_along_axis(local, li[..., None], axis=1)
    timeit("take_along_axis (R,M) from (R,160,16)", jax.jit(tal), local, li)


if __name__ == "__main__":
    main()
