"""Careful gather-throughput measurement: XLA vs Pallas row-gather.

Run: python -u scripts/bench_gather2.py  (prints progressively)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(name, fn, *args, n=10):
    r = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:>52s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    C = 1 << 21
    k1, k2 = jax.random.split(key)

    # XLA row gathers at different widths, same row count (262k)
    N = 2048 * 128
    for W in (16, 32, 64, 128, 256):
        tbl = jax.random.normal(k1, (C, W), jnp.float32)
        idx = jax.random.randint(k2, (N,), 0, C)
        g = jax.jit(lambda t, i: t[i].sum())
        dt = timeit(f"XLA gather {N} rows x{W} f32", g, tbl, idx)
        print(f"{'':>52s}  -> {N/dt/1e6:7.1f} M rows/s", flush=True)
        del tbl

    # element count scaling at fixed width 16
    tbl = jax.random.normal(k1, (C, 16), jnp.float32)
    for N2 in (1 << 16, 1 << 18, 1 << 20, 1 << 21):
        idx = jax.random.randint(k2, (N2,), 0, C)
        g = jax.jit(lambda t, i: t[i].sum())
        dt = timeit(f"XLA gather {N2} rows x16 f32", g, tbl, idx)
        print(f"{'':>52s}  -> {N2/dt/1e6:7.1f} M rows/s", flush=True)

    # bf16
    tblb = tbl.astype(jnp.bfloat16)
    idx = jax.random.randint(k2, (N,), 0, C)
    g = jax.jit(lambda t, i: t[i].sum())
    timeit(f"XLA gather {N} rows x16 bf16", g, tblb, idx)

    # scalar grid lookup
    G = 288 * 288 * 60
    grid = jax.random.randint(k1, (G,), -1, 1000)
    for N2 in (2048 * 100, 2048 * 200):
        gi = jax.random.randint(k2, (N2,), 0, G)
        dt = timeit(f"XLA scalar lookup {N2} from int32 grid", g, grid, gi)
        print(f"{'':>52s}  -> {N2/dt/1e6:7.1f} M elts/s", flush=True)

    # scatter-add
    upd = jax.random.normal(k2, (N, 16), jnp.float32)
    idx = jax.random.randint(k2, (N,), 0, C)
    sc = jax.jit(lambda t, i, u: t.at[i].add(u).sum())
    dt = timeit(f"XLA scatter-add {N} rows x16 f32", sc, tbl, idx, upd)
    print(f"{'':>52s}  -> {N/dt/1e6:7.1f} M rows/s", flush=True)

    # take_along_axis from per-ray local tables (R,L,16)
    R, M, L = 2048, 128, 32
    local = jax.random.normal(k1, (R, L, 16), jnp.float32)
    li = jax.random.randint(k2, (R, M), 0, L)
    tal = jax.jit(lambda lo, i: jnp.take_along_axis(lo, i[..., None], axis=1).sum())
    dt = timeit("XLA take_along_axis (2048,128) from (2048,32,16)", tal, local, li)
    print(f"{'':>52s}  -> {R*M/dt/1e6:7.1f} M rows/s", flush=True)

    # one-hot matmul local gather (MXU): (R,M,L) @ (R,L,16)
    ohm = jax.jit(
        lambda lo, i: jnp.einsum(
            "rml,rlf->rmf",
            jax.nn.one_hot(i, L, dtype=jnp.bfloat16),
            lo.astype(jnp.bfloat16),
        ).sum()
    )
    dt = timeit("one-hot matmul (2048,128,32)@(2048,32,16)", ohm, local, li)
    print(f"{'':>52s}  -> {R*M/dt/1e6:7.1f} M rows/s", flush=True)

    # big one-hot segment matmul: samples x 8 corners as one-hot over 8k-row
    # table chunks (C/8k chunks) is infeasible; skip.


if __name__ == "__main__":
    main()
