"""Cost of the once-per-depth wavefront permutation, measured as K
data-dependent chained iterations inside ONE jit (the only reliable
device timing through the tunnel -- block_until_ready returns early).
Round-2 finding: row-gather cost cliffs above 8 columns (take (N,8)
~10 ms, (N,16) ~78 ms), so the carry packs into multiple (N,8) mats."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_loop(step, init, K=16, warmup=1, iters=3, label=""):
    def run(x):
        return jax.lax.fori_loop(0, K, step, x)

    run = jax.jit(run)
    for _ in range(warmup):
        jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{label:56s} {dt * 1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 2_073_600  # 1080p lanes
    rng = np.random.default_rng(0)
    idx = jnp.arange(n, dtype=jnp.int32)

    for C in (9, 10, 12):
        mat0 = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)

        def take_step(i, mat, C=C):
            key = jax.lax.bitcast_convert_type(mat[:, 0], jnp.int32)
            _, perm = jax.lax.sort((key, idx), num_keys=1)
            return jnp.take(mat, perm, axis=0)

        bench_loop(take_step, mat0, label=f"sort + take rows ({n},{C})")

    # two (N,8) takes sharing one perm -- the planned carry layout
    a0 = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)

    def two_step(i, ab):
        a, b = ab
        key = jax.lax.bitcast_convert_type(a[:, 0], jnp.int32)
        _, perm = jax.lax.sort((key, idx), num_keys=1)
        return jnp.take(a, perm, axis=0), jnp.take(b, perm, axis=0)

    bench_loop(two_step, (a0, b0), label=f"sort + 2x take rows ({n},8)")

    # multi-payload sort (restore path): key + 6 payload columns
    cols0 = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32) for _ in range(6))

    def msort_step(i, cols):
        key = jax.lax.bitcast_convert_type(cols[0], jnp.int32)
        res = jax.lax.sort((key, *cols), num_keys=1)
        return res[1:]

    bench_loop(msort_step, cols0, label="lax.sort key + 6 payloads")


if __name__ == "__main__":
    main()
