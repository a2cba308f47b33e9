"""Ground-truth device timing: repeat each op K times inside one jit via
fori_loop (data-dependent chaining so XLA cannot elide iterations), then
divide.  This removes host/tunnel dispatch latency from the measurement --
the real frame runs these ops inside one jit anyway."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_loop(make_body, init, K=32, warmup=1, iters=3, label=""):
    """make_body: fn(i, carry) -> carry.  Times K chained iterations."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, make_body, c)

    for _ in range(warmup):
        jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{label:58s} {dt * 1000:9.4f} ms/op")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    B = 16384

    for M in (1 << 20, 1 << 22):
        mm = M >> 20
        idx = jax.random.randint(key, (M,), 0, B, dtype=jnp.int32)

        # wide-row gather (M, 64)
        nodes = jax.random.normal(key, (B, 64), jnp.float32)

        def body_row(i, c):
            s, ix = c
            g = jnp.take(nodes, ix, axis=0)          # (M, 64)
            s = s + g[:, 0]
            ix = (ix + 1) % B
            return s, ix

        dt = bench_loop(body_row, (jnp.zeros((M,)), idx), K=8,
                        label=f"row-gather (M={mm}M,64) from (16k,64)")
        print(f"    -> {M * 256 / dt / 1e9:8.1f} GB/s")

        # column-major: 64 separate (M,) gathers from (B,) arrays
        cols = [jax.random.normal(jax.random.PRNGKey(i), (B,), jnp.float32)
                for i in range(64)]
        cols = jnp.stack(cols)  # (64, B)

        def body_col(i, c):
            s, ix = c
            acc = s
            for k in range(64):
                acc = acc + cols[k][ix]
            ix = (ix + 1) % B
            return acc, ix

        dt = bench_loop(body_col, (jnp.zeros((M,)), idx), K=8,
                        label=f"64x col-gather (M={mm}M,) from (16k,)")
        print(f"    -> {M * 256 / dt / 1e9:8.1f} GB/s")

        # single (M,) gather
        one = cols[0]

        def body_one(i, c):
            s, ix = c
            s = s + one[ix]
            ix = (ix + 1) % B
            return s, ix

        dt = bench_loop(body_one, (jnp.zeros((M,)), idx), K=32,
                        label=f"single (M={mm}M,) gather from (16k,)")
        print(f"    -> {M * 4 / dt / 1e9:8.1f} GB/s")

    # gathers from a LARGE source (2M rows) -- ray-data regather
    N = 1 << 21
    M = 1 << 22
    big = jax.random.normal(key, (N,), jnp.float32)
    rid = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)

    def body_big(i, c):
        s, ix = c
        s = s + big[ix]
        ix = (ix + 1) % N
        return s, ix

    dt = bench_loop(body_big, (jnp.zeros((M,)), rid), K=32,
                    label="(4M,) gather from (2M,) source")
    print(f"    -> {M * 4 / dt / 1e9:8.1f} GB/s")

    # scatter-min i32, 4M -> 2M
    tv = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)

    def body_smin(i, c):
        tgt, v = c
        tgt = tgt.at[rid].min(v)
        return tgt, v + 1

    dt = bench_loop(body_smin, (jnp.full((N,), 1 << 30, jnp.int32), tv), K=16,
                    label="scatter-min i32 4M items -> 2M targets")

    # scatter-add (bvh_depth counter)
    def body_sadd(i, c):
        tgt, v = c
        tgt = tgt.at[rid].add(1)
        return tgt, v

    bench_loop(body_sadd, (jnp.zeros((N,), jnp.int32), tv), K=16,
               label="scatter-add i32 4M items -> 2M targets")

    # cumsum 8M i32
    flags = jax.random.randint(key, (M * 2,), 0, 2, dtype=jnp.int32)

    def body_cs(i, c):
        f, s = c
        cs = jnp.cumsum(f)
        return f, s + cs[-1]

    bench_loop(body_cs, (flags, jnp.int32(0)), K=16, label="cumsum (8M,) i32")

    # compact: cumsum + scatter to dense
    vals = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)
    fl = jax.random.randint(key, (M,), 0, 2, dtype=jnp.int32)

    def body_compact(i, c):
        f, v, s = c
        pos = jnp.cumsum(f) - 1
        dest = jnp.where(f > 0, pos, M - 1)
        out = jnp.zeros((M,), jnp.int32).at[dest].set(v, mode="drop")
        return f, v + 1, s + out[0]

    bench_loop(body_compact, (fl, vals, jnp.int32(0)), K=16,
               label="compact 4M flagged (cumsum+scatter)")

    # sort 4M single key + payload
    def body_sort(i, c):
        k, v = c
        k2, v2 = jax.lax.sort((k, v), num_keys=1)
        return k2, v2 + 1

    bench_loop(body_sort, (tv, vals), K=4, label="lax.sort 4M key+payload")

    # dynamic_slice pop + dynamic_update_slice push (queue ops)
    Q = 1 << 23
    queue = jax.random.randint(key, (Q,), 0, 1 << 30, dtype=jnp.int32)
    P = 1 << 20

    def body_q(i, c):
        q, s = c
        blk = jax.lax.dynamic_slice(q, (i * 7 % (Q - P),), (P,))
        q = jax.lax.dynamic_update_slice(q, blk + 1, ((i * 13) % (Q - P),))
        return q, s + blk[0]

    bench_loop(body_q, (queue, jnp.int32(0)), K=16,
               label="queue pop+push (1M dynamic slices in 8M)")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
