"""Round-2 profiling part 2: primitives for the stream-traversal design
plus the pallas launch-overhead mystery."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, warmup=2, iters=5, label=""):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:58s} {dt * 1000:9.3f} ms")
    return dt


def section_pallas():
    print("== pallas launch overhead ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def trivial(x):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((1024,), jnp.float32)
    bench(trivial, x, label="trivial pallas copy, 1024 f32")

    @jax.jit
    def trivial2(x):
        a = pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a)

    bench(trivial2, x, label="two chained trivial pallas calls")

    # packet kernel on a tiny scene: is the 35 ms table-size dependent?
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import Scene, make_reference_scene
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    tiny = Scene()
    m = tiny.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    tiny.add_mesh("cube", meshlib.cube(half=1.5), m)
    tdev = tiny.device()
    o = jnp.zeros((1024, 3), jnp.float32) + jnp.array([0.0, 0.0, 8.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (1024, 1))
    t0 = jnp.full((1024,), 1e30, jnp.float32)
    f = jax.jit(
        lambda o, d, t: pk.traverse_packet_slim(
            o, d, t, tdev.pnodes, tdev.pltris, tdev.pleaf_id, tdev.proots
        )
    )
    bench(f, o, d, t0, label="packet kernel 1 tile, 12-tri cube table")

    dev = make_reference_scene().device()
    fd = jax.jit(
        lambda o, d, t: pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots
        )
    )
    for ntiles in (1, 4, 16, 64):
        n = ntiles * 1024
        cam = camlib.to_arrays(CameraConfig())
        lane = jnp.arange(n, dtype=jnp.uint32)
        oo, dd, _ = camlib.blocked_lane_rays(cam, lane, 1024, max(n // 1024, 1), 8, 128)
        tt = jnp.full((n,), 1e30, jnp.float32)
        bench(fd, oo, dd, tt, label=f"packet kernel {ntiles} tiles, dragon")


def section_stream():
    print("== stream-traversal primitive costs ==")
    key = jax.random.PRNGKey(0)
    B = 16384          # node table rows
    for M in (1 << 20, 1 << 22):
        nodes = jax.random.normal(key, (B, 64), jnp.float32)
        idx = jax.random.randint(key, (M,), 0, B, dtype=jnp.int32)
        dt = bench(
            jax.jit(lambda n, i: jnp.take(n, i, axis=0)), nodes, idx,
            label=f"take (M={M>>20}M, 64) rows from ({B},64)",
        )
        print(f"    -> {M * 256 / dt / 1e9:8.1f} GB/s effective")
        nodes128 = jax.random.normal(key, (B, 128), jnp.float32)
        dt = bench(
            jax.jit(lambda n, i: jnp.take(n, i, axis=0)), nodes128, idx,
            label=f"take (M, 128) rows from ({B},128)",
        )
        print(f"    -> {M * 512 / dt / 1e9:8.1f} GB/s effective")
        tris = jax.random.normal(key, (B, 72), jnp.float32)
        dt = bench(
            jax.jit(lambda n, i: jnp.take(n, i, axis=0)), tris, idx,
            label="take (M, 72) rows (leaf tri blocks)",
        )
        print(f"    -> {M * 288 / dt / 1e9:8.1f} GB/s effective")

    M = 1 << 22
    N = 1920 * 1080
    rid = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
    tvals = jax.random.uniform(key, (M,), jnp.float32)
    tbits = jax.lax.bitcast_convert_type(tvals, jnp.int32)
    target = jnp.full((N,), 0x7F800000, jnp.int32)
    bench(
        jax.jit(lambda tgt, r, v: tgt.at[r].min(v)), target, rid, tbits,
        label="scatter-min i32 4M items -> 2M rays",
    )
    o3 = jax.random.normal(key, (N, 3), jnp.float32)
    bench(
        jax.jit(lambda x, i: jnp.take(x, i, axis=0)), o3, rid,
        label="take ray (N,3) by 4M item ray-ids",
    )
    # compaction: flag -> prefix-sum -> scatter to dense
    flags = jax.random.bernoulli(key, 0.3, (M,))
    vals = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)

    def compact(flags, vals):
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        dest = jnp.where(flags, pos, M - 1)
        out = jnp.zeros((M,), jnp.int32).at[dest].set(vals, mode="drop")
        return out, pos[-1] + 1

    bench(jax.jit(compact), flags, vals, label="compact 4M flagged items")

    k1 = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
    k2 = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)
    k3 = jax.random.randint(key, (M,), 0, 90000, dtype=jnp.int32)
    bench(
        jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3)),
        k1, k2, k3,
        label="lax.sort 3 keys, 4M rows",
    )

    # while_loop iteration overhead: 64 iterations of cheap vector ops
    def loop_body(c):
        i, x = c
        return i + 1, x * 1.0001 + 0.5

    def run(x):
        return jax.lax.while_loop(
            lambda c: c[0] < 64, loop_body, (jnp.int32(0), x)
        )[1]

    x = jnp.ones((1 << 20,), jnp.float32)
    dt = bench(jax.jit(run), x, label="while_loop 64 iters, 1M vec body")
    print(f"    -> {dt / 64 * 1e6:8.1f} us/iteration")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["pallas", "stream"]
    print(f"backend: {jax.default_backend()}")
    for s in sections:
        globals()[f"section_{s}"]()
