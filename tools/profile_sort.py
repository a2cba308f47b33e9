"""Decide the reordering strategy: slim kernel on sorted vs unsorted
bounce rays and shadow fans (sorted origins, mixed vs per-light masked),
plus the reorder overhead itself (sort + packed takes) at 2M."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, warmup=1, iters=3, label="", rays=None):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    n = rays if rays is not None else args[0].shape[0]
    print(f"{label:56s} {dt * 1000:9.3f} ms  {n / dt / 1e6:8.2f} Mrays/s")
    return dt


def spread(v):
    v = (v | (v << 8)) & 0x0300F
    v = (v | (v << 4)) & 0x030C3
    v = (v | (v << 2)) & 0x09249
    return v


def morton15(p, lo, inv_extent):
    q = jnp.clip(((p - lo) * inv_extent * 32.0).astype(jnp.int32), 0, 31)
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def main():
    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    dev = make_reference_scene().device()
    n = 2025 * 1024
    key = jax.random.PRNGKey(3)
    ko, kd = jax.random.split(key)

    # bounce-like: random ground origins, cosine-ish up directions
    og = jnp.stack([
        jax.random.uniform(ko, (n,), minval=-20, maxval=20),
        jnp.full((n,), -2.99),
        jax.random.uniform(kd, (n,), minval=-20, maxval=20),
    ], axis=1)
    dd = jax.random.normal(jax.random.PRNGKey(5), (n, 3))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    dd = dd * jnp.where(dd[:, 1:2] < 0, -1.0, 1.0)
    t0 = jnp.full((n,), 1e30, jnp.float32)
    ones = jnp.ones((n,), jnp.int32)

    lo = jnp.array([-25.0, -5.0, -25.0])
    inv_ext = 1.0 / jnp.array([50.0, 30.0, 50.0])

    f = jax.jit(lambda o, d, t, a: pk.traverse_packet_slim(
        o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots, active=a))
    fa = jax.jit(lambda o, d, t, a: pk.traverse_packet_slim(
        o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
        active=a, any_hit=True))

    bench(f, og, dd, t0, ones, label="bounce unsorted")

    oct_ = ((dd[:, 0] > 0).astype(jnp.int32)
            + 2 * (dd[:, 1] > 0).astype(jnp.int32)
            + 4 * (dd[:, 2] > 0).astype(jnp.int32))
    m = morton15(og, lo, inv_ext)
    key_om = oct_ * (1 << 15) + m
    key_mo = m * 8 + oct_
    for name, kv in (("octant-major", key_om), ("morton-major", key_mo)):
        idx = jnp.argsort(kv)
        bench(f, og[idx], dd[idx], t0, ones, label=f"bounce sorted {name}")

    # reorder overhead: sort + packed take of 13 f32 cols + 5 i32 cols
    def reorder(kv, o, d, misc_f, misc_i):
        idx = jnp.argsort(kv)
        packf = jnp.concatenate([o, d, misc_f], axis=1)
        return jnp.take(packf, idx, axis=0), jnp.take(misc_i, idx, axis=0)

    misc_f = jax.random.normal(key, (n, 7), jnp.float32)
    misc_i = jax.random.randint(key, (n, 5), 0, 1 << 20, dtype=jnp.int32)
    bench(jax.jit(reorder), key_om, og, dd, misc_f, misc_i,
          label="carry reorder (sort + 13f32 + 5i32 takes)")

    # shadow rays from morton-SORTED origins toward 2 interleaved lights
    idx = jnp.argsort(m)
    ogs = og[idx]
    l0 = jnp.array([10.0, 10.0, 10.0])
    l1 = jnp.array([-10.0, 10.0, -10.0])
    pick = jax.random.bernoulli(jax.random.PRNGKey(7), 0.5, (n,))
    dl0 = l0[None] - ogs
    dl0 = dl0 / jnp.linalg.norm(dl0, axis=1, keepdims=True)
    dl1 = l1[None] - ogs
    dl1 = dl1 / jnp.linalg.norm(dl1, axis=1, keepdims=True)
    dmix = jnp.where(pick[:, None], dl0, dl1)

    bench(fa, ogs, dmix, t0, ones, label="shadow sorted-origin mixed 2-light")

    def two_pass(o, d, t, pick):
        t1, h1, _, _ = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
            active=pick.astype(jnp.int32), any_hit=True)
        t2, h2, _, _ = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
            active=(~pick).astype(jnp.int32), any_hit=True)
        return jnp.where(pick, t1, t2), jnp.where(pick, h1, h2)

    bench(jax.jit(two_pass), ogs, dmix, t0, pick,
          label="shadow sorted-origin per-light masked x2")

    # shadow fully sorted by (light, morton): one coherent pass
    key_lm = pick.astype(jnp.int32) * (1 << 15) + morton15(ogs, lo, inv_ext)
    idx2 = jnp.argsort(key_lm)
    bench(fa, ogs[idx2], dmix[idx2], t0, ones,
          label="shadow sorted by (light, morton)")

    # coherent primary baseline for reference
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    cam = camlib.to_arrays(CameraConfig())
    lane = jnp.arange(1920 * 1080, dtype=jnp.uint32)
    o, d, _ = camlib.blocked_lane_rays(cam, lane, 1920, 1080, 8, 128)
    tt = jnp.full((1920 * 1080,), 1e30, jnp.float32)
    bench(f, o, d, tt, jnp.ones((1920 * 1080,), jnp.int32),
          label="primary coherent (1080p blocked)")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
