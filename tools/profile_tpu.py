"""Round-2 performance profiling on the real TPU chip.

Times (a) XLA data-movement primitives at wavefront scale (sort, gather,
scatter, cumsum counting-sort) to cost out bounce-boundary ray reordering,
(b) the packet kernel on coherent vs incoherent ray sets, (c) the phases
of a full config-3 frame.  Prints one labeled line per measurement.

Usage: python tools/profile_tpu.py [section ...]
Sections: prims, kernel, frame (default: all)
"""

from __future__ import annotations

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
    print(f"{label:55s} {dt * 1000:9.3f} ms")
    return dt


def section_prims():
    print("== XLA primitives at 2M wavefront scale ==")
    n = 1920 * 1080
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    oct8 = jax.random.randint(key, (n,), 0, 8, dtype=jnp.int32)
    perm = jax.random.permutation(key, n)
    x3 = jax.random.normal(key, (n, 3), jnp.float32)
    x1 = jax.random.normal(key, (n,), jnp.float32)

    bench(jax.jit(lambda k: jax.lax.sort(k)), keys, label="lax.sort keys (N,) i32")
    bench(
        jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
        keys, perm.astype(jnp.int32),
        label="lax.sort key+payload i32",
    )
    bench(jax.jit(lambda k: jnp.argsort(k)), oct8, label="argsort 8-valued keys")
    bench(jax.jit(lambda x, p: x[p]), x1, perm, label="gather (N,) f32 by perm")
    bench(jax.jit(lambda x, p: x[p]), x3, perm, label="gather (N,3) f32 by perm")
    bench(
        jax.jit(lambda x, p: jnp.take(x, p, axis=0)), x3, perm,
        label="take (N,3) f32 by perm",
    )
    bench(
        jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x)), x3, perm,
        label="scatter (N,3) f32 by perm",
    )
    bench(
        jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x)), x1, perm,
        label="scatter (N,) f32 by perm",
    )
    bench(jax.jit(lambda m: jnp.cumsum(m)), oct8, label="cumsum (N,) i32")

    def counting_rank(octant):
        # dest position for an 8-bucket counting sort, all vector ops
        onehot = (octant[:, None] == jnp.arange(8)[None, :]).astype(jnp.int32)
        within = jnp.cumsum(onehot, axis=0) - onehot  # rank within bucket
        totals = jnp.sum(onehot, axis=0)
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(totals)[:-1]])
        dest = jnp.sum(onehot * (offsets[None, :] + within), axis=1)
        return dest

    bench(jax.jit(counting_rank), oct8, label="counting-sort dest (N,8) onehot+cumsum")

    def full_reorder(octant, o, d):
        dest = counting_rank(octant)
        inv = jnp.zeros_like(dest).at[dest].set(
            jnp.arange(dest.shape[0], dtype=jnp.int32)
        )
        return o[inv], d[inv]

    bench(
        jax.jit(full_reorder), oct8, x3, x3,
        label="full octant reorder: rank+inv-scatter+2 gathers",
    )


def _packet_setup():
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.scene import make_reference_scene

    scene = make_reference_scene()
    dev = scene.device()
    w, h = 1920, 1080
    cam = camlib.to_arrays(CameraConfig())
    lane = jnp.arange(w * h, dtype=jnp.uint32)
    bh, bw = camlib.block_shape(w, h)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, bh, bw)
    return dev, o, d, w * h


def section_kernel():
    print("== packet kernel: coherent vs incoherent ==")
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    dev, o, d, n = _packet_setup()
    t0 = jnp.full((n,), 1e30, jnp.float32)

    f = jax.jit(
        lambda o, d, t: pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots
        )
    )
    dt = bench(f, o, d, t0, label=f"primary coherent {n} rays")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # incoherent: shuffle ray order (same rays, destroyed locality)
    key = jax.random.PRNGKey(1)
    perm = jax.random.permutation(key, n)
    os, ds = o[perm], d[perm]
    dt = bench(f, os, ds, t0, label=f"primary shuffled {n} rays")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # diffuse-bounce-like: random origins on ground plane, random up dirs
    ko, kd = jax.random.split(key)
    og = jnp.stack(
        [
            jax.random.uniform(ko, (n,), minval=-20, maxval=20),
            jnp.full((n,), -2.99),
            jax.random.uniform(kd, (n,), minval=-20, maxval=20),
        ],
        axis=1,
    )
    dd = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    dd = dd * jnp.where(dd[:, 1:2] < 0, -1.0, 1.0)
    dt = bench(f, og, dd, t0, label="bounce-like incoherent rays")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # same rays sorted by direction octant
    octant = (
        (dd[:, 0] > 0).astype(jnp.int32)
        + 2 * (dd[:, 1] > 0).astype(jnp.int32)
        + 4 * (dd[:, 2] > 0).astype(jnp.int32)
    )
    idx = jnp.argsort(octant)
    dt = bench(f, og[idx], dd[idx], t0, label="bounce-like, octant-sorted")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # octant + origin morton sorted
    q = jnp.clip(((og + 20.0) / 40.0 * 32).astype(jnp.int32), 0, 31)
    def spread(v):
        v = (v | (v << 8)) & 0x0300F
        v = (v | (v << 4)) & 0x030C3
        v = (v | (v << 2)) & 0x09249
        return v
    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    keyv = octant * (1 << 16) + morton
    idx2 = jnp.argsort(keyv)
    dt = bench(f, og[idx2], dd[idx2], t0, label="bounce-like, octant+morton sorted")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # shadow-fan-like: origins on ground, all aimed at light 0
    lightc = jnp.array([10.0, 10.0, 10.0])
    dl = lightc[None, :] - og
    dl = dl / jnp.linalg.norm(dl, axis=1, keepdims=True)
    fa = jax.jit(
        lambda o, d, t: pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
            any_hit=True,
        )
    )
    dt = bench(fa, og, dl, t0, label="shadow fan -> light0 (any-hit)")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # mixed 2-light fan (the NEE reality): half to each light, interleaved
    light2 = jnp.array([-10.0, 10.0, -10.0])
    pick = jax.random.bernoulli(jax.random.PRNGKey(5), 0.5, (n,))
    dmix = jnp.where(pick[:, None], dl, (light2[None] - og)
                     / jnp.linalg.norm(light2[None] - og, axis=1, keepdims=True))
    dt = bench(fa, og, dmix, t0, label="shadow fan -> 2 lights interleaved")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # same but each light's rays as a masked pass
    def two_pass(o, d, t, pick):
        t1, h1, _, _ = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
            active=pick.astype(jnp.int32), any_hit=True,
        )
        t2, h2, _, _ = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots,
            active=(~pick).astype(jnp.int32), any_hit=True,
        )
        return jnp.where(pick, t1, t2), jnp.where(pick, h1, h2)

    dt = bench(jax.jit(two_pass), og, dmix, t0, pick,
               label="shadow 2 lights, per-light masked passes")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # launch overhead: tiny batch
    o1, d1 = o[:1024], d[:1024]
    t1 = t0[:1024]
    bench(f, o1, d1, t1, label="1-tile launch (1024 rays)")


def section_frame():
    print("== config-3 frame phases (1080p dragon, advanced) ==")
    from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.renderer import render_frame_kernel
    from cpugpupathtracing_tpu.models.scene import make_reference_scene

    scene = make_reference_scene()
    dev = scene.device()
    w, h = 1920, 1080
    n = w * h
    cam = camlib.to_arrays(CameraConfig())
    settings = RenderSettings()
    acc = jnp.zeros((n, 4), jnp.float32)
    lane = jnp.arange(n, dtype=jnp.uint32)

    def frame(acc):
        return render_frame_kernel(
            dev, cam, acc, jnp.int32(0), lane, settings, w, h, 1, 0x12345678
        )

    dt = bench(frame, acc, warmup=1, iters=3, label="full frame (advanced, depth 5)")
    a2, p2, traced, es = frame(acc)
    tr = int(traced)
    print(f"    traced={tr}  -> {tr / dt / 1e6:8.2f} Mrays/s")

    for md in (0, 1, 2):
        s2 = settings.replace(max_ray_depth=md)

        def fmd(acc, s2=s2):
            return render_frame_kernel(
                dev, cam, acc, jnp.int32(0), lane, s2, w, h, 1, 0x12345678
            )

        dt = bench(fmd, acc, warmup=1, iters=3, label=f"frame @max_depth={md}")
        _, _, traced, _ = fmd(acc)
        print(f"    traced={int(traced)}  -> {int(traced) / dt / 1e6:8.2f} Mrays/s")

    s_nonee = settings.replace(next_event_estimation=False)

    def fn2(acc):
        return render_frame_kernel(
            dev, cam, acc, jnp.int32(0), lane, s_nonee, w, h, 1, 0x12345678
        )

    dt = bench(fn2, acc, warmup=1, iters=3, label="frame, NEE off")
    _, _, traced, _ = fn2(acc)
    print(f"    traced={int(traced)}  -> {int(traced) / dt / 1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["prims", "kernel", "frame"]
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    for s in sections:
        globals()[f"section_{s}"]()
