"""Traversal-iteration census on the benchmark dragon scene: how many
kernel while-iterations do primary vs bounce wavefronts cost, and what
does the coherence sort buy in iterations?  Uses the packet kernel's
count_iters diagnostic output; times are rough (eager dispatch), the
iteration counts are exact."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import (
    hit_surface, make_reference_scene, reorder_key,
)
from cpugpupathtracing_tpu.ops import sampling, traverse_packet_slim as pk
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX


def census(dev, o, d, act, label, any_hit=False):
    t0v = jnp.full((o.shape[0],), RAY_TMAX, jnp.float32)
    f = jax.jit(
        lambda o, d, a: pk.traverse_packet_slim(
            o, d, t0v, dev.pnodes, dev.pltris, dev.proots,
            active=a, any_hit=any_hit, count_iters=True,
        )
    )
    res = f(o, d, act)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(4):
        res = f(o, d, act)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / 4
    iters = np.asarray(res[6])
    nact = int(np.asarray(act).sum()) if act is not None else o.shape[0]
    print(
        f"{label:42s} {iters.sum():9d} iters "
        f"(max/tile {iters.max():4d}, mean {iters.mean():6.1f}) "
        f"{dt * 1000:8.2f} ms  {nact / 1e6:.2f}M act "
        f"{dt * 1e9 / max(iters.sum(), 1):6.0f} ns/iter",
        flush=True,
    )
    return res


def main():
    print("backend:", jax.default_backend(), flush=True)
    dev = make_reference_scene().device()
    w, h = 1920, 1080
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    act = jnp.ones((n,), jnp.int32)

    res = census(dev, o, d, act, "primary (blocked order)")
    t, tri, obj, nrm_c, depth, _ = res[:6]
    normal = jnp.stack(nrm_c, axis=1)

    # synthesize a depth-1 diffuse bounce population from the real hits
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=7)
    pos = o + d * t[:, None]
    state, bd = sampling.cosine_weighted(state, normal)
    hit_mesh = tri >= 0
    bo = jnp.where(hit_mesh[:, None], pos + bd * RAY_NUDGE, o)
    bdir = jnp.where(hit_mesh[:, None], bd, d)
    bact = hit_mesh.astype(jnp.int32)
    print(f"bounce population: {int(bact.sum()) / 1e6:.2f}M active lanes", flush=True)

    census(dev, bo, bdir, bact, "bounce, unsorted")

    key = reorder_key(dev, bo, bdir, bact)
    perm = jnp.argsort(key)
    census(
        dev, jnp.take(bo, perm, axis=0), jnp.take(bdir, perm, axis=0),
        jnp.take(bact, perm), "bounce, sorted (act|octant|morton)",
    )

    # shadow-style population: direction to light 0 center from hits
    to_l = jnp.asarray([10.0, 10.0, 10.0]) - pos
    to_l = to_l / jnp.linalg.norm(to_l, axis=1, keepdims=True)
    census(
        dev, jnp.where(hit_mesh[:, None], pos + to_l * RAY_NUDGE, o),
        jnp.where(hit_mesh[:, None], to_l, d), bact,
        "shadow fan, unsorted, any-hit", any_hit=True,
    )
    key = reorder_key(dev, pos, to_l, bact)
    perm = jnp.argsort(key)
    census(
        dev,
        jnp.take(jnp.where(hit_mesh[:, None], pos + to_l * RAY_NUDGE, o), perm, axis=0),
        jnp.take(jnp.where(hit_mesh[:, None], to_l, d), perm, axis=0),
        jnp.take(bact, perm), "shadow fan, sorted, any-hit", any_hit=True,
    )


if __name__ == "__main__":
    main()
