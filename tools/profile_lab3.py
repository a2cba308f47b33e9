"""On-chip wall-time for the 16-wide lab kernel (tools/kernel_lab3.py)
on the real config-3 bounce population, vs the production-equivalent
W8 path run on the same rays.  Interpret-mode parity and iteration
counts come from tools/tree_lab16.py (CPU); this script answers the
one question that needs the chip: ns per W16 iteration (the slab phase
doubles, the control chain does not).

    python tools/profile_lab3.py          (on the TPU)
"""

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

from cpugpupathtracing_tpu.config import BuildOption, CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.ops import sampling, traverse_packet_slim as pk
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX
from tools.kernel_lab3 import scene_tables16, traverse16


def bench(label, f, *args):
    res = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(4):
        res = f(*args)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / 4
    iters = int(np.asarray(res[-1]).sum())
    print(f"{label:28s} {iters:8d} iters  {dt * 1000:7.2f} ms  "
          f"{dt * 1e9 / max(iters, 1):6.0f} ns/iter", flush=True)
    return res


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = scenelib.make_reference_scene()
    dev = scene.device()
    w, h = 1920, 1080
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    t0v = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.ones((n,), jnp.int32)

    t, tri, obj, nrm_c, depth, _ = pk.traverse_packet_slim(
        o, d, t0v, dev.pnodes, dev.pltris, dev.proots, active=act
    )
    normal = jnp.stack(nrm_c, axis=1)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=7)
    pos = o + d * t[:, None]
    state, bd = sampling.cosine_weighted(state, normal)
    hit_mesh = tri >= 0
    bo = jnp.where(hit_mesh[:, None], pos + bd * RAY_NUDGE, o)
    bdir = jnp.where(hit_mesh[:, None], bd, d)
    bact = hit_mesh.astype(jnp.int32)
    bo_c = (bo[:, 0], bo[:, 1], bo[:, 2])
    bd_c = (bdir[:, 0], bdir[:, 1], bdir[:, 2])
    print(f"bounce population: {int(bact.sum()) / 1e6:.2f}M lanes", flush=True)

    # W8 reference on the same rays (production kernel, default flags)
    f8 = jax.jit(lambda o_, d_, a_: pk.traverse_packet_slim(
        o_, d_, t0v, dev.pnodes, dev.pltris, dev.proots, active=a_,
        count_depth=False, count_iters=True,
    ))
    r8 = bench("W8 production (default)", f8, bo_c, bd_c, bact)

    # W16 lab tables (sweep binary + width-16 DP)
    objs = []
    for oi, obj_ in enumerate(scene.objects):
        if obj_.kind == scenelib.PRIM_MESH:
            pb = obj_.bvh.rebuild(
                BuildOption.SAH_SPLIT_PRIMITIVES, max_leaf_size=8)
            objs.append((pb, oi))
    fused, nn, roots = scene_tables16(objs)
    print(f"W16 tables: {nn} nodes + {fused.shape[0] - nn} leaf rows "
          f"({fused.nbytes / 1e6:.1f} MB)", flush=True)
    f16 = jax.jit(lambda o_, d_, a_: traverse16(
        o_, d_, t0v, fused, roots, active=a_, nn=nn, count_iters=True,
    ))
    try:
        r16 = bench("W16 lab (fs+condpush)", f16, bo_c, bd_c, bact)
    except Exception as e:
        print(f"W16 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    # sanity: same hits.  W16 leaf records carry per-object-LOCAL tri
    # ids (scene_tables16 stamps only the obj column) while production
    # W8 records are globalized with each mesh's tri offset -- map via
    # the hit object before comparing.
    tri_off = {}
    off = 0
    for oi, obj_ in enumerate(scene.objects):
        if obj_.kind == scenelib.PRIM_MESH:
            tri_off[oi] = off
            off += obj_.bvh.num_triangles
    live = np.asarray(bact) != 0
    t16 = np.asarray(r16[1])[live]
    o16 = np.asarray(r16[2])[live]
    glob16 = t16.copy()
    for oi, toff in tri_off.items():
        glob16[(o16 == oi) & (t16 >= 0)] += toff
    same = np.array_equal(glob16, np.asarray(r8[1])[live])
    print(f"hit parity W16 vs W8: {same}", flush=True)


if __name__ == "__main__":
    main()
