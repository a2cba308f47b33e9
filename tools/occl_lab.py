"""Occlusion-table lab: A/B the NEE shadow fan (the frame's hottest
launch, ~210k of 767k frame iterations per profile_mega_census) between
the shading packet tables and the occlusion-specialized tables
(CPUGPU_OCCL, bvh8.to_slim_occl: 14 bare stride-9 records per leaf row
over a leaf_max=14 SAH-DP collapse).

Measures, on the config-3 reference scene at 1080p:
  * exact kernel iteration counts (count_iters) -- the tree-shape win
  * wall-clock for the any-hit launch -- whether the fatter leaf phase
    (14 vs 8 Moller-Trumbore tests per iteration, but with no payload
    selects) prices the iterations away
  * occluded-bit parity between the two paths (must be identical)

    python tools/occl_lab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
os.environ["CPUGPU_OCCL"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import make_reference_scene, occl_tables
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from cpugpupathtracing_tpu.config import CameraConfig

W, H = 1920, 1080


def run(nodes, ltris, roots, o, d, act, tmax, label, occl):
    f = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, nodes, ltris, roots,
        active=a, any_hit=True, count_depth=False, count_iters=True,
        occl=occl,
    ))
    res = f(o, d, act, tmax)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(5):
        res = f(o, d, act, tmax)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / 5
    iters = np.asarray(res[-1])
    nact = int(np.asarray(act).sum())
    print(f"  {label:22s} {iters.sum():9d} it (max {iters.max():4d}) "
          f"{dt * 1e3:7.1f} ms  {nact / dt / 1e6:6.1f} Mrays/s",
          flush=True)
    return np.asarray(res[1]) >= 0, int(iters.sum()), dt


def main():
    dev = make_reference_scene().device()
    occ = occl_tables(dev)
    assert occ is not None, "occl tables missing (instanced scene?)"
    onodes, oltris, oroots, oents = occ
    print("backend:", jax.default_backend(), flush=True)
    print(f"shading tables: {dev.pnodes.shape[0]} nodes, "
          f"{dev.pltris.shape[0]} leaf rows", flush=True)
    print(f"occl tables:    {onodes.shape[0]} nodes, "
          f"{oltris.shape[0]} leaf rows", flush=True)

    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    carr = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    bh, bw = camlib.block_shape(W, H)
    o0, d0, pix = camlib.blocked_lane_rays(carr, lane, W, H, bh, bw)
    t_init = jnp.full((n,), 1e34, jnp.float32)
    ones = jnp.ones((n,), jnp.int32)

    # ---- primary hits (exactly fan_lab's construction) ----
    t, tri, obj, (nx, ny, nz), _, _ = jax.jit(
        lambda: pk.traverse_packet_slim(
            (o0[:, 0], o0[:, 1], o0[:, 2]), (d0[:, 0], d0[:, 1], d0[:, 2]),
            t_init, dev.pnodes, dev.pltris, dev.proots,
            active=ones, count_depth=False,
        )
    )()
    jax.block_until_ready(t)
    hitm = tri >= 0
    px = o0 + d0 * t[:, None]
    print(f"primary hits: {int(hitm.sum())} of {n}", flush=True)

    # ---- depth-0 NEE shadow fan: one of the two reference light
    # spheres at random, like sample_light ----
    kk = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(kk)
    centers = np.asarray(dev.light_sph_center)
    radii = np.asarray(dev.light_sph_radius)
    li = jax.random.randint(k1, (n,), 0, len(centers))
    lc = jnp.asarray(centers)[li]
    lr = jnp.asarray(radii)[li][:, None]
    u = jax.random.normal(k2, (n, 3))
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    to_p = px - lc
    u = jnp.where(jnp.sum(u * to_p, axis=1, keepdims=True) < 0, -u, u)
    lp = lc + u * lr
    sv = lp - px
    dist = jnp.linalg.norm(sv, axis=1, keepdims=True)
    sd = sv / jnp.maximum(dist, 1e-9)
    so = px + sd * 1e-3
    stmax = (dist[:, 0] - 2e-3)
    sact = hitm.astype(jnp.int32)

    print("depth-0 NEE shadow fan (camera-blocked order):", flush=True)
    h_std, it_std, dt_std = run(
        dev.pnodes, dev.pltris, dev.proots, so, sd, sact, stmax,
        "shading tables", False)
    h_occ, it_occ, dt_occ = run(
        onodes, oltris, oroots, so, sd, sact, stmax,
        "occl tables", True)
    agree = (h_std == h_occ).all()
    print(f"  occluded-bit parity: {'OK' if agree else 'MISMATCH'}",
          flush=True)
    print(f"  iterations: {it_occ / max(it_std, 1):.3f}x   "
          f"time: {dt_occ / dt_std:.3f}x", flush=True)
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
