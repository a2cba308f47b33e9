"""16-wide occlusion tree census (round-5 VERDICT item 2): exact
any-hit iteration counts of the NEE shadow fans on the config-3 scene,
8-wide occl tables vs the CPUGPU_OCCL_W16 16-wide build, plus
occluded-bit parity and wall-clock.

The w16 closest-hit experiment lost on slab-ALU pricing (round 4), but
the shadow fan is per-ray node-walk DEPTH-bound: if the halved depth
cuts iterations >= ~15%, an on-chip bench A/B is warranted
(tools/run_r5_occl16.sh).

    python tools/occl16_lab.py [WxH]
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
from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from cpugpupathtracing_tpu.config import CameraConfig

W, H = 1920, 1080
if len(sys.argv) > 1:
    W, H = (int(v) for v in sys.argv[1].split("x"))


def run(nodes, ltris, roots, o, d, act, tmax, label, width):
    f = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, nodes, ltris, roots,
        active=a, any_hit=True, count_depth=False, count_iters=True,
        occl=True, width=width,
    ))
    res = f(o, d, act, tmax)
    jax.block_until_ready(res)
    t0_ = time.perf_counter()
    for _ in range(5):
        res = f(o, d, act, tmax)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0_) / 5
    iters = int(np.asarray(res[-1]).sum())
    print(f"  {label:14s} {iters:9d} it  {dt * 1e3:7.1f} ms", flush=True)
    return np.asarray(res[1]) >= 0, iters, dt


def main():
    print(f"occl16_lab {W}x{H} backend={jax.default_backend()}", flush=True)
    dev8 = scenelib.make_reference_scene().device()
    assert dev8.poccl_nodes is not None and dev8.poccl_width == 8

    scenelib.PACKET_OCCL_W16 = True
    dev16 = scenelib.make_reference_scene().device()
    assert dev16.poccl_width == 16, "w16 occl build did not engage"
    scenelib.PACKET_OCCL_W16 = False
    print(f"w8 occl: {dev8.poccl_nodes.shape[0]} rows; "
          f"w16 occl: {dev16.poccl_nodes.shape[0]} rows", flush=True)

    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    carr = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    bh, bw = camlib.block_shape(W, H)
    o0, d0, pix = camlib.blocked_lane_rays(carr, lane, W, H, bh, bw)
    t_init = jnp.full((n,), 1e34, jnp.float32)
    ones = jnp.ones((n,), jnp.int32)

    # primary hits -> d0 NEE shadow fan (same recipe as occl_lab)
    t, tri, obj, _, _, _ = jax.jit(
        lambda: pk.traverse_packet_slim(
            (o0[:, 0], o0[:, 1], o0[:, 2]), (d0[:, 0], d0[:, 1], d0[:, 2]),
            t_init, dev8.pnodes, dev8.pltris, dev8.proots,
            active=ones, count_depth=False,
        )
    )()
    jax.block_until_ready(t)
    hitm = tri >= 0
    px = o0 + d0 * t[:, None]
    kk = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(kk)
    centers = np.asarray(dev8.light_sph_center)
    radii = np.asarray(dev8.light_sph_radius)
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
    h8, it8, dt8 = run(dev8.poccl_nodes, dev8.poccl_ltris,
                       dev8.poccl_roots, so, sd, sact, stmax, "w8 occl", 8)
    h16, it16, dt16 = run(dev16.poccl_nodes, dev16.poccl_ltris,
                          dev16.poccl_roots, so, sd, sact, stmax,
                          "w16 occl", 16)
    agree = (h8 == h16).all()
    print(f"  occluded-bit parity: {'OK' if agree else 'MISMATCH'}",
          flush=True)
    print(f"  iterations: w16/w8 = {it16 / max(it8, 1):.3f}   "
          f"time: {dt16 / max(dt8, 1e-9):.3f}x", flush=True)
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
