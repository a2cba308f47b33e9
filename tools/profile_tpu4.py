"""True device-time of the packet kernel: chain K launches inside ONE jit
(data-dependent via t feedback) and divide.  Separates fixed per-launch
cost from per-tile cost and measures coherence sensitivity without any
host/tunnel dispatch noise."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, warmup=1, iters=3, label="", K=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{label:58s} {dt * 1000:9.3f} ms/launch")
    return dt


def main():
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    dev = make_reference_scene().device()
    K = 8

    def chained(o, d, t):
        def body(i, t):
            t2, hit, _, _ = pk.traverse_packet_slim(
                o, d, t, dev.pnodes, dev.pltris, dev.pleaf_id, dev.proots
            )
            # data dependence: reset to t_init but keep the chain live
            return jnp.where(hit >= -1, t, t2 * 0 + t)

        return jax.lax.fori_loop(0, K, body, t)

    cj = jax.jit(chained)

    for ntiles in (1, 4, 16, 256, 2025):
        n = ntiles * 1024
        cam = camlib.to_arrays(CameraConfig())
        lane = jnp.arange(n, dtype=jnp.uint32)
        if n >= 1024:
            w = 128
            h = n // 128
            oo, dd, _ = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
        tt = jnp.full((n,), 1e30, jnp.float32)
        dt = bench(cj, oo, dd, tt, K=K, label=f"chained packet x{K}, {ntiles} tiles coherent")
        if ntiles == 2025:
            print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")

    # incoherent: shuffled full frame
    n = 2025 * 1024
    cam = camlib.to_arrays(CameraConfig())
    lane = jnp.arange(n, dtype=jnp.uint32)
    oo, dd, _ = camlib.blocked_lane_rays(cam, lane, 128, n // 128, 8, 128)
    perm = jax.random.permutation(jax.random.PRNGKey(1), n)
    tt = jnp.full((n,), 1e30, jnp.float32)
    dt = bench(cj, oo[perm], dd[perm], tt, K=K, label="chained packet, full frame shuffled")
    print(f"    -> {n / dt / 1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
