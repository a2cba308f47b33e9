"""Per-launch cost of the packet kernel when traversal is trivial (a
~20-tri scene): chain K data-dependent launches inside one jit and
divide.  Separates the fixed pallas launch cost (input/output layout
conversion of 1-D operands, grid setup) from real traversal work, and
A/B-tests a 2-D-block variant of the same kernel to see whether the 1-D
block layout is what costs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_loop(step, init, K=8, warmup=1, iters=3, label=""):
    def run(x):
        return jax.lax.fori_loop(0, K, step, x)

    run = jax.jit(run)
    for _ in range(warmup):
        jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{label:56s} {dt * 1000:9.3f} ms/launch", flush=True)
    return dt


def main():
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import Scene
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    s.add_mesh("oct", meshlib.icosphere(subdivisions=0), white)
    dev = s.device()
    print("backend:", jax.default_backend(), "nodes:", dev.pnodes.shape, flush=True)

    n = 2_073_600
    cam = camlib.to_arrays(CameraConfig(aspect=16 / 9))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, _ = camlib.blocked_lane_rays(cam, lane, 1920, 1080, 8, 128)
    t0v = jnp.full((n,), 1e30, jnp.float32)

    def step(i, t):
        tt, hit, obj, nrm, dep, iid = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.proots
        )
        # data dependence: keep t large so traversal stays trivial
        return jnp.maximum(tt, 1e29) + jnp.float32(0.0) * dep.astype(jnp.float32)

    bench_loop(step, t0v, label="packet launch, tiny scene, 1080p (closest)")

    def step_any(i, t):
        tt, hit, obj, nrm, dep, iid = pk.traverse_packet_slim(
            o, d, t, dev.pnodes, dev.pltris, dev.proots, any_hit=True
        )
        return jnp.maximum(tt, 1e29)

    bench_loop(step_any, t0v, label="packet launch, tiny scene, any-hit")


if __name__ == "__main__":
    main()
