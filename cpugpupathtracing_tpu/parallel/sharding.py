"""Multi-chip rendering via jax.sharding + shard_map.

The reference's only parallelism is data-parallel pixel tiles on a
shared-memory thread pool with a per-frame spin barrier
(Source/ThreadPool.cpp:135-179, Source/Main.cpp:753-754).  The TPU-native
equivalents (SURVEY.md section 2.3):

  * PIXELS sharding -- the framebuffer's lanes are split across chips
    (each chip owns H*W/D contiguous rays and its accumulator slice);
    embarrassingly parallel, zero collectives until the host gathers the
    final image.  This is the reference's tile decomposition mapped onto
    a device mesh, with the per-frame barrier implicit in the jitted step.
  * SAMPLES sharding -- every chip traces the full frame with a disjoint
    RNG sample stream and the per-frame energies are summed with a psum
    over ICI; the accumulator is replicated.  This is the
    samples-per-pixel axis (the workload's only other scaling axis)
    sharded, and is also how spp>chips configurations compose with pixel
    sharding on a 2-D mesh.

Scene/material/BVH arrays are replicated (they are read-only per frame
and small next to HBM), rays and framebuffers are sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cpugpupathtracing_tpu.config import RenderMode, RenderSettings
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models.scene import DeviceScene
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import vec4_to_uint


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _trace(dev, settings, origin, direction, state):
    if settings.render_mode == RenderMode.BRUTE_FORCE:
        fn = integrators.trace_brute
    elif settings.render_mode == RenderMode.WHITTED:
        from cpugpupathtracing_tpu.models.whitted import trace_whitted

        fn = trace_whitted
    else:
        fn = integrators.trace_advanced
    return integrators.trace_chunked(fn, dev, settings, origin, direction, state)


@functools.partial(
    jax.jit,
    static_argnames=("settings", "width", "height", "spp", "seed", "mesh", "shard_mode"),
    keep_unused=True,
)
def render_frame_sharded(
    dev: DeviceScene,
    cam: camlib.CameraArrays,
    accumulator,   # (H*W, 4) f32, sharded over lanes (PIXELS) or replicated
    sample_base,   # () i32
    lane,          # (H*W,) u32 global lane indices
    settings: RenderSettings,
    width: int,
    height: int,
    spp: int,
    seed: int,
    mesh: Mesh,
    shard_mode: str = "pixels",
):
    """One progressive frame over a device mesh.

    Returns (accumulator', pixels_u32, traced_rays).  With
    shard_mode="pixels", accumulator/pixels are lane-sharded and
    traced_rays is psum-reduced; with "samples", each device contributes
    spp samples (total spp * n_devices per frame) and energies psum.
    """
    n = width * height
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    if n % d != 0:
        raise ValueError(f"pixel count {n} not divisible by {d} devices")

    if shard_mode == "pixels":

        def body(acc_shard, lanes):
            origin, direction = camlib.lane_rays(cam, lanes, width, height)
            energy = jnp.zeros((n // d, 3), jnp.float32)
            traced = jnp.zeros((), jnp.int32)
            for s in range(spp):
                stream = (sample_base + s).astype(jnp.uint32)
                st = rnglib.seed_lanes(lanes, stream, salt=seed & 0xFFFFFFFF)
                _, res = _trace(dev, settings, origin, direction, st)
                energy = energy + res.energy
                traced = traced + res.traced_rays
            sample = jnp.concatenate(
                [energy, jnp.full((n // d, 1), float(spp), jnp.float32)], axis=1
            )
            acc_shard = acc_shard + sample
            pix = vec4_to_uint(acc_shard / jnp.maximum(acc_shard[:, 3:4], 1.0))
            return acc_shard, pix, jax.lax.psum(traced, axis)

        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )
        return fn(accumulator, lane)

    if shard_mode == "samples":

        def body(acc_rep, lanes):
            shard = jax.lax.axis_index(axis)
            origin, direction = camlib.lane_rays(cam, lanes, width, height)
            energy = jnp.zeros((n, 3), jnp.float32)
            traced = jnp.zeros((), jnp.int32)
            for s in range(spp):
                stream = (
                    sample_base + shard.astype(jnp.int32) * spp + s
                ).astype(jnp.uint32)
                st = rnglib.seed_lanes(lanes, stream, salt=seed & 0xFFFFFFFF)
                _, res = _trace(dev, settings, origin, direction, st)
                energy = energy + res.energy
                traced = traced + res.traced_rays
            # sum sample sets across chips over ICI
            energy = jax.lax.psum(energy, axis)
            traced = jax.lax.psum(traced, axis)
            sample = jnp.concatenate(
                [energy, jnp.full((n, 1), float(spp * d), jnp.float32)], axis=1
            )
            acc = acc_rep + sample
            pix = vec4_to_uint(acc / jnp.maximum(acc[:, 3:4], 1.0))
            return acc, pix, traced

        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return fn(accumulator, lane)

    raise ValueError(f"unknown shard_mode {shard_mode}")
