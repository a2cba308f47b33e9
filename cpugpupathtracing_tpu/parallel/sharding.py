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
from cpugpupathtracing_tpu.models.renderer import trace_sample
from cpugpupathtracing_tpu.models.scene import DeviceScene
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import vec4_to_uint


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _shard_rays(cam, lanes, width, height, settings):
    """Ray generation for a shard's lane slice: the same pixel-block
    ordering as the single-chip fast path (renderer.render_frame_kernel)
    when the resolution tiles, else row-major.  `lanes` are global
    blocked-enumeration slots; RNG keys on the true pixel index, so the
    image is bitwise independent of both the ordering and the shard
    decomposition.  Returns (origin, direction, pix, block_shape)."""
    bs = camlib.block_shape(width, height)
    if bs is not None and settings.render_mode != RenderMode.COMPARISON:
        bh, bw = bs
        origin, direction, pix = camlib.blocked_lane_rays(
            cam, lanes, width, height, bh, bw
        )
        return origin, direction, pix, bs
    origin, direction = camlib.lane_rays(cam, lanes, width, height)
    return origin, direction, lanes, None


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
    if settings.render_mode == RenderMode.COMPARISON:
        raise ValueError(
            "COMPARISON is a single-chip split-screen debug view; "
            "render it with render_frame_kernel"
        )
    bs = camlib.block_shape(width, height)

    if shard_mode == "pixels":
        # Each chip traces a contiguous slice of the BLOCKED lane
        # enumeration -- the identical coherent ray order, packet kernel,
        # and wavefront sorting as the single-chip fast path -- and the
        # blocked->row-major permutation runs once per frame OUTSIDE the
        # shard_map (one (N, 3) reshard over ICI, negligible next to the
        # trace).  RNG keys on true pixel index, so the accumulator is
        # bitwise identical to the single-chip frame.

        def body(lanes):
            origin, direction, pix, _ = _shard_rays(
                cam, lanes, width, height, settings
            )
            shard = jax.lax.axis_index(axis)
            local_idx = lanes.astype(jnp.int32) - shard.astype(jnp.int32) * (
                n // d
            )
            energy = jnp.zeros((n // d, 3), jnp.float32)
            traced = jnp.zeros((), jnp.int32)
            for s in range(spp):
                stream = (sample_base + s).astype(jnp.uint32)
                st = rnglib.seed_lanes(pix, stream, salt=seed & 0xFFFFFFFF)
                _, res = trace_sample(dev, settings, origin, direction, st, local_idx)
                energy = energy + res.energy
                traced = traced + res.traced_rays
            return energy, jax.lax.psum(traced, axis)

        energy, traced = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis),),
            out_specs=(P(axis), P()),
            check_vma=False,
        )(lane)
        if bs is not None:
            energy = camlib.unblock_image(energy, width, height, bs[0], bs[1])

        def accum(acc_shard, energy_shard):
            sample = jnp.concatenate(
                [
                    energy_shard,
                    jnp.full((n // d, 1), float(spp), jnp.float32),
                ],
                axis=1,
            )
            acc_shard = acc_shard + sample
            pix = vec4_to_uint(acc_shard / jnp.maximum(acc_shard[:, 3:4], 1.0))
            return acc_shard, pix

        acc, pixels = shard_map(
            accum,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )(accumulator, energy)
        return acc, pixels, traced

    if shard_mode == "samples":

        def body(acc_rep, lanes):
            shard = jax.lax.axis_index(axis)
            origin, direction, pix, bs_ = _shard_rays(
                cam, lanes, width, height, settings
            )
            energy = jnp.zeros((n, 3), jnp.float32)
            traced = jnp.zeros((), jnp.int32)
            for s in range(spp):
                stream = (
                    sample_base + shard.astype(jnp.int32) * spp + s
                ).astype(jnp.uint32)
                st = rnglib.seed_lanes(pix, stream, salt=seed & 0xFFFFFFFF)
                _, res = trace_sample(
                    dev, settings, origin, direction, st,
                    lanes.astype(jnp.int32),
                )
                energy = energy + res.energy
                traced = traced + res.traced_rays
            if bs_ is not None:
                energy = camlib.unblock_image(
                    energy, width, height, bs_[0], bs_[1]
                )
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
