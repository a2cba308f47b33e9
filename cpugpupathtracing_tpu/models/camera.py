"""Screen-plane pinhole camera, batched ray generation.

Exact reproduction of the reference camera (Source/Main.cpp:94-170): the
screen plane sits at distance deg2rad(fov_deg) along view_dir (the FOV is
used as a focal distance), with corners at center +- (aspect, 1, 0) -- an
axis-aligned plane, so the camera translates but cannot rotate (the
reference reads mouse-look but never applies it, Source/Main.cpp:109).
Screen coordinates have no half-pixel offset: u = x/width, v = y/height
(Source/Main.cpp:713-714), v growing downward (bottom_left - top_left =
(0, -2, 0)).

Camera parameters travel as a small CameraArrays pytree so moving the
camera re-runs, not re-compiles, the jitted frame function.

`jitter=True` adds sub-pixel stratification for anti-aliasing -- a
capability extension, off by default for reference parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as _np

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import deg2rad, normalize


class CameraArrays(NamedTuple):
    """Traced camera state (a pytree; safe inside jit)."""

    pos: jnp.ndarray      # (3,)
    view_dir: jnp.ndarray  # (3,)
    fov_rad: jnp.ndarray   # ()
    aspect: jnp.ndarray    # ()


def to_arrays(cam: CameraConfig) -> CameraArrays:
    return CameraArrays(
        pos=jnp.asarray(cam.pos, jnp.float32),
        view_dir=jnp.asarray(cam.view_dir, jnp.float32),
        fov_rad=jnp.asarray(deg2rad(cam.fov_deg), jnp.float32),
        aspect=jnp.asarray(cam.aspect, jnp.float32),
    )


def screen_plane(cam: CameraArrays):
    """UpdateScreenPlane (Source/Main.cpp:143-149)."""
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    center = cam.pos + cam.fov_rad * cam.view_dir
    top_left = center + jnp.stack([-cam.aspect, one, zero])
    top_right = center + jnp.stack([cam.aspect, one, zero])
    bottom_left = center + jnp.stack([-cam.aspect, -one, zero])
    return cam.pos, top_left, top_right, bottom_left


def get_ray(cam: CameraArrays, u, v):
    """Camera::GetRay (Source/Main.cpp:133-140), batched over u/v arrays.
    Returns (origin (..., 3), direction (..., 3))."""
    pos, tl, tr, bl = screen_plane(cam)
    pixel = tl + u[..., None] * (tr - tl) + v[..., None] * (bl - tl)
    direction = normalize(pixel - pos)
    origin = jnp.broadcast_to(pos, direction.shape)
    return origin, direction


def lane_rays(cam: CameraArrays, lane, width: int, height: int):
    """Rays for flat lane indices (lane = y * width + x), from a *traced*
    lane array.  Deriving pixel coordinates from an argument rather than
    an embedded iota keeps large constants out of the executable (whose
    hidden constant-parameters break multi-device dispatch in this jax
    version) and lets sharded callers pass their own lane slice."""
    xs = (lane % jnp.uint32(width)).astype(jnp.float32)
    ys = (lane // jnp.uint32(width)).astype(jnp.float32)
    u = xs / jnp.float32(width)
    v = ys / jnp.float32(height)
    return get_ray(cam, u, v)


def block_shape(width: int, height: int):
    """Pixel-block tiling for packet-coherent ray order, or None."""
    if width % 32 == 0 and height % 32 == 0:
        return 32, 32
    if width % 128 == 0 and height % 8 == 0:
        return 8, 128
    return None


def blocked_lane_rays(cam: CameraArrays, lane, width: int, height: int, bh: int, bw: int):
    """Rays in pixel-block order: consecutive lanes cover a bh x bw pixel
    block (coherent packets for ops/traverse_packet_slim).  Returns
    (origin, direction, pixel_index) where pixel_index is the row-major
    framebuffer position of each lane -- used to key RNG streams so the
    rendered image is bitwise independent of ray ordering."""
    per_block = jnp.uint32(bh * bw)
    bpr = jnp.uint32(width // bw)
    bi = lane // per_block
    w = lane % per_block
    by = w // jnp.uint32(bw)
    bx = w % jnp.uint32(bw)
    x = (bi % bpr) * jnp.uint32(bw) + bx
    y = (bi // bpr) * jnp.uint32(bh) + by
    pix = y * jnp.uint32(width) + x
    u = x.astype(jnp.float32) / jnp.float32(width)
    v = y.astype(jnp.float32) / jnp.float32(height)
    origin, direction = get_ray(cam, u, v)
    return origin, direction, pix


def unblock_image(arr, width: int, height: int, bh: int, bw: int):
    """Block-order (H*W, ...) -> image row-major order, pure reshapes."""
    lead = arr.shape[1:]
    a = arr.reshape((height // bh, width // bw, bh, bw) + lead)
    a = jnp.moveaxis(a, 2, 1)  # (H/bh, bh, W/bw, bw, ...)
    return a.reshape((height * width,) + lead)


def pixel_rays(
    cam: CameraArrays, width: int, height: int, *, lane=None, jitter=False,
    rng_state=None,
):
    """Rays for every pixel, row-major (y, x) flattened to (H*W, 3).

    Matches the reference's per-pixel u = x/width, v = y/height mapping
    (Source/Main.cpp:713-716): no half-pixel centering, no jitter.
    Pass `lane` (a (H*W,) u32 device array of 0..H*W-1) when calling
    under jit for multi-device dispatch: a traced-time mgrid/iota becomes
    a lifted executable constant that multi-chip dispatch drops (the
    same plumbing as lane_rays).  Without it, a host-side numpy arange
    is embedded (safe, but a baked constant).
    """
    if lane is None:
        lane = jnp.asarray(_np.arange(width * height, dtype=_np.uint32))
    xs = (lane % jnp.uint32(width)).astype(jnp.float32)
    ys = (lane // jnp.uint32(width)).astype(jnp.float32)
    if jitter:
        if rng_state is None:
            raise ValueError("jitter=True requires rng_state")
        rng_state, jx = rnglib.next_f32(rng_state)
        rng_state, jy = rnglib.next_f32(rng_state)
        xs = xs + jx
        ys = ys + jy
    u = xs / jnp.float32(width)
    v = ys / jnp.float32(height)
    origin, direction = get_ray(cam, u, v)
    if jitter:
        return origin, direction, rng_state
    return origin, direction
