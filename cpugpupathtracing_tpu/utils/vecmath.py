"""Vector math over SoA `(..., 3)` / `(..., 4)` arrays.

The reference's scalar Vec3/Vec4 types and free functions
(Include/MathLib.h:21-152) become batched jnp helpers operating on a
trailing component axis; everything vectorizes over arbitrary leading
batch dims so the same code serves one ray or a 2M-ray wavefront.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp

PI = 3.14159265
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI

# Reference ray-t infinity (Include/Primitives.h:75) and the AABB-miss
# sentinel (Source/Primitives.cpp:129).
RAY_TMAX = 1e34
AABB_MISS = 1e30

# Self-intersection nudge (Source/Main.cpp:49).
RAY_NUDGE = 0.001


def deg2rad(deg):
    return deg * (PI / 180.0)


def rad2deg(rad):
    return rad * (180.0 / PI)


def dot(a, b, keepdims: bool = False):
    """Batched dot product over the trailing component axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def normalize(v):
    return v / length(v, keepdims=True)


def normalize_safe(v, fallback=None, eps: float = 1e-20):
    """Normalize; lanes with ~zero length get `fallback` (or zeros)."""
    len_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = v * jnp.where(len_sq > eps, jax.lax.rsqrt(jnp.maximum(len_sq, eps)), 0.0)
    if fallback is not None:
        safe = jnp.where(len_sq > eps, safe, fallback)
    return safe


def lerp(a, b, t):
    """a + t * (b - a), matching Vec3Lerp (Include/MathLib.h)."""
    return a + t * (b - a)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def vec4_to_uint(rgba):
    """Pack `(..., 4)` float RGBA to u32 0xAABBGGRR.

    Matches Vec4ToUint (Include/MathLib.h:144-152): clamp each channel
    to <= 1 (no lower clamp in the reference; radiance is non-negative,
    we clamp at 0 for safety), scale by 255, truncate. Alpha forced 255.
    No gamma, exactly like the reference.
    """
    c = rgba[..., :3]
    c = jnp.clip(jnp.where(jnp.isnan(c), 0.0, c), 0.0, 1.0)  # NaN -> 0 (C++ cast is UB)
    c = (255.0 * c).astype(jnp.uint32) & jnp.uint32(0xFF)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    a = jnp.uint32(255)
    return (a << 24) + (b << 16) + (g << 8) + r


def uint_to_rgba8(packed):
    """Unpack u32 0xAABBGGRR to `(..., 4)` uint8 (R, G, B, A)."""
    r = (packed & 0xFF).astype(jnp.uint8)
    g = ((packed >> 8) & 0xFF).astype(jnp.uint8)
    b = ((packed >> 16) & 0xFF).astype(jnp.uint8)
    a = ((packed >> 24) & 0xFF).astype(jnp.uint8)
    return jnp.stack([r, g, b, a], axis=-1)


def linear_to_srgb(rgb):
    """Correct sRGB OETF. The reference's version (Source/Util.cpp:61-69)
    mis-parenthesizes the exponent and is unused by its renderer; we ship
    the correct transfer function (also unused by the default pipeline,
    which packs linear like the reference)."""
    c = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(c < 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def srgb_to_linear(rgb):
    c = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(c < 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def solve_quadratic(a, b, c):
    """Batched quadratic roots (MathLib.cpp:4-31 equivalent).

    Returns (has_real_roots, x0, x1) with x0 <= x1; lanes without real
    roots return zeros for the roots.
    """
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * jnp.where(b >= 0, b + sq, b - sq)
    x0 = q / a
    x1 = jnp.where(q != 0.0, c / q, x0)
    lo = jnp.minimum(x0, x1)
    hi = jnp.maximum(x0, x1)
    return has, jnp.where(has, lo, 0.0), jnp.where(has, hi, 0.0)
