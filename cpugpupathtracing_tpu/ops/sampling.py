"""Sampling and shading utilities, batched over ray lanes.

Semantics match Source/Util.cpp:7-79, with one deliberate re-design: the
reference's rejection-sampled unit-ball directions (loop until |d| <= 1,
Source/Util.cpp:9-13) do not vectorize on a lockstep VPU, so uniform
sphere directions are sampled *directly* (z = 1 - 2u, azimuth 2 pi u).
The resulting distribution is identical (uniform on the unit sphere), so
hemisphere/cosine sampling distributions match the reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpugpupathtracing_tpu.utils import rng
from cpugpupathtracing_tpu.utils.vecmath import TWO_PI, dot, normalize, normalize_safe


def uniform_sphere_from_uv(u1, u2):
    """Uniform direction on the unit sphere from two uniforms in [0,1)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere(state):
    """Draw a uniform unit-sphere direction; returns (state', dir)."""
    state, u1 = rng.next_f32(state)
    state, u2 = rng.next_f32(state)
    return state, uniform_sphere_from_uv(u1, u2)


def uniform_hemisphere(state, normal):
    """Uniform hemisphere sample around `normal`.

    Reference: Util::UniformHemisphereSample (Source/Util.cpp:7-19) --
    uniform sphere direction flipped to the normal's side.
    """
    state, d = uniform_sphere(state)
    flip = jnp.where(dot(d, normal, keepdims=True) < 0.0, -1.0, 1.0)
    return state, d * flip


def cosine_weighted(state, normal):
    """Cosine-weighted hemisphere sample: normalize(normal + unit_sphere).

    Reference: Util::CosineWeightedDiffuseReflection (Source/Util.cpp:21-30).
    The (measure-zero) case normal + d == 0 falls back to `normal` instead
    of producing NaN.
    """
    state, d = uniform_sphere(state)
    return state, normalize_safe(normal + d, fallback=normal)


def survival_probability_rr(albedo):
    """clamp(max(albedo.rgb), 0.1, 1.0) (Source/Util.cpp:32-35)."""
    return jnp.clip(jnp.max(albedo, axis=-1), 0.1, 1.0)


def reflect(direction, normal):
    """Mirror reflection (Source/Util.cpp:37-40)."""
    return direction - 2.0 * normal * dot(direction, normal, keepdims=True)


def refract(direction, normal, eta, cosi, k):
    """Snell refraction given precomputed eta / cos(i) / k
    (Source/Util.cpp:51-54). Caller guarantees k >= 0."""
    eta = eta[..., None] if jnp.ndim(eta) == jnp.ndim(direction) - 1 else eta
    cosi = cosi[..., None] if jnp.ndim(cosi) == jnp.ndim(direction) - 1 else cosi
    k = k[..., None] if jnp.ndim(k) == jnp.ndim(direction) - 1 else k
    return normalize(direction * eta + (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0))) * normal)


def fresnel(cos_in, cos_out, ior_outside, ior_inside):
    """Exact polarized Fresnel: mean of squared s/p amplitudes
    (Source/Util.cpp:42-49). Note the reference feeds *signed* dot
    products straight in; we reproduce that."""
    s_pol = (ior_outside * cos_in - ior_inside * cos_out) / (
        ior_outside * cos_in + ior_inside * cos_out
    )
    p_pol = (ior_outside * cos_out - ior_inside * cos_in) / (
        ior_outside * cos_out + ior_inside * cos_in
    )
    return 0.5 * (s_pol * s_pol + p_pol * p_pol)


def random_point_triangle(state, v0, v1, v2):
    """Uniform point on a triangle by folding the unit square over its
    diagonal (Source/Primitives.cpp:170-186)."""
    state, u0 = rng.next_f32(state)
    state, u1 = rng.next_f32(state)
    over = (u0 + u1) > 1.0
    alpha = jnp.where(over, 1.0 - u0, u0)
    beta = jnp.where(over, 1.0 - u1, u1)
    gamma = 1.0 - alpha - beta
    a = alpha[..., None]
    b = beta[..., None]
    g = gamma[..., None]
    return state, a * v0 + b * v1 + g * v2


def random_point_sphere_facing(state, center, radius, pos):
    """Point on the hemisphere of a sphere visible from `pos`
    (Source/Primitives.cpp:214-220)."""
    to_pos = normalize(pos - center)
    state, d = uniform_hemisphere(state, to_pos)
    r = radius[..., None] if jnp.ndim(radius) == jnp.ndim(center) - 1 else radius
    return state, center + r * d
