"""Batched ray-primitive intersection kernels (pure jnp).

Each routine reproduces the exact hit predicate and epsilons of its
reference counterpart in Source/Primitives.cpp, but over SoA ray batches:
rays are `(N, 3)` origin/direction arrays and primitives broadcast against
them. These jnp forms are the correctness oracles; the BVH traversal
(ops/traverse.py) composes the same predicates, and Pallas kernels are
pinned against these in tests.

Conventions:
  * t-candidates are returned together with a validity mask; "closer than
    the ray's current t" is applied by the caller (argmin/where), which is
    the SoA equivalent of the reference's mutable `ray.t` early-out.
  * Triangles are stored as (v0, e1, e2) with e1 = v1 - v0, e2 = v2 - v0
    precomputed on the host, saving two subtractions per test.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpugpupathtracing_tpu.utils.vecmath import AABB_MISS, cross, dot

# Double-sided determinant epsilon (Source/Primitives.cpp:16).
TRI_DET_EPS = 0.001
# Plane denominator epsilon (Source/Primitives.cpp:56).
PLANE_DENOM_EPS = 1e-6


def intersect_triangle(origin, direction, v0, e1, e2):
    """Moller-Trumbore, double-sided (Source/Primitives.cpp:6-47).

    All inputs broadcast; returns (valid, t) where valid applies the
    reference's rejects: |det| >= 1e-3, 0 <= u <= 1, v >= 0, u + v <= 1,
    t > 0. The caller still checks t < ray.t.
    """
    h = cross(direction, e2)
    a = dot(e1, h)
    det_ok = jnp.abs(a) >= TRI_DET_EPS
    f = 1.0 / jnp.where(det_ok, a, 1.0)
    s = origin - v0
    u = f * dot(s, h)
    q = cross(s, e1)
    v = f * dot(direction, q)
    t = f * dot(e2, q)
    valid = (
        det_ok
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & ((u + v) <= 1.0)
        & (t > 0.0)
    )
    return valid, jnp.where(valid, t, jnp.inf)


def intersect_sphere(origin, direction, center, radius_sq):
    """Geometric sphere test (Source/Primitives.cpp:71-114).

    Rejects: tca < 0 (sphere behind), d^2 > r^2 (miss), both roots < 0.
    Picks t0 = tca - thc, falling back to t1 when t0 < 0 (origin inside).
    """
    el = center - origin
    tca = dot(el, direction)
    d2 = dot(el, el) - tca * tca
    thc = jnp.sqrt(jnp.maximum(radius_sq - d2, 0.0))
    t0 = tca - thc
    t1 = tca + thc
    t = jnp.where(t0 < 0.0, t1, t0)
    valid = (tca >= 0.0) & (d2 <= radius_sq) & (t >= 0.0)
    return valid, jnp.where(valid, t, jnp.inf)


def intersect_plane(origin, direction, point, normal):
    """Infinite plane (Source/Primitives.cpp:49-69)."""
    denom = dot(direction, normal)
    denom_ok = jnp.abs(denom) > PLANE_DENOM_EPS
    t = dot(point - origin, normal) / jnp.where(denom_ok, denom, 1.0)
    valid = denom_ok & (t > 0.0)
    return valid, jnp.where(valid, t, jnp.inf)


def intersect_aabb(origin, inv_direction, ray_t, bmin, bmax):
    """Slab test returning entry distance or the 1e30 miss sentinel.

    Hit predicate tmax >= tmin and tmin < ray.t and tmax > 0, identical to
    IntersectAABB / IntersectAABB_SSE (Source/Primitives.cpp:116-146).
    `ray_t` is the ray's current nearest-hit distance (for the early-out).

    Robustness: a zero direction component with the origin exactly on the
    slab yields 0 * inf = NaN; jnp.minimum/maximum would propagate it and
    silently cull the box (rays leaking through geometry).  NaN slabs are
    treated as non-restricting (the boundary-grazing ray is IN the slab),
    which is conservative -- the triangle test adjudicates.  (The
    reference's SSE path gets a different, accidental answer from
    _mm_min_ps NaN semantics; ours never wrongly culls.)
    """
    t1 = (bmin - origin) * inv_direction
    t2 = (bmax - origin) * inv_direction
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    tmin = jnp.max(lo, axis=-1)
    tmax = jnp.min(hi, axis=-1)
    hit = (tmax >= tmin) & (tmin < ray_t) & (tmax > 0.0)
    return jnp.where(hit, tmin, AABB_MISS)


def brute_force_nearest_triangle(origin, direction, tri_v0, tri_e1, tri_e2, t_init):
    """Oracle: test every triangle against every ray, return nearest.

    rays (N,3) x triangles (T,3) -> (t (N,), tri_idx (N,) with -1 = miss).
    Memory O(N*T); for tests and BVH-correctness checks only.
    """
    valid, t = intersect_triangle(
        origin[:, None, :],
        direction[:, None, :],
        tri_v0[None, :, :],
        tri_e1[None, :, :],
        tri_e2[None, :, :],
    )  # (N, T)
    t = jnp.where(valid & (t < t_init[:, None]), t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    best_t = jnp.min(t, axis=1)
    hit = jnp.isfinite(best_t)
    return jnp.where(hit, best_t, t_init), jnp.where(hit, best, -1)
