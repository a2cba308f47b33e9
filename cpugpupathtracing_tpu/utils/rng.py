"""Counter-seeded per-lane xorshift32 RNG.

The reference uses a single global xorshift32 state shared (racily) by all
threads (Include/Random.h:4-34) -- fast but nondeterministic.  The TPU
design keeps the identical generator *per lane*: every ray lane carries its
own u32 state, seeded deterministically from (pixel index, frame index,
salt) through WangHash chains (WangHash: Include/Random.h:6-13).  Same
marginal distribution, bitwise reproducible, no races by construction.

All helpers are stateless functions `state -> (new_state, value)` threaded
through the wavefront loop, shaped over arbitrary batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def wang_hash(x):
    """WangHash (Include/Random.h:6-13), batched over u32 arrays."""
    x = jnp.asarray(x, _U32)
    x = (x ^ _U32(61)) ^ (x >> 16)
    x = x * _U32(9)
    x = x ^ (x >> 4)
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def seed_lanes(lane_index, frame_index, salt: int = 0):
    """Deterministic per-lane seeds: hash lane id with frame and salt.

    Chained WangHash keeps streams decorrelated across frames and between
    the integrator's independent draw sites. Seeds of exactly 0 would lock
    xorshift32 at 0 forever, so they are remapped.
    """
    lane = jnp.asarray(lane_index, _U32)
    frame = jnp.asarray(frame_index, _U32)
    s = wang_hash(lane * _U32(0x9E3779B9) + _U32(salt) * _U32(0x85EBCA6B) + _U32(1))
    s = wang_hash(s ^ wang_hash(frame + _U32(0x68BC21EB)))
    return jnp.where(s == 0, _U32(0x12345678), s)


def next_u32(state):
    """One xorshift32 step (Include/Random.h:15-21): returns (state', value)."""
    s = state
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s, s


def next_f32(state):
    """Uniform float in [0, 1): u32 * 2.3283064365387e-10 (Include/Random.h:31-34)."""
    s, v = next_u32(state)
    return s, v.astype(jnp.float32) * jnp.float32(2.3283064365387e-10)


def next_u32_range(state, lo, hi):
    """Uniform integer in [lo, hi] via modulo, matching RandomUInt32Range
    (Include/Random.h:41-46). lo/hi may be scalars or arrays."""
    s, v = next_u32(state)
    lo = jnp.asarray(lo, _U32)
    hi = jnp.asarray(hi, _U32)
    span = hi + _U32(1) - lo
    out = jnp.where(span == 0, lo, lo + v % jnp.maximum(span, _U32(1)))
    return s, out


def next_f32_vec(state, n: int):
    """Draw n uniform floats, stacked on a new trailing axis."""
    vals = []
    for _ in range(n):
        state, v = next_f32(state)
        vals.append(v)
    return state, jnp.stack(vals, axis=-1)
