"""Wavefront BVH traversal (pure jnp / XLA).

The reference traverses its BVH per ray with an iterative near-child-first
loop over a 64-deep local stack (BVH::Traverse, Source/BVH.cpp:61-127).
On TPU, rays run in lockstep: a `lax.while_loop` advances every ray one
traversal step per iteration, with per-lane node cursors and fixed-depth
stacks held in SoA arrays.  Each step a lane either

  * tests its current interior node's two children (ordered near-first,
    far child pushed -- the reference's exact ordering, including the
    `dist == 1e30` miss sentinel tests), or
  * intersects a chunk of up to `leaf_chunk` triangles of its current
    leaf (the reference's leaf loop, Source/BVH.cpp:72-91), or
  * pops its stack / goes inactive.

The loop ends when every lane is done; divergence cost is bounded by
building with a `max_leaf_size` so leaves fit in few chunks.  Node rows
are packed `(B, 8)` f32 [min, max, bitcast(left_first), bitcast(count)]
and triangles `(T, 9)` f32 [v0, e1, e2] so each step is one row-gather
per fetch -- the TPU analog of the reference's 32-byte node and __m128
loads.

Hit results match the reference exactly: nearest t, `tri_idx` = original
triangle index (payload.tri_idx, Source/BVH.cpp:81), and `bvh_depth` =
number of interior descents (payload.bvh_depth, Source/BVH.cpp:118) for
the debug heatmap.

Multiple mesh objects traverse in ONE loop: their node/triangle arrays are
concatenated (models/scene.py) and each object's root is pre-seeded onto
the stack, replacing the reference's sequential per-object loop
(IntersectScene, Source/Main.cpp:299-316) with a single fused traversal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.ops.intersect import intersect_aabb, intersect_triangle
from cpugpupathtracing_tpu.utils.vecmath import AABB_MISS


def pack_nodes(nodes_min, nodes_max, left_first, prim_count) -> np.ndarray:
    """Pack node SoA into (B, 8) f32 rows; ints are bitcast into lanes
    6-7 (the reference's union of bounds and indices, Include/BVH.h:29-34)."""
    b = len(left_first)
    out = np.empty((b, 8), np.float32)
    out[:, 0:3] = nodes_min
    out[:, 3:6] = nodes_max
    out[:, 6] = np.asarray(left_first, np.int32).view(np.float32)
    out[:, 7] = np.asarray(prim_count, np.int32).view(np.float32)
    return out


def pack_tris(v0, v1, v2) -> np.ndarray:
    """Pack triangles into (T, 9) f32 rows [v0, e1, e2]."""
    t = len(v0)
    out = np.empty((t, 9), np.float32)
    out[:, 0:3] = v0
    out[:, 3:6] = np.asarray(v1) - np.asarray(v0)
    out[:, 6:9] = np.asarray(v2) - np.asarray(v0)
    return out


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def traverse(
    origin,
    direction,
    t_init,
    nodes8,
    tri_perm,
    tris9,
    roots,
    *,
    active=None,
    stack_depth: int = 48,
    leaf_chunk: int = 4,
    any_hit: bool = False,
    count_depth: bool = True,
):
    """Trace a ray batch through concatenated BVHs.

    origin/direction: (N, 3) f32.  t_init: (N,) f32 current-nearest (1e34
    for fresh rays, a tmax for shadow rays).  nodes8: (B, 8) packed nodes.
    tri_perm: (T,) i32 leaf-order -> original-triangle-index permutation
    (global offsets baked in).  tris9: (T, 9) packed triangles in original
    order.  roots: (R,) static tuple of root node indices.

    Returns (t, tri_idx, bvh_depth): nearest hit distance (t_init where
    miss), original triangle index (-1 = miss), interior-descent count.
    With any_hit=True, lanes stop at the first confirmed hit (occlusion
    query) -- the hit is then not necessarily the nearest.  `active`
    (N,) bool masks lanes out of the whole traversal (dead wavefront
    lanes cost nothing but their vector slot).
    """
    n = origin.shape[0]
    num_tris = tris9.shape[0]
    inv_dir = 1.0 / direction
    roots = tuple(int(r) for r in roots)

    # seed: current node = roots[0], remaining roots pre-pushed
    stack = jnp.zeros((n, stack_depth), jnp.int32)
    for i, r in enumerate(roots[1:]):
        stack = stack.at[:, i].set(r)
    sptr0 = jnp.full((n,), len(roots) - 1, jnp.int32)
    node0 = jnp.full((n,), roots[0], jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, -1)
        sptr0 = jnp.where(active, sptr0, 0)

    state = dict(
        node=node0,
        cursor=jnp.full((n,), -1, jnp.int32),
        stack=stack,
        sptr=sptr0,
        t=t_init,
        hit=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
    )

    rows = jnp.arange(n, dtype=jnp.int32)

    def cond(s):
        return jnp.any(s["node"] >= 0)

    def body(s):
        node, cursor, stack, sptr = s["node"], s["cursor"], s["stack"], s["sptr"]
        t, hit, depth = s["t"], s["hit"], s["depth"]
        active = node >= 0
        node_c = jnp.maximum(node, 0)

        row = nodes8[node_c]                       # (N, 8) gather
        left_first = _i32(row[:, 6])
        prim_count = _i32(row[:, 7])
        is_leaf = active & (prim_count > 0)
        is_interior = active & (prim_count == 0)

        # ---- leaf: intersect up to leaf_chunk triangles ----
        start = jnp.where(cursor < 0, left_first, cursor)
        k = start[:, None] + jnp.arange(leaf_chunk, dtype=jnp.int32)[None, :]
        k_ok = is_leaf[:, None] & (k < (left_first + prim_count)[:, None])
        tri_ids = tri_perm[jnp.clip(k, 0, num_tris - 1)]    # (N, C)
        trows = tris9[jnp.clip(tri_ids, 0, num_tris - 1)]   # (N, C, 9)
        valid, tt = intersect_triangle(
            origin[:, None, :],
            direction[:, None, :],
            trows[..., 0:3],
            trows[..., 3:6],
            trows[..., 6:9],
        )
        valid = valid & k_ok & (tt < t[:, None])
        tt = jnp.where(valid, tt, jnp.inf)
        j = jnp.argmin(tt, axis=1)
        best_t = jnp.take_along_axis(tt, j[:, None], axis=1)[:, 0]
        chunk_hit = jnp.isfinite(best_t)
        t_leaf = jnp.where(chunk_hit, best_t, t)
        hit_leaf = jnp.where(
            chunk_hit, jnp.take_along_axis(tri_ids, j[:, None], axis=1)[:, 0], hit
        )
        leaf_done = (start + leaf_chunk) >= (left_first + prim_count)
        if any_hit:
            leaf_done = leaf_done | chunk_hit

        # ---- interior: ordered two-child test ----
        li = jnp.clip(left_first, 0, nodes8.shape[0] - 1)
        ri = jnp.clip(left_first + 1, 0, nodes8.shape[0] - 1)
        lrow = nodes8[li]
        rrow = nodes8[ri]
        dl = intersect_aabb(origin, inv_dir, t, lrow[:, 0:3], lrow[:, 3:6])
        dr = intersect_aabb(origin, inv_dir, t, rrow[:, 0:3], rrow[:, 3:6])
        swap = dl > dr
        near_i = jnp.where(swap, ri, li)
        far_i = jnp.where(swap, li, ri)
        near_d = jnp.minimum(dl, dr)
        far_d = jnp.maximum(dl, dr)
        near_miss = near_d == AABB_MISS
        descend = is_interior & ~near_miss
        push_far = descend & (far_d != AABB_MISS)

        # ---- merge: next node / cursor / stack ----
        # pop when: leaf finished, interior with no child hit, or
        # (leaf not finished) stays put with an advanced cursor.
        want_pop = (is_leaf & leaf_done) | (is_interior & near_miss)
        can_pop = sptr > 0
        top = stack[rows, jnp.maximum(sptr - 1, 0)]

        node_next = jnp.where(
            is_leaf & ~leaf_done,
            node,
            jnp.where(descend, near_i, jnp.where(want_pop & can_pop, top, -1)),
        )
        node_next = jnp.where(active, node_next, node)
        cursor_next = jnp.where(
            is_leaf & ~leaf_done, start + leaf_chunk, jnp.full_like(cursor, -1)
        )

        sptr_next = jnp.where(want_pop & can_pop, sptr - 1, sptr)
        # push far child: one scatter of a single element per lane
        # (predicated by writing back the current value when not pushing)
        do_push = push_far
        slot = jnp.clip(sptr_next, 0, stack_depth - 1)
        cur = stack[rows, slot]
        stack_next = stack.at[rows, slot].set(jnp.where(do_push, far_i, cur))
        sptr_next = jnp.where(do_push, sptr_next + 1, sptr_next)

        return dict(
            node=node_next,
            cursor=cursor_next,
            stack=stack_next,
            sptr=sptr_next,
            t=jnp.where(is_leaf, t_leaf, t),
            hit=jnp.where(is_leaf, hit_leaf, hit),
            depth=jnp.where(descend & count_depth, depth + 1, depth),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["t"], out["hit"], out["depth"]
