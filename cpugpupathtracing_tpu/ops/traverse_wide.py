"""8-wide wavefront BVH traversal (pure jnp / XLA).

Same lockstep scheme as ops/traverse.py but over the collapsed 8-wide
BVH (models/bvh8.py): each step a lane either

  * expands its current interior node -- ONE contiguous 256-byte row
    fetch, 8 slab tests, nearest hit child becomes the next current
    entry and the remaining hits are pushed far-to-near so the nearest
    pops first (the 8-wide generalization of the reference's ordered
    two-child descent, Source/BVH.cpp:100-122), or
  * intersects its current leaf -- up to LEAF_MAX contiguous triangles
    in one step (leaf order is contiguous by construction), or
  * pops / goes inactive.

Stack entries encode both kinds in one int32:
  e >= 0        : interior node row index
  DONE          : lane finished
  e < 0 (!DONE) : leaf; start = (-e - 1) >> 3, count = (-e - 1) & 7

Typical rays finish in ~10-18 steps versus ~40-60 for the binary tree,
and every fetch is a dense row -- the layout Pallas can later pin in
VMEM (nodes ~1-2 MB for the benchmark scene).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cpugpupathtracing_tpu.ops.intersect import intersect_triangle
from cpugpupathtracing_tpu.utils.vecmath import AABB_MISS

DONE = 0x7FFFFFFF  # python int: a module-level jnp scalar would be captured
# as a lifted executable constant, which multi-device dispatch mishandles
LEAF_MAX = 4
WIDTH = 8

# child_count codes in a wide node row (models/bvh8.py):
#   > 0 tri-leaf, 0 interior, -1 empty, -2 instance (TLAS leaf; child_index
#   is the instance id).  Stack entries encode: e >= 0 interior node row;
#   e < 0 with low 3 bits != 0: tri leaf (start, count); low 3 bits == 0:
#   instance entry (id in the upper bits).
CCNT_INTERIOR = 0
CCNT_EMPTY = -1
CCNT_INSTANCE = -2


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _encode_leaf(start, count):
    return -((start << 3) | count) - 1


def _encode_instance(iid):
    return -(iid << 3) - 1  # count bits 0 => instance


def _decode_leaf(e):
    v = -e - 1
    return v >> 3, v & 7


# optimal 19-comparator sorting network for 8 inputs
_SORT8_PAIRS = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (3, 5), (2, 4),
    (1, 2), (3, 4), (5, 6),
)


def _sort8_desc(dist, entry):
    """Sort 8 (dist, entry) columns descending by dist.

    jnp.argsort on (N, 8) lowers to a ~6 ms sort on TPU; this fixed
    network is ~19 vectorized compare-exchanges (~0.05 ms).  Tie order
    differs from a stable sort, which traversal correctness ignores.
    """
    d = [dist[:, i] for i in range(WIDTH)]
    e = [entry[:, i] for i in range(WIDTH)]
    for i, j in _SORT8_PAIRS:
        swap = d[i] < d[j]
        di = jnp.where(swap, d[j], d[i])
        dj = jnp.where(swap, d[i], d[j])
        ei = jnp.where(swap, e[j], e[i])
        ej = jnp.where(swap, e[i], e[j])
        d[i], d[j], e[i], e[j] = di, dj, ei, ej
    return jnp.stack(d, axis=1), jnp.stack(e, axis=1)


def traverse8(
    origin,
    direction,
    t_init,
    nodes,        # (B, 64) f32 packed 8-wide rows
    tris9,        # (T, 9) f32 leaf order
    leaf_tri_id,  # (T,) i32 leaf order -> original id
    roots,
    *,
    active=None,
    stack_depth: int = 24,
    any_hit: bool = False,
    count_depth: bool = True,
    inst_inv=None,        # (I, 12) f32 inverse transforms, rows of 3x4
    inst_blas_root=None,  # (I,) i32 BLAS root row per instance
):
    """Returns (t, tri_idx original ids, depth8, hit_instance_id).

    With inst_inv/inst_blas_root given, TLAS leaves (child_count == -2)
    switch the lane into the referenced instance: the ray is tested in
    object space (origin and UNNORMALIZED direction through the inverse
    transform, so t stays the world-space parameter) until the lane pops
    back to an entry pushed outside the instance.  hit_instance_id is -1
    for world-space (non-instanced) hits.
    """
    n = origin.shape[0]
    num_tris = tris9.shape[0]
    roots = tuple(int(r) for r in roots)
    instanced = inst_inv is not None

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    for i, r in enumerate(roots[1:]):
        stack = stack.at[:, i].set(r)
    sptr0 = jnp.full((n,), len(roots) - 1, jnp.int32)
    entry0 = jnp.full((n,), roots[0], jnp.int32)
    if active is not None:
        entry0 = jnp.where(active, entry0, DONE)
        sptr0 = jnp.where(active, sptr0, 0)

    state = dict(
        entry=entry0,
        stack=stack,
        sptr=sptr0,
        t=t_init,
        hit=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
    )
    if instanced:
        state["iid"] = jnp.full((n,), -1, jnp.int32)
        state["stack_iid"] = jnp.full((n, stack_depth), -1, jnp.int32)
        state["hit_iid"] = jnp.full((n,), -1, jnp.int32)
    # (1, S) lane indices for one-hot stack addressing
    lane_idx = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]

    def local_ray(iid):
        """Object-space ray for the lane's current instance (identity
        for iid < 0); direction left unnormalized so t is world t."""
        if not instanced:
            return origin, direction, 1.0 / direction
        m = inst_inv[jnp.maximum(iid, 0)].reshape(n, 3, 4)
        o = jnp.einsum("nij,nj->ni", m[:, :, :3], origin) + m[:, :, 3]
        d = jnp.einsum("nij,nj->ni", m[:, :, :3], direction)
        w = (iid >= 0)[:, None]
        o = jnp.where(w, o, origin)
        d = jnp.where(w, d, direction)
        return o, d, 1.0 / d

    def cond(s):
        return jnp.any(s["entry"] != DONE)

    def body(s):
        entry, stack, sptr = s["entry"], s["stack"], s["sptr"]
        t, hit, depth = s["t"], s["hit"], s["depth"]
        iid = s["iid"] if instanced else None
        lane_active = entry != DONE
        neg = lane_active & (entry < 0)
        if instanced:
            decoded = -entry - 1
            is_inst = neg & ((decoded & 7) == 0)
            is_leaf = neg & ((decoded & 7) != 0)
        else:
            is_inst = jnp.zeros_like(neg)
            is_leaf = neg
        is_interior = lane_active & (entry >= 0)

        o_loc, d_loc, inv_loc = local_ray(iid) if instanced else local_ray(None)

        # ---- instance entry: switch into the BLAS ----
        if instanced:
            new_iid_val = (-entry - 1) >> 3
            iid_next_if_inst = jnp.where(is_inst, new_iid_val, iid)
            blas_entry = inst_blas_root[jnp.clip(new_iid_val, 0, inst_blas_root.shape[0] - 1)]

        # ---- interior: one row, 8 children ----
        node_c = jnp.clip(jnp.where(is_interior, entry, 0), 0, nodes.shape[0] - 1)
        row = nodes[node_c]                                  # (N, 64)
        bounds = row[:, 0:48].reshape(n, WIDTH, 6)
        cidx = _i32(row[:, 48:56])                           # (N, 8)
        ccnt = _i32(row[:, 56:64])                           # (N, 8)

        t1 = (bounds[..., 0:3] - o_loc[:, None, :]) * inv_loc[:, None, :]
        t2 = (bounds[..., 3:6] - o_loc[:, None, :]) * inv_loc[:, None, :]
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        # robust slab: 0*inf NaN (origin exactly on a slab, parallel ray)
        # must not cull the box -- treat as non-restricting
        lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
        hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
        tmin = jnp.max(lo, axis=-1)                          # (N, 8)
        tmax = jnp.min(hi, axis=-1)
        child_hit = (
            (tmax >= tmin) & (tmin < t[:, None]) & (tmax > 0.0)
            & (ccnt != CCNT_EMPTY)
        )
        dist = jnp.where(child_hit, tmin, jnp.float32(AABB_MISS))

        child_entry = jnp.where(ccnt > 0, _encode_leaf(cidx, ccnt), cidx)
        if instanced:
            child_entry = jnp.where(
                ccnt == CCNT_INSTANCE, _encode_instance(cidx), child_entry
            )
        child_entry = child_entry.astype(jnp.int32)

        # sort children by distance DESCENDING; valid ones come last
        dist_s, entry_s = _sort8_desc(dist, child_entry)     # far..near
        valid_s = dist_s != AABB_MISS
        n_hit = jnp.sum(valid_s, axis=1).astype(jnp.int32)   # (N,)

        # nearest child (last valid in sorted order) becomes the current
        # entry; the other n_hit-1 are pushed far-to-near.
        nearest = entry_s[:, WIDTH - 1]
        prefix = jnp.cumsum(valid_s.astype(jnp.int32), axis=1) - 1  # rank
        is_push = valid_s & (prefix < (n_hit - 1)[:, None]) & is_interior[:, None]
        # one-hot writes: per-lane dynamic scatter costs ~13 ms/step on
        # TPU; a lane-index comparison against the (N, S) stack is pure
        # vector work.  Pushed child k lands at lane index sptr + rank.
        slot = jnp.where(is_push, sptr[:, None] + prefix, -1)   # (N, 8)
        write = lane_idx[:, :, None] == slot[:, None, :]        # (N, S, 8)
        write_any = jnp.any(write, axis=2)
        write_val = jnp.sum(
            jnp.where(write, entry_s[:, None, :], 0), axis=2
        )
        stack = jnp.where(write_any, write_val, stack)
        if instanced:
            stack_iid = jnp.where(
                write_any, iid[:, None], s["stack_iid"]
            )
        sptr_int = sptr + jnp.where(is_interior, jnp.maximum(n_hit - 1, 0), 0)
        descend = is_interior & (n_hit > 0)

        # ---- leaf: up to LEAF_MAX contiguous triangles ----
        if instanced:
            start = jnp.where(is_leaf, (-entry - 1) >> 3, -1)
            count = jnp.where(is_leaf, (-entry - 1) & 7, 0)
        else:
            start, count = _decode_leaf(jnp.where(is_leaf, entry, -1))
        k = start[:, None] + jnp.arange(LEAF_MAX, dtype=jnp.int32)[None, :]
        k_ok = is_leaf[:, None] & (
            jnp.arange(LEAF_MAX, dtype=jnp.int32)[None, :] < count[:, None]
        )
        kc = jnp.clip(k, 0, max(num_tris - 1, 0))
        trows = tris9[kc]                                    # (N, 4, 9)
        tvalid, tt = intersect_triangle(
            o_loc[:, None, :],
            d_loc[:, None, :],
            trows[..., 0:3],
            trows[..., 3:6],
            trows[..., 6:9],
        )
        tvalid = tvalid & k_ok & (tt < t[:, None])
        tt = jnp.where(tvalid, tt, jnp.inf)
        # min + equality select instead of argmin/take_along_axis (the
        # latter lower to slow per-lane gathers on TPU)
        best_t = jnp.min(tt, axis=1)
        chunk_hit = jnp.isfinite(best_t)
        kc_best = jnp.min(
            jnp.where(tt == best_t[:, None], kc, jnp.int32(0x7FFFFFFF)), axis=1
        )
        t = jnp.where(chunk_hit, best_t, t)
        hit = jnp.where(chunk_hit, kc_best, hit)
        if instanced:
            hit_iid = jnp.where(chunk_hit, iid, s["hit_iid"])

        # ---- next entry ----
        finished = is_leaf | (is_interior & (n_hit == 0))
        if any_hit:
            finished_now_hit = is_leaf & chunk_hit
        want_pop = finished
        can_pop = sptr_int > 0
        top_mask = lane_idx == jnp.maximum(sptr_int - 1, 0)[:, None]
        top = jnp.sum(jnp.where(top_mask, stack, 0), axis=1)
        entry_next = jnp.where(
            descend, nearest, jnp.where(want_pop & can_pop, top, DONE)
        )
        if instanced:
            top_iid = jnp.sum(jnp.where(top_mask, stack_iid, 0), axis=1)
            iid_next = jnp.where(
                descend, iid, jnp.where(want_pop & can_pop, top_iid, iid)
            )
            iid_next = jnp.where(is_inst, iid_next_if_inst, iid_next)
            entry_next = jnp.where(is_inst, blas_entry, entry_next)
        entry_next = jnp.where(lane_active, entry_next, DONE)
        if any_hit:
            entry_next = jnp.where(finished_now_hit, DONE, entry_next)
        sptr_next = jnp.where(lane_active & want_pop & can_pop, sptr_int - 1, sptr_int)

        out = dict(
            entry=entry_next,
            stack=stack,
            sptr=sptr_next,
            t=t,
            hit=hit,
            depth=jnp.where(descend & count_depth, depth + 1, depth),
        )
        if instanced:
            out["iid"] = iid_next
            out["stack_iid"] = stack_iid
            out["hit_iid"] = hit_iid
        return out

    out = jax.lax.while_loop(cond, body, state)
    hit_leaf = out["hit"]
    hit_orig = jnp.where(
        hit_leaf >= 0,
        leaf_tri_id[jnp.clip(hit_leaf, 0, max(num_tris - 1, 0))],
        -1,
    )
    hit_iid = out["hit_iid"] if instanced else jnp.full((n,), -1, jnp.int32)
    return out["t"], hit_orig, out["depth"], hit_iid
