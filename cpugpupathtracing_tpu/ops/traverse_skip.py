"""Stackless skip-link BVH traversal (pure jnp / XLA) -- the TPU fast path.

Per-lane stacks make every lockstep step pay O(stack_depth) vector work
(and dynamic scatters are ~13 ms/step on TPU).  A *threaded* BVH removes
the stack entirely: every node stores `next`, the node that follows it in
DFS order when its subtree is skipped (right sibling for a left child,
the parent's `next` otherwise).  Traversal state per lane is ONE node
index:

    row = nodes[node]            # (N, 12) contiguous gather
    hit = slab(row.bounds)       # 1 AABB test
    leaf? intersect its <= 4 contiguous triangles, then node = row.next
    hit & interior -> node = row.left_first (first child)
    miss           -> node = row.next

Compared with ordered stack traversal this visits more nodes (no
near-child-first, only t-culling), but each step is two orders of
magnitude cheaper on the VPU, and shadow rays (any_hit) never needed
ordering at all.  Triangles are stored in leaf order (the binary
builder's permutation), so a leaf fetch is one contiguous 144-byte read.

Multiple scene roots are chained: each object's DFS end threads to the
next object's root (the reference's per-object loop, Source/Main.cpp:
299-316, becomes pure control flow).  Instances need no stack either:
entering a BLAS from a TLAS leaf saves a single (resume, iid) register
pair, and the BLAS's end-of-DFS sentinel restores it.

Node row layout, (B, 12) f32 = 48 B:
  0..5  aabb min/max
  6     bitcast i32: leaf -> start into leaf-ordered tris;
        interior -> first child row; TLAS instance leaf -> instance id
  7     bitcast i32 prim_count (0 interior, >0 leaf, -2 instance leaf)
  8     bitcast i32 next (node row; NEXT_DONE ends; NEXT_RETURN pops the
        instance resume register)
  9..11 padding
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.ops.intersect import intersect_triangle
from cpugpupathtracing_tpu.utils.vecmath import AABB_MISS

LEAF_MAX = 4
NEXT_DONE = -1
NEXT_RETURN = -2
CCNT_INSTANCE = -2


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def pack_skip_nodes(b, tri_off: int, node_off: int, end_next: int) -> np.ndarray:
    """Thread a binary BVH (models/bvh.py) into (B, 12) skip rows.

    tri_off/node_off: global offsets for concatenation. end_next: the
    global `next` of this tree's DFS end (the next object's root,
    NEXT_DONE, or NEXT_RETURN for instanced BLASes).
    """
    n = b.num_nodes
    rows = np.zeros((n, 12), np.float32)
    rows[:, 0:3] = b.nodes_min
    rows[:, 3:6] = b.nodes_max
    nxt = np.full(n, end_next, np.int32)
    lf = np.empty(n, np.int32)
    is_leaf = b.prim_count > 0
    lf[is_leaf] = b.left_first[is_leaf] + tri_off
    lf[~is_leaf] = b.left_first[~is_leaf] + node_off

    # next[left] = right; next[right] = next[parent]; DFS-follow = left
    stack = [(0, end_next)]
    while stack:
        node, nx = stack.pop()
        nxt[node] = nx
        if b.prim_count[node] == 0:
            li = int(b.left_first[node])
            stack.append((li, li + 1 + node_off))
            stack.append((li + 1, nx))
    rows[:, 6] = lf.view(np.float32)
    rows[:, 7] = b.prim_count.astype(np.int32).view(np.float32)
    rows[:, 8] = nxt.view(np.float32)
    return rows


def pack_skip_tlas(imin, imax, inst_ids, end_next: int, node_off: int) -> np.ndarray:
    """Thread a binary tree over instance AABBs: leaves are instance
    entries (prim_count = -2, left_first = instance id)."""
    num = len(inst_ids)
    centers = (imin + imax) * 0.5
    rows: list[np.ndarray] = []

    PLACEHOLDER = np.int32(-777777)

    def _rethread(root_local, nx):
        """Set `next` for every node in root's subtree whose next is the
        placeholder None-marker (we encode placeholder as NEXT_DONE-7)."""
        stack = [root_local]
        while stack:
            i = stack.pop()
            r = rows[i]
            cur = r[8:9].view(np.int32)[0]
            if cur == PLACEHOLDER:
                r[8] = np.int32(nx).view(np.float32)
            if r[7:8].view(np.int32)[0] == 0:
                li = int(r[6:7].view(np.int32)[0]) - node_off
                stack.append(li)
                stack.append(li + 1)

    def build2(ids, nx):
        """Iterative, correct two-pass variant of build."""
        row_idx = len(rows)
        rows.append(np.zeros(12, np.float32))
        mn = imin[ids].min(0)
        mx = imax[ids].max(0)
        r = rows[row_idx]
        r[0:3], r[3:6] = mn, mx
        if len(ids) == 1:
            r[6] = np.int32(inst_ids[ids[0]]).view(np.float32)
            r[7] = np.int32(CCNT_INSTANCE).view(np.float32)
            r[8] = np.int32(nx).view(np.float32)
            return row_idx
        axis = int(np.argmax(centers[ids].max(0) - centers[ids].min(0)))
        order = np.argsort(centers[ids][:, axis], kind="stable")
        h = max(1, len(ids) // 2)
        li = build2(ids[order[:h]], PLACEHOLDER)
        ri = build2(ids[order[h:]], nx)
        _rethread(li, ri + node_off)
        r[6] = np.int32(li + node_off).view(np.float32)
        r[7] = np.int32(0).view(np.float32)
        r[8] = np.int32(nx).view(np.float32)
        return row_idx

    build2(np.arange(num), end_next)
    return np.stack(rows)


def traverse_skip(
    origin,
    direction,
    t_init,
    nodes12,      # (B, 12) threaded rows
    tris9,        # (T, 9) leaf (perm) order
    leaf_tri_id,  # (T,) i32 leaf order -> original global tri id
    root: int,
    *,
    active=None,
    any_hit: bool = False,
    count_depth: bool = True,
    inst_inv=None,
    inst_blas_root=None,
):
    """Returns (t, tri original id, interior-hit count, hit instance id)."""
    n = origin.shape[0]
    num_tris = tris9.shape[0]
    instanced = inst_inv is not None

    node0 = jnp.full((n,), root, jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, NEXT_DONE)
    state = dict(
        node=node0,
        t=t_init,
        hit=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
    )
    if instanced:
        state["iid"] = jnp.full((n,), -1, jnp.int32)
        state["resume"] = jnp.full((n,), NEXT_DONE, jnp.int32)
        state["hit_iid"] = jnp.full((n,), -1, jnp.int32)

    def local_ray(iid):
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
        return jnp.any(s["node"] >= 0)

    def body(s):
        node, t, hit, depth = s["node"], s["t"], s["hit"], s["depth"]
        lane_active = node >= 0
        node_c = jnp.clip(node, 0, nodes12.shape[0] - 1)
        row = nodes12[node_c]                                # (N, 12)
        left_first = _i32(row[:, 6])
        prim_count = _i32(row[:, 7])
        nxt = _i32(row[:, 8])

        iid = s["iid"] if instanced else None
        o_loc, d_loc, inv_loc = local_ray(iid)

        t1 = (row[:, 0:3] - o_loc) * inv_loc
        t2 = (row[:, 3:6] - o_loc) * inv_loc
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
        hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
        tmin = jnp.max(lo, axis=-1)
        tmax = jnp.min(hi, axis=-1)
        box_hit = lane_active & (tmax >= tmin) & (tmin < t) & (tmax > 0.0)

        is_leaf = prim_count > 0
        if instanced:
            is_inst = prim_count == CCNT_INSTANCE
        do_leaf = box_hit & is_leaf

        # leaf: <= LEAF_MAX contiguous triangles
        k = left_first[:, None] + jnp.arange(LEAF_MAX, dtype=jnp.int32)[None, :]
        k_ok = do_leaf[:, None] & (
            jnp.arange(LEAF_MAX, dtype=jnp.int32)[None, :] < prim_count[:, None]
        )
        kc = jnp.clip(k, 0, max(num_tris - 1, 0))
        trows = tris9[kc]
        tvalid, tt = intersect_triangle(
            o_loc[:, None, :], d_loc[:, None, :],
            trows[..., 0:3], trows[..., 3:6], trows[..., 6:9],
        )
        tvalid = tvalid & k_ok & (tt < t[:, None])
        tt = jnp.where(tvalid, tt, jnp.inf)
        best_t = jnp.min(tt, axis=1)
        chunk_hit = jnp.isfinite(best_t)
        kc_best = jnp.min(
            jnp.where(tt == best_t[:, None], kc, jnp.int32(0x7FFFFFFF)), axis=1
        )
        t = jnp.where(chunk_hit, best_t, t)
        hit = jnp.where(chunk_hit, kc_best, hit)
        if instanced:
            hit_iid = jnp.where(chunk_hit, iid, s["hit_iid"])

        # next node
        descend = box_hit & (prim_count == 0)
        node_next = jnp.where(descend, left_first, nxt)
        if instanced:
            # TLAS instance leaf hit: save resume, enter the BLAS
            enter = box_hit & is_inst
            new_iid = jnp.clip(left_first, 0, max(inst_blas_root.shape[0] - 1, 0))
            resume = jnp.where(enter, nxt, s["resume"])
            iid_n = jnp.where(enter, new_iid, iid)
            node_next = jnp.where(enter, inst_blas_root[new_iid], node_next)
            # BLAS DFS end: restore world space
            ret = lane_active & (node_next == NEXT_RETURN)
            node_next = jnp.where(ret, resume, node_next)
            iid_n = jnp.where(ret, -1, iid_n)
            resume = jnp.where(ret, NEXT_DONE, resume)
        if any_hit:
            node_next = jnp.where(chunk_hit, NEXT_DONE, node_next)
        node_next = jnp.where(lane_active, node_next, NEXT_DONE)

        out = dict(
            node=node_next,
            t=t,
            hit=hit,
            depth=jnp.where(descend & count_depth, depth + 1, depth),
        )
        if instanced:
            out["iid"] = iid_n
            out["resume"] = resume
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
