"""Host-side BVH builder (numpy), device-flat node arrays.

Re-implements the reference's binary BVH (Source/BVH.cpp) with the same
node semantics: a node is {aabb_min, aabb_max, left_first, prim_count};
prim_count > 0 marks a leaf whose primitives are tri_indices[left_first :
left_first + prim_count]; interior nodes store the left-child index, and
the right child is left+1 (Include/BVH.h:29-34).

Build options (Include/BVH.h:10-16):
  * NAIVE_SPLIT -- longest-axis midpoint, leaf <= 2 tris
    (Source/BVH.cpp:208-224).
  * SAH_SPLIT_INTERVALS -- 8 uniform candidate positions x 3 axes; cost =
    count x half-surface-area (the reference's GetAABBVolume actually
    computes xy+yz+zx, Source/Primitives.cpp:280-284); terminate when no
    candidate beats the parent cost (Source/BVH.cpp:225-259).  All cost
    arithmetic is done in float32 to reproduce the reference exactly --
    including the subtle empty-side behavior: an untouched bound box is
    (1e30, -1e30), its "volume" overflows to +inf in f32, and 0 * inf = NaN
    rejects the candidate, exactly as the C++ float math does.
  * SAH_SPLIT_PRIMITIVES -- candidate positions at every triangle centroid.
    The reference's version is dead code (its cheapest_cost is never
    updated, Source/BVH.cpp:279-293, collapsing to a single root leaf);
    implemented *correctly* here via a sorted full-sweep with prefix/suffix
    bounds (O(C log C) per node instead of the reference's O(C^2) loop).

Centroids use the reference's 0.3333f factor (Source/Primitives.cpp:255-258)
rather than 1/3, so split decisions match bit-for-bit.

`max_leaf_size` optionally forces median splits of oversized leaves: the
lockstep device traversal (ops/traverse.py) processes leaves in fixed-size
chunks, so bounded leaves cap worst-case iteration counts.  Any valid BVH
returns identical hits; this only reshapes the tree.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from cpugpupathtracing_tpu.config import BuildOption

_F32 = np.float32
_CENTROID_W = _F32(0.3333)


def _half_area(bmin: np.ndarray, bmax: np.ndarray) -> np.float32:
    """GetAABBVolume (Source/Primitives.cpp:280-284): xy + yz + zx, f32."""
    e = (bmax - bmin).astype(_F32)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]


def triangle_areas(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Heron's formula per GetTriangleArea (Source/Primitives.cpp:270-278)."""
    a = np.linalg.norm(v1 - v0, axis=-1)
    b = np.linalg.norm(v2 - v0, axis=-1)
    c = np.linalg.norm(v2 - v1, axis=-1)
    s = (a + b + c) / 2.0
    return np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 0.0))


@dataclasses.dataclass
class BVH:
    """Flat BVH over the triangles of one mesh."""

    # triangle data, original order
    tri_v0: np.ndarray      # (T, 3) f32
    tri_v1: np.ndarray      # (T, 3) f32
    tri_v2: np.ndarray      # (T, 3) f32
    tri_normal: np.ndarray  # (T, 3) f32 -- flat v0.normal per triangle
    # flat nodes
    nodes_min: np.ndarray   # (B, 3) f32
    nodes_max: np.ndarray   # (B, 3) f32
    left_first: np.ndarray  # (B,) i32
    prim_count: np.ndarray  # (B,) i32
    tri_indices: np.ndarray  # (T,) i32 permutation
    max_depth: int
    total_area: float
    build_option: BuildOption
    max_leaf_size: int | None = None

    @property
    def num_triangles(self) -> int:
        return len(self.tri_v0)

    @property
    def num_nodes(self) -> int:
        return len(self.left_first)

    def get_triangle(self, index: int):
        """BVH::GetTriangle (Source/BVH.cpp:129-132)."""
        return self.tri_v0[index], self.tri_v1[index], self.tri_v2[index]

    def rebuild(
        self,
        build_option: BuildOption,
        max_leaf_size: int | None = None,
        leaf_stop: int | None = None,
    ) -> "BVH":
        """BVH::Rebuild (Source/BVH.cpp:47-59): rebuild over the same
        triangles with a different heuristic. Returns a new BVH (buffers
        are swapped between frames instead of mutated under tracing --
        the reference mutates in place and races its render threads)."""
        return _build_from_triangles(
            self.tri_v0, self.tri_v1, self.tri_v2, self.tri_normal,
            build_option, max_leaf_size, leaf_stop,
        )


def build(
    positions: np.ndarray,
    normals: np.ndarray,
    indices: np.ndarray,
    build_option: BuildOption = BuildOption.SAH_SPLIT_INTERVALS,
    max_leaf_size: int | None = None,
    leaf_stop: int | None = None,
) -> BVH:
    """BVH::Build (Source/BVH.cpp:11-45): flatten the indexed mesh to a
    triangle soup, then subdivide."""
    idx = np.asarray(indices, np.int64).reshape(-1, 3)
    pos = np.asarray(positions, _F32)
    nrm = np.asarray(normals, _F32)
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    tri_normal = nrm[idx[:, 0]]  # flat v0.normal (Source/Primitives.cpp:148-151)
    return _build_from_triangles(
        v0, v1, v2, tri_normal, build_option, max_leaf_size, leaf_stop
    )


def _build_from_triangles(
    v0, v1, v2, tri_normal, build_option, max_leaf_size, leaf_stop=None
) -> BVH:
    t = len(v0)
    if t == 0:
        raise ValueError("cannot build BVH over zero triangles")
    total_area = float(triangle_areas(v0, v1, v2).sum())

    # fast path: the native C++ builder (bit-identical to the numpy code
    # below; set CPUGPU_TPU_NO_NATIVE=1 to force the numpy oracle)
    if not os.environ.get("CPUGPU_TPU_NO_NATIVE"):
        from cpugpupathtracing_tpu import native

        tri9 = np.concatenate(
            [np.asarray(v0, _F32), np.asarray(v1, _F32), np.asarray(v2, _F32)], axis=1
        )
        out = native.native_bvh_build(tri9, int(build_option), max_leaf_size, leaf_stop)
        if out is not None:
            nmin, nmax, left_first, prim_count, perm, max_depth = out
            return BVH(
                tri_v0=np.ascontiguousarray(v0, _F32),
                tri_v1=np.ascontiguousarray(v1, _F32),
                tri_v2=np.ascontiguousarray(v2, _F32),
                tri_normal=np.ascontiguousarray(tri_normal, _F32),
                nodes_min=nmin,
                nodes_max=nmax,
                left_first=left_first,
                prim_count=prim_count,
                tri_indices=perm,
                max_depth=max_depth,
                total_area=total_area,
                build_option=build_option,
                max_leaf_size=max_leaf_size,
            )

    centroids = ((v0 + v1 + v2) * _CENTROID_W).astype(_F32)
    tmin = np.minimum(np.minimum(v0, v1), v2).astype(_F32)
    tmax = np.maximum(np.maximum(v0, v1), v2).astype(_F32)

    max_nodes = 2 * t - 1 if max_leaf_size is None else 4 * t
    nodes_min = np.empty((max_nodes, 3), _F32)
    nodes_max = np.empty((max_nodes, 3), _F32)
    left_first = np.zeros(max_nodes, np.int32)
    prim_count = np.zeros(max_nodes, np.int32)
    perm = np.arange(t, dtype=np.int32)

    nodes_min[0] = tmin.min(axis=0)
    nodes_max[0] = tmax.max(axis=0)
    left_first[0] = 0
    prim_count[0] = t
    next_node = 1
    max_depth = 0

    old_err = np.seterr(all="ignore")  # f32 inf/NaN arithmetic is intentional
    try:
        # explicit stack instead of recursion (dragon-scale trees are deep)
        stack = [(0, 0)]
        while stack:
            node_idx, depth = stack.pop()
            max_depth = max(max_depth, depth)
            first = int(left_first[node_idx])
            count = int(prim_count[node_idx])
            seg = perm[first : first + count]
            if leaf_stop is not None and count <= leaf_stop:
                continue  # fat leaf: the packet tables test 8 tris per row
            cen = centroids[seg]

            split = _choose_split(
                build_option,
                nodes_min[node_idx],
                nodes_max[node_idx],
                cen,
                tmin[seg],
                tmax[seg],
                count,
            )
            forced = False
            if split is None and max_leaf_size is not None and count > max_leaf_size:
                split = _median_split(cen)
                forced = True
            if split is None:
                continue

            axis, pos_ = split
            mask = cen[:, axis] < pos_
            n_left = int(mask.sum())
            if n_left == 0 or n_left == count:
                if forced or (max_leaf_size is not None and count > max_leaf_size):
                    # all centroids coincide on the axis: split by index halves
                    n_left = count // 2
                    order = np.arange(count)
                    mask = order < n_left
                else:
                    continue

            # stable partition (left block, right block); the reference's
            # in-place two-pointer swap (Source/BVH.cpp:329-344) yields the
            # same left/right *sets*, only intra-leaf order differs.
            seg_sorted = np.concatenate([seg[mask], seg[~mask]])
            perm[first : first + count] = seg_sorted

            li, ri = next_node, next_node + 1
            next_node += 2
            left_first[li], prim_count[li] = first, n_left
            left_first[ri], prim_count[ri] = first + n_left, count - n_left
            for ci in (li, ri):
                s = perm[left_first[ci] : left_first[ci] + prim_count[ci]]
                nodes_min[ci] = tmin[s].min(axis=0)
                nodes_max[ci] = tmax[s].max(axis=0)
            left_first[node_idx], prim_count[node_idx] = li, 0
            stack.append((ri, depth + 1))
            stack.append((li, depth + 1))
    finally:
        np.seterr(**old_err)

    return BVH(
        tri_v0=np.ascontiguousarray(v0, _F32),
        tri_v1=np.ascontiguousarray(v1, _F32),
        tri_v2=np.ascontiguousarray(v2, _F32),
        tri_normal=np.ascontiguousarray(tri_normal, _F32),
        nodes_min=nodes_min[:next_node].copy(),
        nodes_max=nodes_max[:next_node].copy(),
        left_first=left_first[:next_node].copy(),
        prim_count=prim_count[:next_node].copy(),
        tri_indices=perm,
        max_depth=max_depth,
        total_area=total_area,
        build_option=build_option,
        max_leaf_size=max_leaf_size,
    )


def _choose_split(build_option, nmin, nmax, cen, seg_tmin, seg_tmax, count):
    """Returns (axis, split_pos) or None to make a leaf."""
    if build_option == BuildOption.NAIVE_SPLIT:
        if count <= 2:
            return None
        extent = nmax - nmin
        axis = 0
        if extent[1] > extent[0]:
            axis = 1
        if extent[2] > extent[axis]:
            axis = 2
        return axis, _F32(nmin[axis] + extent[axis] * _F32(0.5))

    if build_option == BuildOption.SAH_SPLIT_INTERVALS:
        parent_cost = _half_area(nmin, nmax) * _F32(count)
        # candidates: outer loop split_idx 0..7, inner loop axis 0..2
        # (Source/BVH.cpp:234-250); first strict minimum wins, like the
        # running `<` update.
        frac = (np.arange(8, dtype=_F32) / _F32(8.0))[:, None]          # (8,1)
        width = (nmax - nmin).astype(_F32)[None, :]                      # (1,3)
        pos = (width * frac + nmin[None, :]).astype(_F32)                # (8,3)
        costs = _sah_costs(cen, seg_tmin, seg_tmax, pos)                 # (8,3)
        flat = costs.reshape(-1)
        flat = np.where(np.isnan(flat), np.inf, flat)  # NaN never beats (C++ `<`)
        best = int(np.argmin(flat))
        cheapest = flat[best]
        if not (cheapest < _F32(1e30)) or cheapest >= parent_cost:
            return None
        si, axis = divmod(best, 3)
        return axis, pos[si, axis]

    if build_option == BuildOption.SAH_SPLIT_PRIMITIVES:
        # full sweep: every centroid is a candidate position on each axis
        parent_cost = _half_area(nmin, nmax) * _F32(count)
        best_cost, best = np.inf, None
        for axis in range(3):
            order = np.argsort(cen[:, axis], kind="stable")
            c_sorted = cen[order, axis]
            lo = seg_tmin[order]
            hi = seg_tmax[order]
            # prefix bounds of [0, k) and suffix bounds of [k, C)
            pre_min = np.minimum.accumulate(lo, axis=0)
            pre_max = np.maximum.accumulate(hi, axis=0)
            suf_min = np.minimum.accumulate(lo[::-1], axis=0)[::-1]
            suf_max = np.maximum.accumulate(hi[::-1], axis=0)[::-1]
            # left side of candidate value v = strictly-less centroids
            ks = np.searchsorted(c_sorted, c_sorted, side="left")
            uniq = np.unique(ks)
            for k in uniq:
                k = int(k)
                if k == 0:
                    la = np.nan  # empty side -> 0 * inf, as the f32 math gives
                else:
                    la = _half_area(pre_min[k - 1], pre_max[k - 1]) * _F32(k)
                if k == count:
                    ra = np.nan
                else:
                    ra = _half_area(suf_min[k], suf_max[k]) * _F32(count - k)
                cost = la + ra
                if not np.isnan(cost) and cost < best_cost:
                    best_cost = cost
                    best = (axis, c_sorted[k] if k < count else c_sorted[-1])
        if best is None or best_cost >= parent_cost:
            return None
        return best

    raise ValueError(f"unknown build option {build_option}")


def _sah_costs(cen, seg_tmin, seg_tmax, pos):
    """EvaluateSAH (Source/BVH.cpp:299-327) vectorized over candidates.

    cen (C,3), seg bounds (C,3), pos (S,3 positions per axis) ->
    costs (S,3) in f32, with the reference's exact arithmetic: untouched
    side bounds stay (1e30, -1e30) whose half-area overflows f32 to inf;
    count 0 then gives 0 * inf = NaN.
    """
    s = pos.shape[0]
    costs = np.empty((s, 3), _F32)
    for axis in range(3):
        # (S, C) membership masks per candidate
        left = cen[None, :, axis] < pos[:, axis][None, :].T  # (S, C)
        n_left = left.sum(axis=1).astype(_F32)
        n_right = _F32(len(cen)) - n_left

        def side_bounds(mask):
            big = _F32(1e30)
            lo = np.where(mask[:, :, None], seg_tmin[None], big)
            hi = np.where(mask[:, :, None], seg_tmax[None], -big)
            return lo.min(axis=1), hi.max(axis=1)

        lmin, lmax = side_bounds(left)
        rmin, rmax = side_bounds(~left)
        costs[:, axis] = n_left * _half_area(lmin, lmax) + n_right * _half_area(rmin, rmax)
    return costs


def _median_split(cen):
    """Forced split of an oversized leaf: median on the widest centroid axis."""
    lo, hi = cen.min(axis=0), cen.max(axis=0)
    axis = int(np.argmax(hi - lo))
    med = _F32(np.median(cen[:, axis]))
    if med <= lo[axis]:
        # nudge so at least one element lands left when possible
        greater = cen[:, axis][cen[:, axis] > lo[axis]]
        med = _F32(greater.min()) if len(greater) else med
    return axis, med
