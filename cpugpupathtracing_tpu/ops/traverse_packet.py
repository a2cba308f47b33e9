"""Pallas masked-packet BVH traversal -- the TPU speed-of-light path.

XLA-level wavefront traversal is bound by per-lane gathers: every
lockstep step moves a padded node row per ray through HBM.  This kernel
removes gathers entirely: a grid program owns a TILE of rays, walks one
shared node sequence from a scalar stack in SMEM, and tests children /
triangles as scalar-broadcast vector ops against the whole tile.  The
BVH8 node table and leaf-ordered triangles stay VMEM-resident across the
grid, so a traversal step costs one VMEM row load plus ~a hundred VPU
ops -- no HBM traffic at all.

Naive packet traversal visits the tile's *fan volume* (every node ANY
ray's frustum touches), which explodes for spread-origin rays (NEE
shadow fans from a distant ground tile can swallow the whole tree).
This kernel is *hierarchical*: every stack entry carries the mask of
rays that survived all ancestor boxes (a VMEM mask stack), so a child is
pushed only when a ray that actually reached its parent hits it.  The
visited set is then exactly the union of per-ray traversal sets -- the
optimum for a shared-sequence scheme -- and divergence costs only what
overlap fails to amortize.

Ordering: children push far-to-near through a 19-comparator scalar
sorting network keyed on masked tile-min slab entry distances, so t
converges fast and far subtrees get culled.  any_hit (occlusion) lanes
drop out of every mask as soon as they find a hit.

Same hit semantics as every other traversal in this package (nearest
hit, reference triangle predicates, conservative zero-direction slabs).
Scenes with instances fall back to the XLA wide path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # rays per grid program ((8,128) vreg set)
WIDTH = 8            # BVH8
LEAF_MAX = 8         # packet trees build with wider leaves (shallower unions)
STACK = 64
TRI_DET_EPS = 0.001

# optimal 19-comparator sorting network for 8 inputs
_SORT8 = (
    (0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (3, 5), (2, 4),
    (1, 2), (3, 4), (5, 6),
)


def _traverse_kernel(
    nodes_ref,   # (B, 64) f32 VMEM, whole table
    tris_ref,    # (T, 9)  f32 VMEM, leaf order, whole table
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (tile,) f32
    t0_ref,      # (tile,) f32 initial nearest-t (tmax for shadow rays)
    act_ref,     # (tile,) i32 1 = lane participates
    t_out, hit_out,  # (tile,) f32 / i32
    stack_ref,   # SMEM (STACK,) i32 scratch: node entries
    mask_ref,    # VMEM (STACK, tile//128, 128) i32: per-entry ray masks
    *, roots: tuple, num_tris: int, tile: int, any_hit: bool,
):
    shape = (tile // 128, 128)
    ox = ox_ref[:].reshape(shape)
    oy = oy_ref[:].reshape(shape)
    oz = oz_ref[:].reshape(shape)
    dx = dx_ref[:].reshape(shape)
    dy = dy_ref[:].reshape(shape)
    dz = dz_ref[:].reshape(shape)
    act0 = act_ref[:].reshape(shape) != 0
    # NaN-safe inverse: zero components map to +BIG instead of inf, so
    # 0 * inf NaNs never arise ([0, BIG] over-covers on-boundary rays,
    # which is conservative).
    BIG = 1e30
    ix = jnp.where(dx == 0.0, BIG, 1.0 / dx)
    iy = jnp.where(dy == 0.0, BIG, 1.0 / dy)
    iz = jnp.where(dz == 0.0, BIG, 1.0 / dz)
    t0 = t0_ref[:].reshape(shape)

    for i, r in enumerate(roots):
        stack_ref[i] = r
        mask_ref[i, :, :] = act0.astype(jnp.int32)

    def slab(k, row, t, m):
        """Child k bounds vs rays in mask m: (mask', tile-min distance)."""
        bxmin = row[0, 6 * k + 0]
        bymin = row[0, 6 * k + 1]
        bzmin = row[0, 6 * k + 2]
        bxmax = row[0, 6 * k + 3]
        bymax = row[0, 6 * k + 4]
        bzmax = row[0, 6 * k + 5]
        tx1 = (bxmin - ox) * ix
        tx2 = (bxmax - ox) * ix
        ty1 = (bymin - oy) * iy
        ty2 = (bymax - oy) * iy
        tz1 = (bzmin - oz) * iz
        tz2 = (bzmax - oz) * iz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2),
        )
        mask = (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & m
        dmin = jnp.min(jnp.where(mask, tmin, jnp.inf))
        return mask, dmin

    def tri_test(idx, t, hit, box_mask):
        """One triangle (scalars broadcast) vs rays in box_mask."""
        r = tris_ref[pl.ds(idx, 1), :]  # (1, 9)
        v0x, v0y, v0z = r[0, 0], r[0, 1], r[0, 2]
        e1x, e1y, e1z = r[0, 3], r[0, 4], r[0, 5]
        e2x, e2y, e2z = r[0, 6], r[0, 7], r[0, 8]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        det_ok = jnp.abs(a) >= TRI_DET_EPS
        f = 1.0 / jnp.where(det_ok, a, 1.0)
        sx = ox - v0x
        sy = oy - v0y
        sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        tt = f * (e2x * qx + e2y * qy + e2z * qz)
        valid = (
            det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & ((u + v) <= 1.0)
            & (tt > 0.0) & (tt < t) & box_mask
        )
        t_new = jnp.where(valid, tt, t)
        hit_new = jnp.where(valid, idx, hit)
        return t_new, hit_new

    def body(carry):
        sptr, t, hit = carry
        node = stack_ref[sptr - 1]
        m = mask_ref[pl.ds(sptr - 1, 1), :, :][0] != 0
        if any_hit:
            # occlusion: lanes with a confirmed hit stop contributing
            m = m & (hit < 0)
        sptr = sptr - 1
        row = nodes_ref[pl.ds(node, 1), :]  # (1, 64)
        irow = jax.lax.bitcast_convert_type(row, jnp.int32)

        push_d = []
        push_i = []
        push_k = []
        for k in range(WIDTH):
            cidx = irow[0, 48 + k]
            ccnt = irow[0, 56 + k]
            box, dmin = slab(k, row, t, m)
            anyhit = jnp.isfinite(dmin) & (ccnt != -1)

            def leaf_case(tc, box=box, cidx=cidx, ccnt=ccnt):
                t, hit = tc
                for j in range(LEAF_MAX):
                    bm = box & (j < ccnt)
                    t, hit = tri_test(cidx + j, t, hit, bm)
                return t, hit

            t, hit = jax.lax.cond(
                anyhit & (ccnt > 0), leaf_case, lambda tc: tc, (t, hit)
            )
            push = anyhit & (ccnt == 0)
            push_d.append(jnp.where(push, dmin, -jnp.inf))
            push_i.append(cidx)
            push_k.append(jnp.int32(k))
            # stage this child's mask at fixed scratch row STACK + k
            # (vector selects with scalar predicates don't legalize, so
            # masks are sorted by reference through these staging rows)
            mask_ref[STACK + k, :, :] = box.astype(jnp.int32)

        # far-to-near ordered pushes (nearest pops first): sort the
        # scalar (distance, child, staging-row) triples
        for a, b2 in _SORT8:
            swap = push_d[a] < push_d[b2]
            push_d[a], push_d[b2] = (
                jnp.where(swap, push_d[b2], push_d[a]),
                jnp.where(swap, push_d[a], push_d[b2]),
            )
            push_i[a], push_i[b2] = (
                jnp.where(swap, push_i[b2], push_i[a]),
                jnp.where(swap, push_i[a], push_i[b2]),
            )
            push_k[a], push_k[b2] = (
                jnp.where(swap, push_k[b2], push_k[a]),
                jnp.where(swap, push_k[a], push_k[b2]),
            )
        for k in range(WIDTH):
            push = jnp.isfinite(push_d[k])
            slot = jnp.where(push, sptr, STACK - 1)
            prev = stack_ref[slot]
            stack_ref[slot] = jnp.where(push, push_i[k], prev)
            # child's mask: rays that reached this node AND hit the child
            staged = mask_ref[pl.ds(STACK + push_k[k], 1), :, :]
            mask_ref[pl.ds(slot, 1), :, :] = staged
            sptr = sptr + jnp.where(push, 1, 0)
        return sptr, t, hit

    def cond(carry):
        return carry[0] > 0

    t = t0
    hit = jnp.full(shape, -1, jnp.int32)
    sptr, t, hit = jax.lax.while_loop(
        cond, body, (jnp.int32(len(roots)), t, hit)
    )

    t_out[:] = t.reshape(-1)
    hit_out[:] = hit.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("roots", "interpret", "tile", "any_hit")
)
def traverse_packet(
    origin, direction, t_init, nodes, tris9, leaf_tri_id, roots,
    *, active=None, interpret: bool = False, tile: int = TILE,
    any_hit: bool = False,
):
    """Masked-packet traversal over tile-ray grid programs.

    origin/direction (N, 3); N is padded to a tile multiple internally.
    `roots` is a static tuple of scene-object BVH roots (all seeded on
    the shared stack). Returns (t, original tri id, zeros, -1s) matching
    the other traversals' signature (the bvh-depth debug counter is not
    tracked per lane in packet mode).
    """
    n0 = origin.shape[0]
    roots = tuple(int(r) for r in roots)
    n = -(-n0 // tile) * tile
    num_tiles = n // tile
    num_tris = tris9.shape[0]
    if active is None:
        act = jnp.ones((n0,), jnp.int32)
    else:
        act = active.astype(jnp.int32)
    if n != n0:
        pad = n - n0
        origin = jnp.concatenate([origin, jnp.ones((pad, 3), origin.dtype)])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3), direction.dtype)])
        t_init = jnp.concatenate([t_init, jnp.zeros((pad,), t_init.dtype)])
        act = jnp.concatenate([act, jnp.zeros((pad,), jnp.int32)])

    t, hit = pl.pallas_call(
        functools.partial(
            _traverse_kernel, roots=roots, num_tris=num_tris, tile=tile,
            any_hit=any_hit,
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes: resident table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris: resident table
        ]
        + [pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)] * 8,
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((STACK + WIDTH, tile // 128, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        nodes, tris9,
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        t_init, act,
    )
    t = t[:n0]
    hit = hit[:n0]
    hit_orig = jnp.where(
        hit >= 0, leaf_tri_id[jnp.clip(hit, 0, max(num_tris - 1, 0))], -1
    )
    return t, hit_orig, jnp.zeros((n0,), jnp.int32), jnp.full((n0,), -1, jnp.int32)
