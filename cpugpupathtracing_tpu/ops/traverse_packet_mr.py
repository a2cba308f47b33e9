"""Multi-row masked packet traversal: 8 independent sub-packets per tile.

traverse_packet.py walks ONE node sequence for 1024 rays; incoherent rays
(NEE shadow fans, diffuse bounces) make its visits nearly disjoint, so
each (8, 128)-wide vector step serves only a couple of rays.  This kernel
gives every sublane row (128 rays) its OWN traversal: 8 stacks, 8 entry
cursors, 8 mask stacks.  Per iteration each row pops its own entry; the 8
node rows load as an (8, 64) matrix whose column slices broadcast as
(8, 1) vectors against the (8, 128) ray registers -- one vector
instruction advances 8 independent sub-unions at once.  Entries are
encoded like ops/traverse_wide.py (>= 0 interior; < 0 leaf with
start << 4 | count; DONE sentinel); leaves process in 4-triangle chunks
whose rows also load as an (8, 9) matrix.

Coherent tiles behave like the single-sequence kernel (all rows walk the
same nodes, now independently); incoherent tiles get up to 8x the visit
throughput.  Hit semantics unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
ROWS = 8              # sub-packets (sublane rows)
LANES = 128
WIDTH = 8             # BVH8
LEAF_MAX = 8          # packet tables build with 8-tri leaves
LEAF_CHUNK = 4        # triangles tested per leaf iteration
STACK = 64            # per-row stack entries
MROWS = STACK + WIDTH  # mask rows per sub-packet (stack + staging)
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF

_SORT8 = (
    (0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (3, 5), (2, 4),
    (1, 2), (3, 4), (5, 6),
)


def _enc_leaf(start, count):
    return -((start << 4) | count) - 1


def _traverse_kernel(
    nodes_ref,   # (B, 64) f32 VMEM
    tris_ref,    # (T, 9)  f32 VMEM leaf order
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (TILE,)
    t0_ref, act_ref,
    t_out, hit_out,
    entry_ref,   # SMEM (ROWS,) i32 current entry per row
    cursor_ref,  # SMEM (ROWS,) i32 leaf cursor per row
    sptr_ref,    # SMEM (ROWS,) i32 stack pointers
    stack_ref,   # SMEM (ROWS, STACK) i32
    mask_ref,    # VMEM (ROWS * MROWS, LANES) i32: per-entry + staging masks
    cmask_ref,   # VMEM (ROWS, LANES) i32 current mask per row
    *, roots: tuple, num_tris: int, any_hit: bool,
):
    shape = (ROWS, LANES)
    ox = ox_ref[:].reshape(shape)
    oy = oy_ref[:].reshape(shape)
    oz = oz_ref[:].reshape(shape)
    dx = dx_ref[:].reshape(shape)
    dy = dy_ref[:].reshape(shape)
    dz = dz_ref[:].reshape(shape)
    act0 = act_ref[:].reshape(shape) != 0
    BIG = 1e30
    ix = jnp.where(dx == 0.0, BIG, 1.0 / dx)
    iy = jnp.where(dy == 0.0, BIG, 1.0 / dy)
    iz = jnp.where(dz == 0.0, BIG, 1.0 / dz)
    t0 = t0_ref[:].reshape(shape)

    # seed every row: current entry = roots[0], rest pre-pushed
    for j in range(ROWS):
        entry_ref[j] = roots[0]
        cursor_ref[j] = 0
        sptr_ref[j] = len(roots) - 1
        for i, r in enumerate(roots[1:]):
            stack_ref[j, i] = r
            mask_ref[j * MROWS + i, :] = act0[j].astype(jnp.int32)
    cmask_ref[:, :] = act0.astype(jnp.int32)

    def body(carry):
        t, hit, _ = carry
        m = cmask_ref[:, :] != 0
        if any_hit:
            m = m & (hit < 0)

        # ---- per-row entry decode + table row loads (scalar control) ----
        nrows = []
        trows = [[] for _ in range(LEAF_CHUNK)]
        leaf_flags = []
        for j in range(ROWS):
            e = entry_ref[j]
            live = e != DONE
            leaf = live & (e < 0)
            v = -e - 1
            start = jnp.where(leaf, (v >> 4) + cursor_ref[j], 0)
            node = jnp.where(live & (e >= 0), e, 0)
            nrows.append(nodes_ref[pl.ds(node, 1), :])
            for c in range(LEAF_CHUNK):
                ti = jnp.clip(start + c, 0, max(num_tris - 1, 0))
                trows[c].append(tris_ref[pl.ds(ti, 1), :])
            leaf_flags.append(leaf)

        nmat = jnp.concatenate(nrows, axis=0)        # (8, 64)
        imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
        leaf_v = jnp.concatenate(
            [jnp.full((1, 1), leaf_flags[j], jnp.int32) for j in range(ROWS)],
            axis=0,
        ) != 0                                        # (8, 1)

        # ---- interior: 8 children, bounds as (8,1) column slices ----
        child_masks = []
        child_dmin = []
        for k in range(WIDTH):
            b = nmat[:, 6 * k : 6 * k + 6]            # (8, 6)
            tx1 = (b[:, 0:1] - ox) * ix
            ty1 = (b[:, 1:2] - oy) * iy
            tz1 = (b[:, 2:3] - oz) * iz
            tx2 = (b[:, 3:4] - ox) * ix
            ty2 = (b[:, 4:5] - oy) * iy
            tz2 = (b[:, 5:6] - oz) * iz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
                jnp.minimum(tz1, tz2),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
                jnp.maximum(tz1, tz2),
            )
            bm = (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & m & ~leaf_v
            child_masks.append(bm)
            child_dmin.append(
                jnp.min(jnp.where(bm, tmin, jnp.inf), axis=1, keepdims=True)
            )

        # ---- leaf: LEAF_CHUNK triangles, components as (8,1) slices ----
        for c in range(LEAF_CHUNK):
            tm = jnp.concatenate(trows[c], axis=0)    # (8, 9)
            v0x, v0y, v0z = tm[:, 0:1], tm[:, 1:2], tm[:, 2:3]
            e1x, e1y, e1z = tm[:, 3:4], tm[:, 4:5], tm[:, 5:6]
            e2x, e2y, e2z = tm[:, 6:7], tm[:, 7:8], tm[:, 8:9]
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
            vv = f * (dx * qx + dy * qy + dz * qz)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            in_cnt = []
            tri_ids = []
            for j in range(ROWS):
                e = entry_ref[j]
                leaf = (e != DONE) & (e < 0)
                v = -e - 1
                cnt = jnp.where(leaf, v & 15, 0)
                cur = cursor_ref[j]
                in_cnt.append(jnp.full((1, 1), (cur + c) < cnt, jnp.int32))
                tri_ids.append(
                    jnp.full(
                        (1, 1),
                        jnp.clip((v >> 4) + cur + c, 0, max(num_tris - 1, 0)),
                        jnp.int32,
                    )
                )
            in_cnt_v = jnp.concatenate(in_cnt, axis=0) != 0   # (8,1)
            tri_id_v = jnp.concatenate(tri_ids, axis=0)       # (8,1)
            valid = (
                det_ok & (u >= 0.0) & (u <= 1.0) & (vv >= 0.0)
                & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t)
                & m & leaf_v & in_cnt_v
            )
            t = jnp.where(valid, tt, t)
            hit = jnp.where(valid, tri_id_v, hit)

        # ---- per-row control (scalar) ----
        alive = jnp.int32(0)
        for j in range(ROWS):
            e = entry_ref[j]
            live = e != DONE
            leaf = live & (e < 0)
            interior = live & (e >= 0)
            v = -e - 1
            cnt = jnp.where(leaf, v & 15, 0)
            cur = cursor_ref[j]
            leaf_done = leaf & ((cur + LEAF_CHUNK) >= cnt)

            ds_ = []
            es_ = []
            ks_ = []
            for k in range(WIDTH):
                cidx = imat[j, 48 + k]
                ccnt = imat[j, 56 + k]
                dmin = jnp.where(
                    interior & (ccnt != -1), child_dmin[k][j, 0], jnp.inf
                )
                ent = jnp.where(ccnt > 0, _enc_leaf(cidx, ccnt), cidx)
                ds_.append(jnp.where(jnp.isfinite(dmin), dmin, -jnp.inf))
                es_.append(ent)
                ks_.append(jnp.int32(k))
                # stage child mask at row j's staging slot k
                mask_ref[j * MROWS + STACK + k, :] = child_masks[k][j].astype(jnp.int32)
            for a2, b2 in _SORT8:
                sw = ds_[a2] < ds_[b2]
                ds_[a2], ds_[b2] = (
                    jnp.where(sw, ds_[b2], ds_[a2]),
                    jnp.where(sw, ds_[a2], ds_[b2]),
                )
                es_[a2], es_[b2] = (
                    jnp.where(sw, es_[b2], es_[a2]),
                    jnp.where(sw, es_[a2], es_[b2]),
                )
                ks_[a2], ks_[b2] = (
                    jnp.where(sw, ks_[b2], ks_[a2]),
                    jnp.where(sw, ks_[a2], ks_[b2]),
                )
            # push ALL hit children far-to-near: the nearest ends on top
            # and the next pop descends into it (same flow as the
            # single-sequence kernel)
            sp = sptr_ref[j]
            for k in range(WIDTH):
                push = jnp.isfinite(ds_[k])
                # dummy writes park on the stack's last slot (depth 64 is
                # far beyond any real tree's worst case)
                slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                prev = stack_ref[j, slot]
                stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                staged = mask_ref[pl.ds(j * MROWS + STACK + ks_[k], 1), :]
                dst = j * MROWS + slot
                cur_mask_row = mask_ref[pl.ds(dst, 1), :]
                mask_ref[pl.ds(dst, 1), :] = jnp.where(
                    push, staged, cur_mask_row
                )
                sp = sp + jnp.where(push, 1, 0)

            stay_leaf = leaf & ~leaf_done
            want_pop = live & ~stay_leaf  # leaf done or interior expanded
            can_pop = sp > 0
            top = stack_ref[j, jnp.maximum(sp - 1, 0)]
            nxt = jnp.where(
                stay_leaf, e, jnp.where(want_pop & can_pop, top, DONE)
            )
            nxt = jnp.where(live, nxt, DONE)
            do_pop = want_pop & can_pop
            sptr_ref[j] = jnp.where(do_pop, sp - 1, sp)
            entry_ref[j] = nxt
            cursor_ref[j] = jnp.where(stay_leaf, cur + LEAF_CHUNK, 0)

            # current mask for the next entry
            cur_row = cmask_ref[pl.ds(j, 1), :]
            pop_row = mask_ref[pl.ds(j * MROWS + jnp.maximum(sp - 1, 0), 1), :]
            new_mask = jnp.where(
                stay_leaf, cur_row, jnp.where(do_pop, pop_row, 0)
            )
            cmask_ref[pl.ds(j, 1), :] = new_mask
            alive = alive + jnp.where(nxt != DONE, 1, 0)
        return t, hit, alive

    def cond(carry):
        return carry[2] > 0

    t, hit, _ = jax.lax.while_loop(
        cond, body, (t0, jnp.full(shape, -1, jnp.int32), jnp.int32(1))
    )
    t_out[:] = t.reshape(-1)
    hit_out[:] = hit.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("roots", "interpret", "any_hit")
)
def traverse_packet_mr(
    origin, direction, t_init, nodes, tris9, leaf_tri_id, roots,
    *, active=None, interpret: bool = False, any_hit: bool = False,
):
    """Multi-row packet traversal; same signature/semantics contract as
    traverse_packet.traverse_packet."""
    n0 = origin.shape[0]
    roots = tuple(int(r) for r in roots)
    n = -(-n0 // TILE) * TILE
    num_tiles = n // TILE
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
            _traverse_kernel, roots=roots, num_tris=num_tris, any_hit=any_hit
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)] * 8,
        out_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS, STACK), jnp.int32),
            pltpu.VMEM((ROWS * MROWS, LANES), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
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
