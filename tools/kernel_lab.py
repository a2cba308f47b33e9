"""Packet-kernel experiment lab: a parametrized (non-instanced,
closest-hit) copy of ops/traverse_packet_slim.py with static ablation /
optimization flags, used to find where the measured ~1.4 us/iteration
goes (the round-2 census put the pure vector work at ~0.5 us).

Variants (opts dict, all static):
  leaf="full" | "skip"      -- ablate the 8-triangle leaf phase (timing
                               only: results are wrong with "skip")
  slab="full" | "skip"      -- ablate the 8-child slab phase (pushes all
                               children of every interior: wrong + slow
                               traversal, isolates slab vector cost)
  ctrl="extract" | "packed" -- per-row control reads: 16 vector->scalar
                               extracts per row (current kernel) vs ONE
                               packed word per row (mask|best_k) built in
                               the vector domain
  entries="vector" | "smem" -- child entry words from the loaded node
                               row (vector extract) vs an SMEM mirror of
                               nodes[:, 48:56] (scalar loads)
  unroll=1 | 2 | 4          -- stack entries processed per while-loop
                               iteration (bit-identical traversal order)

Results get folded back into the real kernel; this file is a harness,
not a product path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY
from cpugpupathtracing_tpu.ops.traverse_packet_slim import _ctz8

TILE = 1024
GROUPS = 4
ROWS = 8
LANES = 128
WIDTH = 8
LEAF_TRIS = 8
STACK = 64
FRAME_STACK = 189  # 21 x 9-slot frames for the framestack ctrl variant
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF
BIG = 1e30


def fuse_tables(nodes, ltris):
    """Build the unified (node|leaf) table for the decode='fused' lab
    variant: node rows pad 64 -> 128 columns, leaf rows append after
    them, and child entries re-encode leaf children from -(lrow+1) to
    nn + lrow so EVERY live entry is a direct row index into one table
    (DONE / SLIM_EMPTY sentinels unchanged; roots unchanged).  Halves
    the per-row dynamic loads and removes the node/lrow address selects
    from the decode phase, at the cost of 2x node-table VMEM."""
    import numpy as np

    nodes = np.asarray(nodes)
    ltris = np.asarray(ltris)
    nn = len(nodes)
    un = np.zeros((nn + len(ltris), 128), np.float32)
    un[:nn, :64] = nodes
    un[nn:] = ltris
    ci = un[:nn, 48:56].view(np.int32)
    leaf = ci < 0
    ci[leaf] = nn + (-ci[leaf] - 1)
    return un, nn


def _lab_kernel(*refs, roots, opts):
    refs = list(refs)
    smem_entries = opts.get("entries", "vector") == "smem"
    if smem_entries:
        (nodes_ref, ltris_ref, ents_ref) = refs[:3]
        refs = refs[3:]
    else:
        (nodes_ref, ltris_ref) = refs[:2]
        ents_ref = None
        refs = refs[2:]
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out, depth_out, iters_out,
        entry_ref, sptr_ref, stack_ref,
    ) = refs
    unroll = opts.get("unroll", 1)
    leaf_mode = {"full": "seq"}.get(opts.get("leaf", "full"), opts.get("leaf"))
    slab_mode = {"full": "seq"}.get(opts.get("slab", "full"), opts.get("slab"))
    packed_ctrl = opts.get("ctrl", "extract") == "packed"
    packed_mask = opts.get("ctrl", "extract") == "packedmask"
    frame_stack = opts.get("ctrl", "extract") == "framestack"
    fixed_order = opts.get("order", "nearest") == "fixed"
    fused = opts.get("decode") == "fused"
    nn_rows = opts.get("nn", 0)  # node-row count of the fused table

    pid = pl.program_id(0)  # hoisted: interpret mode cannot lower
    # program_id inside a pl.when body
    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        any_act = jnp.sum(act_ref[gs]) > 0
        iters_out[pid * GROUPS + g] = 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gs=gs):
            t_out[gs] = t0_ref[gs]
            hit_out[gs] = jnp.full((TILE,), -1, jnp.int32)
            obj_out[gs] = jnp.full((TILE,), -1, jnp.int32)
            depth_out[gs] = jnp.zeros((TILE,), jnp.int32)

        @pl.when(any_act)
        def _group(g=g, gs=gs):
            shape = (ROWS, LANES)
            ox = ox_ref[gs].reshape(shape)
            oy = oy_ref[gs].reshape(shape)
            oz = oz_ref[gs].reshape(shape)
            dx = dx_ref[gs].reshape(shape)
            dy = dy_ref[gs].reshape(shape)
            dz = dz_ref[gs].reshape(shape)
            act0 = act_ref[gs].reshape(shape) != 0

            def inv_dir(d):
                return jnp.where(d == 0.0, BIG, 1.0 / d)

            ix = inv_dir(dx)
            iy = inv_dir(dy)
            iz = inv_dir(dz)
            t0 = t0_ref[gs].reshape(shape)

            for j in range(ROWS):
                entry_ref[j] = roots[0]
                if frame_stack:
                    # uniform 9-slot frame format: [8 child slots, mask];
                    # remaining roots form the bottom frame
                    nroots = len(roots) - 1
                    for i, r in enumerate(roots[1:]):
                        stack_ref[j, i] = r
                    stack_ref[j, 8] = (1 << nroots) - 1
                    sptr_ref[j] = 9 if nroots else 0
                else:
                    sptr_ref[j] = len(roots) - 1
                    for i, r in enumerate(roots[1:]):
                        stack_ref[j, i] = r

            def entry_step(t, hit, obj, depth):
                """One stack entry per row: decode, slab, leaf, control."""
                m = act0

                # ---- per-row entry decode + row loads ----
                entries = []
                if fused:
                    # unified table: ONE dynamic load per row, ONE
                    # address select (live), flags from scalar compares
                    # against the static node-row count
                    urows = []
                    for j in range(ROWS):
                        e = entry_ref[j]
                        entries.append(e)
                        row = jnp.where(e != DONE, e, 0)
                        urows.append(nodes_ref[pl.ds(row, 1), :])
                    lmat = jnp.concatenate(urows, axis=0)     # (8, 128)
                    nmat = lmat[:, :64]
                else:
                    nrows, lrows = [], []
                    for j in range(ROWS):
                        e = entry_ref[j]
                        entries.append(e)
                        leaf = (e != DONE) & (e < 0)
                        interior = (e != DONE) & (e >= 0)
                        node = jnp.where(interior, e, 0)
                        lrow = jnp.where(leaf, -e - 1, 0)
                        nrows.append(nodes_ref[pl.ds(node, 1), :])
                        lrows.append(ltris_ref[pl.ds(lrow, 1), :])
                    nmat = jnp.concatenate(nrows, axis=0)
                    lmat = jnp.concatenate(lrows, axis=0)
                imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
                # ONE scalar->vector staging of the entries: leaf/interior
                # flags derive in the vector domain
                evec = jnp.concatenate(
                    [jnp.full((1, 1), entries[j], jnp.int32) for j in range(ROWS)],
                    axis=0,
                )                                            # (8, 1)
                live_v = evec != DONE
                if fused:
                    leaf_v = live_v & (evec >= nn_rows)
                    int_v = live_v & (evec < nn_rows)
                else:
                    leaf_v = live_v & (evec < 0)
                    int_v = live_v & (evec >= 0)

                # ---- interior: 8 child slab tests ----
                child_dmin = []
                lane_desc = None
                if slab_mode == "seq":
                    for k in range(WIDTH):
                        b = nmat[:, 6 * k : 6 * k + 6]
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
                        valid_v = imat[:, 48 + k : 49 + k] != SLIM_EMPTY
                        bm = (
                            (tmax >= tmin) & (tmin < t) & (tmax > 0.0)
                            & m & int_v & valid_v
                        )
                        child_dmin.append(
                            jnp.min(jnp.where(bm, tmin, jnp.inf), axis=1, keepdims=True)
                        )
                        lane_desc = bm if lane_desc is None else (lane_desc | bm)
                    depth = depth + lane_desc.astype(jnp.int32)
                elif slab_mode == "ilv":
                    # op-stage-major over the 8 (independent) children:
                    # consecutive instructions have no data dependency, so
                    # chain latency hides behind issue instead of stalling
                    R = range(WIDTH)
                    if opts.get("fma"):
                        # b*inv - o*inv with o*inv hoisted loop-invariant:
                        # one fused multiply-add per plane instead of
                        # sub+mul.  NOT bit-identical to (b-o)*inv --
                        # slab bounds move ~1 ulp; harness asserts
                        # whether hits survive.
                        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz
                        tx1 = [nmat[:, 6 * k + 0 : 6 * k + 1] * ix - oxi for k in R]
                        ty1 = [nmat[:, 6 * k + 1 : 6 * k + 2] * iy - oyi for k in R]
                        tz1 = [nmat[:, 6 * k + 2 : 6 * k + 3] * iz - ozi for k in R]
                        tx2 = [nmat[:, 6 * k + 3 : 6 * k + 4] * ix - oxi for k in R]
                        ty2 = [nmat[:, 6 * k + 4 : 6 * k + 5] * iy - oyi for k in R]
                        tz2 = [nmat[:, 6 * k + 5 : 6 * k + 6] * iz - ozi for k in R]
                    else:
                        tx1 = [(nmat[:, 6 * k + 0 : 6 * k + 1] - ox) * ix for k in R]
                        ty1 = [(nmat[:, 6 * k + 1 : 6 * k + 2] - oy) * iy for k in R]
                        tz1 = [(nmat[:, 6 * k + 2 : 6 * k + 3] - oz) * iz for k in R]
                        tx2 = [(nmat[:, 6 * k + 3 : 6 * k + 4] - ox) * ix for k in R]
                        ty2 = [(nmat[:, 6 * k + 4 : 6 * k + 5] - oy) * iy for k in R]
                        tz2 = [(nmat[:, 6 * k + 5 : 6 * k + 6] - oz) * iz for k in R]
                    mnx = [jnp.minimum(tx1[k], tx2[k]) for k in R]
                    mny = [jnp.minimum(ty1[k], ty2[k]) for k in R]
                    mnz = [jnp.minimum(tz1[k], tz2[k]) for k in R]
                    mxx = [jnp.maximum(tx1[k], tx2[k]) for k in R]
                    mxy = [jnp.maximum(ty1[k], ty2[k]) for k in R]
                    mxz = [jnp.maximum(tz1[k], tz2[k]) for k in R]
                    tmin = [
                        jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k]) for k in R
                    ]
                    tmax = [
                        jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k]) for k in R
                    ]
                    valid = [imat[:, 48 + k : 49 + k] != SLIM_EMPTY for k in R]
                    bm = [
                        (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                        & m & int_v & valid[k]
                        for k in R
                    ]
                    child_dmin = [
                        jnp.min(
                            jnp.where(bm[k], tmin[k], jnp.inf), axis=1, keepdims=True
                        )
                        for k in R
                    ]
                    lane_desc = bm[0]
                    for k in range(1, WIDTH):
                        lane_desc = lane_desc | bm[k]
                    depth = depth + lane_desc.astype(jnp.int32)
                else:
                    for k in range(WIDTH):
                        valid_v = imat[:, 48 + k : 49 + k] != SLIM_EMPTY
                        child_dmin.append(
                            jnp.where(int_v & valid_v, 0.0, jnp.inf)
                        )

                # ---- leaf: 8 x 16-col records ----
                limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
                if leaf_mode == "ilv":
                    # op-stage-major over the 8 independent triangles
                    R = range(LEAF_TRIS)
                    tm = [lmat[:, 16 * c : 16 * c + 12] for c in R]
                    hx = [dy * tm[c][:, 8:9] - dz * tm[c][:, 7:8] for c in R]
                    hy = [dz * tm[c][:, 6:7] - dx * tm[c][:, 8:9] for c in R]
                    hz = [dx * tm[c][:, 7:8] - dy * tm[c][:, 6:7] for c in R]
                    a = [
                        tm[c][:, 3:4] * hx[c] + tm[c][:, 4:5] * hy[c]
                        + tm[c][:, 5:6] * hz[c]
                        for c in R
                    ]
                    det_ok = [jnp.abs(a[c]) >= TRI_DET_EPS for c in R]
                    f = [1.0 / jnp.where(det_ok[c], a[c], 1.0) for c in R]
                    sx = [ox - tm[c][:, 0:1] for c in R]
                    sy = [oy - tm[c][:, 1:2] for c in R]
                    sz = [oz - tm[c][:, 2:3] for c in R]
                    u = [
                        f[c] * (sx[c] * hx[c] + sy[c] * hy[c] + sz[c] * hz[c])
                        for c in R
                    ]
                    qx = [sy[c] * tm[c][:, 5:6] - sz[c] * tm[c][:, 4:5] for c in R]
                    qy = [sz[c] * tm[c][:, 3:4] - sx[c] * tm[c][:, 5:6] for c in R]
                    qz = [sx[c] * tm[c][:, 4:5] - sy[c] * tm[c][:, 3:4] for c in R]
                    vv = [f[c] * (dx * qx[c] + dy * qy[c] + dz * qz[c]) for c in R]
                    tt = [
                        f[c]
                        * (
                            tm[c][:, 6:7] * qx[c] + tm[c][:, 7:8] * qy[c]
                            + tm[c][:, 8:9] * qz[c]
                        )
                        for c in R
                    ]
                    for c in R:
                        valid = (
                            det_ok[c] & (u[c] >= 0.0) & (u[c] <= 1.0)
                            & (vv[c] >= 0.0) & ((u[c] + vv[c]) <= 1.0)
                            & (tt[c] > 0.0) & (tt[c] < t) & m & leaf_v
                        )
                        t = jnp.where(valid, tt[c], t)
                        hit = jnp.where(
                            valid, limat[:, 16 * c + 13 : 16 * c + 14], hit
                        )
                        obj = jnp.where(
                            valid, limat[:, 16 * c + 12 : 16 * c + 13], obj
                        )
                elif leaf_mode == "seq":
                    for c in range(LEAF_TRIS):
                        tm = lmat[:, 16 * c : 16 * c + 12]
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
                        valid = (
                            det_ok & (u >= 0.0) & (u <= 1.0) & (vv >= 0.0)
                            & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t)
                            & m & leaf_v
                        )
                        t = jnp.where(valid, tt, t)
                        hit = jnp.where(
                            valid, limat[:, 16 * c + 13 : 16 * c + 14], hit
                        )
                        obj = jnp.where(
                            valid, limat[:, 16 * c + 12 : 16 * c + 13], obj
                        )

                # ---- control ----
                if packed_mask or frame_stack:
                    # 8-bit finite mask built in the vector domain, ONE
                    # extract per row; no nearest-child ordering
                    D = jnp.concatenate(child_dmin, axis=1)   # (8, 8)
                    fin = jnp.isfinite(D)
                    mask_bits = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(WIDTH):
                        mask_bits = mask_bits | (
                            fin[:, k : k + 1].astype(jnp.int32) << k
                        )
                if packed_ctrl:
                    # pass mask + best_k packed in the vector domain; ONE
                    # vector->scalar extract per row
                    D = jnp.concatenate(child_dmin, axis=1)   # (8, 8)
                    fin = jnp.isfinite(D)
                    mask_bits = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(WIDTH):
                        mask_bits = mask_bits | (
                            fin[:, k : k + 1].astype(jnp.int32) << k
                        )
                    bd = D[:, 0:1]
                    bk = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(1, WIDTH):
                        sw = D[:, k : k + 1] < bd
                        bd = jnp.where(sw, D[:, k : k + 1], bd)
                        bk = jnp.where(sw, jnp.int32(k), bk)
                    packed = mask_bits | (bk << 8)

                alive = jnp.int32(0)
                for j in range(ROWS):
                    e = entries[j]
                    live = e != DONE
                    if fused:
                        interior = live & (e < nn_rows)
                    else:
                        interior = live & (e >= 0)
                    sp = sptr_ref[j]

                    if smem_entries:
                        node_j = jnp.where(interior, e, 0)
                        es_ = [ents_ref[node_j, k] for k in range(WIDTH)]
                    else:
                        es_ = [imat[j, 48 + k] for k in range(WIDTH)]

                    if frame_stack:
                        # 9-slot frame push: 8 UNCONDITIONAL stores + the
                        # pass mask + one conditional sp bump replace the
                        # per-child conditional-select chains (junk
                        # frames land above the live top and are never
                        # observed).  Pop: ctz of the top frame's mask.
                        w = mask_bits[j, 0]
                        base_p = jnp.minimum(sp, FRAME_STACK - 9)
                        for k in range(WIDTH):
                            stack_ref[j, base_p + k] = es_[k]
                        stack_ref[j, base_p + 8] = w
                        do_push = interior & (w != 0)
                        sp = sp + jnp.where(do_push, 9, 0)

                        can = live & (sp > 0)
                        base = jnp.maximum(sp - 9, 0)
                        mw = stack_ref[j, base + 8]
                        ent = stack_ref[j, base + _ctz8(mw)]
                        rem = mw & (mw - 1)
                        stack_ref[j, base + 8] = rem
                        sp = jnp.where(rem == 0, base, sp)
                        nxt = jnp.where(can, ent, DONE)
                        sptr_ref[j] = sp
                        entry_ref[j] = nxt
                        alive = alive + jnp.where(nxt != DONE, 1, 0)
                        continue

                    if packed_mask:
                        # fixed push order, mask from one packed extract
                        w = mask_bits[j, 0]
                        for k in range(WIDTH):
                            push = (
                                ((jax.lax.shift_right_logical(w, k) & 1) != 0)
                                & interior
                            )
                            slot = jnp.where(
                                push, jnp.minimum(sp, STACK - 1), STACK - 1
                            )
                            prev = stack_ref[j, slot]
                            stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                            sp = sp + jnp.where(push, 1, 0)
                    elif fixed_order:
                        # fixed push order from per-child extracts
                        ds_ = [child_dmin[k][j, 0] for k in range(WIDTH)]
                        for k in range(WIDTH):
                            push = jnp.isfinite(ds_[k]) & interior
                            slot = jnp.where(
                                push, jnp.minimum(sp, STACK - 1), STACK - 1
                            )
                            prev = stack_ref[j, slot]
                            stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                            sp = sp + jnp.where(push, 1, 0)
                    else:
                        if packed_ctrl:
                            w = packed[j, 0]
                            best_k = jax.lax.shift_right_logical(w, 8)
                            has = [
                                (jax.lax.shift_right_logical(w, k) & 1) != 0
                                for k in range(WIDTH)
                            ]
                            any_child = (w & 0xFF) != 0
                        else:
                            ds_ = [child_dmin[k][j, 0] for k in range(WIDTH)]
                            best_d = ds_[0]
                            best_k = jnp.int32(0)
                            for k in range(1, WIDTH):
                                sw = ds_[k] < best_d
                                best_d = jnp.where(sw, ds_[k], best_d)
                                best_k = jnp.where(sw, jnp.int32(k), best_k)
                            has = [jnp.isfinite(ds_[k]) for k in range(WIDTH)]
                            any_child = jnp.isfinite(best_d)

                        for k in range(WIDTH):
                            push = has[k] & interior & (best_k != k)
                            slot = jnp.where(
                                push, jnp.minimum(sp, STACK - 1), STACK - 1
                            )
                            prev = stack_ref[j, slot]
                            stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                            sp = sp + jnp.where(push, 1, 0)
                        push = any_child & interior
                        ent_b = es_[0]
                        for k in range(1, WIDTH):
                            ent_b = jnp.where(best_k == k, es_[k], ent_b)
                        slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                        prev = stack_ref[j, slot]
                        stack_ref[j, slot] = jnp.where(push, ent_b, prev)
                        sp = sp + jnp.where(push, 1, 0)

                    can = live & (sp > 0)
                    top = stack_ref[j, jnp.maximum(sp - 1, 0)]
                    nxt = jnp.where(can, top, DONE)
                    sptr_ref[j] = jnp.where(can, sp - 1, sp)
                    entry_ref[j] = nxt
                    alive = alive + jnp.where(nxt != DONE, 1, 0)
                return t, hit, obj, depth, alive

            def body(carry):
                t, hit, obj, depth, it, _ = carry
                alive = None
                for _ in range(unroll):
                    t, hit, obj, depth, alive = entry_step(t, hit, obj, depth)
                return t, hit, obj, depth, it + 1, alive

            def cond(carry):
                return carry[-1] > 0

            init = (
                t0,
                jnp.full(shape, -1, jnp.int32),
                jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.int32),
                jnp.int32(0),
                jnp.int32(1),
            )
            out = jax.lax.while_loop(cond, body, init)
            t, hit, obj, depth = out[:4]
            t_out[gs] = t.reshape(-1)
            hit_out[gs] = hit.reshape(-1)
            obj_out[gs] = obj.reshape(-1)
            depth_out[gs] = depth.reshape(-1)
            iters_out[pid * GROUPS + g] = out[4]


@functools.partial(jax.jit, static_argnames=("roots", "opts_t"))
def traverse_lab(origin, direction, t_init, nodes, ltris, roots, *, active,
                 opts_t=()):
    opts = dict(opts_t)
    ox_c, oy_c, oz_c = origin
    dx_c, dy_c, dz_c = direction
    n0 = ox_c.shape[0]
    roots = tuple(int(r) for r in roots)
    step = GROUPS * TILE
    n = -(-n0 // step) * step
    num_steps = n // step
    num_tiles = n // TILE
    act = active.astype(jnp.int32)
    if n != n0:
        pad = n - n0
        pad1 = jnp.ones((pad,), jnp.float32)
        ox_c = jnp.concatenate([ox_c, pad1])
        oy_c = jnp.concatenate([oy_c, pad1])
        oz_c = jnp.concatenate([oz_c, pad1])
        dx_c = jnp.concatenate([dx_c, pad1])
        dy_c = jnp.concatenate([dy_c, pad1])
        dz_c = jnp.concatenate([dz_c, pad1])
        t_init = jnp.concatenate([t_init, jnp.zeros((pad,), t_init.dtype)])
        act = jnp.concatenate([act, jnp.zeros((pad,), jnp.int32)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    inputs = [nodes, ltris]
    if opts.get("entries", "vector") == "smem":
        # entries mirror must be materialized OUTSIDE jit (host numpy);
        # callers pass it via opts-adjacent global to keep the jit
        # signature stable
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(
            jax.lax.bitcast_convert_type(nodes[:, 48:56], jnp.int32)
        )
    in_specs += [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 4 + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
    ]
    res = pl.pallas_call(
        functools.partial(_lab_kernel, roots=roots, opts=opts),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM(
                (
                    ROWS,
                    FRAME_STACK
                    if opts.get("ctrl") == "framestack"
                    else STACK,
                ),
                jnp.int32,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        *inputs,
        ox_c, oy_c, oz_c,
        dx_c, dy_c, dz_c,
        t_init, act,
    )
    t, hit, obj, depth, iters = res
    return t[:n0], hit[:n0], obj[:n0], depth[:n0], iters


def _lab_dual_kernel(*refs, roots, opts):
    """Dual-tile variant: TWO 1024-ray sub-tiles advance in ONE while
    loop (independent per-tile stacks and registers), so their load ->
    slab -> control chains interleave and hide each other's latency.
    Iterations = max of the pair (the wavefront sort keeps neighbors'
    liveness similar).  Always ilv slab/leaf + fixed push order."""
    (
        nodes_ref, ltris_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out, depth_out, iters_out,
        entry_ref, sptr_ref, stack_ref,
    ) = refs

    def load_tile(g):
        gs = slice(g * TILE, (g + 1) * TILE)
        shape = (ROWS, LANES)
        ox = ox_ref[gs].reshape(shape)
        oy = oy_ref[gs].reshape(shape)
        oz = oz_ref[gs].reshape(shape)
        dx = dx_ref[gs].reshape(shape)
        dy = dy_ref[gs].reshape(shape)
        dz = dz_ref[gs].reshape(shape)
        act = act_ref[gs].reshape(shape) != 0

        def inv_dir(d):
            return jnp.where(d == 0.0, BIG, 1.0 / d)

        return dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            ix=inv_dir(dx), iy=inv_dir(dy), iz=inv_dir(dz),
            act=act, t0=t0_ref[gs].reshape(shape),
        )

    def entry_phase(T, base, t, hit, obj, depth):
        """One stack entry per row for tile `T` with stacks at row
        offset `base`; returns (t, hit, obj, depth, alive)."""
        m = T["act"]
        ox, oy, oz = T["ox"], T["oy"], T["oz"]
        dx, dy, dz = T["dx"], T["dy"], T["dz"]
        ix, iy, iz = T["ix"], T["iy"], T["iz"]

        nrows, lrows = [], []
        entries = []
        for j in range(ROWS):
            e = entry_ref[base + j]
            entries.append(e)
            leaf = (e != DONE) & (e < 0)
            interior = (e != DONE) & (e >= 0)
            node = jnp.where(interior, e, 0)
            lrow = jnp.where(leaf, -e - 1, 0)
            nrows.append(nodes_ref[pl.ds(node, 1), :])
            lrows.append(ltris_ref[pl.ds(lrow, 1), :])
        nmat = jnp.concatenate(nrows, axis=0)
        lmat = jnp.concatenate(lrows, axis=0)
        imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
        evec = jnp.concatenate(
            [jnp.full((1, 1), entries[j], jnp.int32) for j in range(ROWS)],
            axis=0,
        )
        live_v = evec != DONE
        leaf_v = live_v & (evec < 0)
        int_v = live_v & (evec >= 0)

        R = range(WIDTH)
        tx1 = [(nmat[:, 6 * k + 0 : 6 * k + 1] - ox) * ix for k in R]
        ty1 = [(nmat[:, 6 * k + 1 : 6 * k + 2] - oy) * iy for k in R]
        tz1 = [(nmat[:, 6 * k + 2 : 6 * k + 3] - oz) * iz for k in R]
        tx2 = [(nmat[:, 6 * k + 3 : 6 * k + 4] - ox) * ix for k in R]
        ty2 = [(nmat[:, 6 * k + 4 : 6 * k + 5] - oy) * iy for k in R]
        tz2 = [(nmat[:, 6 * k + 5 : 6 * k + 6] - oz) * iz for k in R]
        mnx = [jnp.minimum(tx1[k], tx2[k]) for k in R]
        mny = [jnp.minimum(ty1[k], ty2[k]) for k in R]
        mnz = [jnp.minimum(tz1[k], tz2[k]) for k in R]
        mxx = [jnp.maximum(tx1[k], tx2[k]) for k in R]
        mxy = [jnp.maximum(ty1[k], ty2[k]) for k in R]
        mxz = [jnp.maximum(tz1[k], tz2[k]) for k in R]
        tmin = [jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k]) for k in R]
        tmax = [jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k]) for k in R]
        valid = [imat[:, 48 + k : 49 + k] != SLIM_EMPTY for k in R]
        bm = [
            (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
            & m & int_v & valid[k]
            for k in R
        ]
        child_dmin = [
            jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1, keepdims=True)
            for k in R
        ]

        limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
        C = range(LEAF_TRIS)
        tm = [lmat[:, 16 * c : 16 * c + 12] for c in C]
        hx = [dy * tm[c][:, 8:9] - dz * tm[c][:, 7:8] for c in C]
        hy = [dz * tm[c][:, 6:7] - dx * tm[c][:, 8:9] for c in C]
        hz = [dx * tm[c][:, 7:8] - dy * tm[c][:, 6:7] for c in C]
        a = [
            tm[c][:, 3:4] * hx[c] + tm[c][:, 4:5] * hy[c] + tm[c][:, 5:6] * hz[c]
            for c in C
        ]
        det_ok = [jnp.abs(a[c]) >= TRI_DET_EPS for c in C]
        f = [1.0 / jnp.where(det_ok[c], a[c], 1.0) for c in C]
        sx = [ox - tm[c][:, 0:1] for c in C]
        sy = [oy - tm[c][:, 1:2] for c in C]
        sz = [oz - tm[c][:, 2:3] for c in C]
        u = [f[c] * (sx[c] * hx[c] + sy[c] * hy[c] + sz[c] * hz[c]) for c in C]
        qx = [sy[c] * tm[c][:, 5:6] - sz[c] * tm[c][:, 4:5] for c in C]
        qy = [sz[c] * tm[c][:, 3:4] - sx[c] * tm[c][:, 5:6] for c in C]
        qz = [sx[c] * tm[c][:, 4:5] - sy[c] * tm[c][:, 3:4] for c in C]
        vv = [f[c] * (dx * qx[c] + dy * qy[c] + dz * qz[c]) for c in C]
        tt = [
            f[c] * (
                tm[c][:, 6:7] * qx[c] + tm[c][:, 7:8] * qy[c]
                + tm[c][:, 8:9] * qz[c]
            )
            for c in C
        ]
        for c in C:
            ok = (
                det_ok[c] & (u[c] >= 0.0) & (u[c] <= 1.0) & (vv[c] >= 0.0)
                & ((u[c] + vv[c]) <= 1.0) & (tt[c] > 0.0) & (tt[c] < t)
                & m & leaf_v
            )
            t = jnp.where(ok, tt[c], t)
            hit = jnp.where(ok, limat[:, 16 * c + 13 : 16 * c + 14], hit)
            obj = jnp.where(ok, limat[:, 16 * c + 12 : 16 * c + 13], obj)

        alive = jnp.int32(0)
        for j in range(ROWS):
            e = entries[j]
            live = e != DONE
            interior = live & (e >= 0)
            sp = sptr_ref[base + j]
            ds_ = [child_dmin[k][j, 0] for k in range(WIDTH)]
            es_ = [imat[j, 48 + k] for k in range(WIDTH)]
            for k in range(WIDTH):
                push = jnp.isfinite(ds_[k]) & interior
                slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                prev = stack_ref[base + j, slot]
                stack_ref[base + j, slot] = jnp.where(push, es_[k], prev)
                sp = sp + jnp.where(push, 1, 0)
            can = live & (sp > 0)
            top = stack_ref[base + j, jnp.maximum(sp - 1, 0)]
            nxt = jnp.where(can, top, DONE)
            sptr_ref[base + j] = jnp.where(can, sp - 1, sp)
            entry_ref[base + j] = nxt
            alive = alive + jnp.where(nxt != DONE, 1, 0)
        return t, hit, obj, depth, alive

    shape = (ROWS, LANES)
    for pair in range(GROUPS // 2):
        ga, gb = 2 * pair, 2 * pair + 1
        gsa = slice(ga * TILE, (ga + 1) * TILE)
        gsb = slice(gb * TILE, (gb + 1) * TILE)
        iters_out[pl.program_id(0) * (GROUPS // 2) + pair] = 0
        any_act = jnp.sum(act_ref[gsa]) + jnp.sum(act_ref[gsb]) > 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gsa=gsa, gsb=gsb):
            for gs in (gsa, gsb):
                t_out[gs] = t0_ref[gs]
                hit_out[gs] = jnp.full((TILE,), -1, jnp.int32)
                obj_out[gs] = jnp.full((TILE,), -1, jnp.int32)
                depth_out[gs] = jnp.zeros((TILE,), jnp.int32)

        @pl.when(any_act)
        def _live(ga=ga, gb=gb, gsa=gsa, gsb=gsb):
            A = load_tile(ga)
            B = load_tile(gb)
            for half, _ in enumerate((A, B)):
                for j in range(ROWS):
                    entry_ref[half * ROWS + j] = roots[0]
                    sptr_ref[half * ROWS + j] = len(roots) - 1
                    for i, r in enumerate(roots[1:]):
                        stack_ref[half * ROWS + j, i] = r

            def body(carry):
                ta, ha, oa, tb, hb, ob, it, _ = carry
                za = jnp.zeros(shape, jnp.int32)
                ta, ha, oa, _, alive_a = entry_phase(A, 0, ta, ha, oa, za)
                tb, hb, ob, _, alive_b = entry_phase(B, ROWS, tb, hb, ob, za)
                return ta, ha, oa, tb, hb, ob, it + 1, alive_a + alive_b

            init = (
                A["t0"], jnp.full(shape, -1, jnp.int32), jnp.full(shape, -1, jnp.int32),
                B["t0"], jnp.full(shape, -1, jnp.int32), jnp.full(shape, -1, jnp.int32),
                jnp.int32(0), jnp.int32(1),
            )
            out = jax.lax.while_loop(lambda c: c[-1] > 0, body, init)
            ta, ha, oa, tb, hb, ob = out[:6]
            t_out[gsa] = ta.reshape(-1)
            hit_out[gsa] = ha.reshape(-1)
            obj_out[gsa] = oa.reshape(-1)
            depth_out[gsa] = jnp.zeros((TILE,), jnp.int32)
            t_out[gsb] = tb.reshape(-1)
            hit_out[gsb] = hb.reshape(-1)
            obj_out[gsb] = ob.reshape(-1)
            depth_out[gsb] = jnp.zeros((TILE,), jnp.int32)
            iters_out[pl.program_id(0) * (GROUPS // 2) + pair] = out[-2]


@functools.partial(jax.jit, static_argnames=("roots",))
def traverse_lab_dual(origin, direction, t_init, nodes, ltris, roots, *, active):
    ox_c, oy_c, oz_c = origin
    dx_c, dy_c, dz_c = direction
    n0 = ox_c.shape[0]
    roots = tuple(int(r) for r in roots)
    step = GROUPS * TILE
    n = -(-n0 // step) * step
    num_steps = n // step
    num_pairs = n // (2 * TILE)
    act = active.astype(jnp.int32)
    if n != n0:
        pad = n - n0
        pad1 = jnp.ones((pad,), jnp.float32)
        ox_c = jnp.concatenate([ox_c, pad1])
        oy_c = jnp.concatenate([oy_c, pad1])
        oz_c = jnp.concatenate([oz_c, pad1])
        dx_c = jnp.concatenate([dx_c, pad1])
        dy_c = jnp.concatenate([dy_c, pad1])
        dz_c = jnp.concatenate([dz_c, pad1])
        t_init = jnp.concatenate([t_init, jnp.zeros((pad,), t_init.dtype)])
        act = jnp.concatenate([act, jnp.zeros((pad,), jnp.int32)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)] * 8
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 4 + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((num_pairs,), jnp.int32),
    ]
    res = pl.pallas_call(
        functools.partial(_lab_dual_kernel, roots=roots, opts={}),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((2 * ROWS,), jnp.int32),
            pltpu.SMEM((2 * ROWS,), jnp.int32),
            pltpu.SMEM((2 * ROWS, STACK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(nodes, ltris, ox_c, oy_c, oz_c, dx_c, dy_c, dz_c, t_init, act)
    t, hit, obj, depth, iters = res
    return t[:n0], hit[:n0], obj[:n0], depth[:n0], iters
