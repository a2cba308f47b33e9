"""Second-generation packet-kernel lab: framestack + fused-table decode
(the round-3 candidates) plus a GATED LEAF PHASE experiment.

The production kernels run the 8-record leaf intersection phase (~300 ns
of VPU work, tools/floor_probe.py) on EVERY iteration, masked by leaf_v.
Once the frame-stack control scheme shrinks the scalar critical path,
that unconditional vector work becomes co-critical.  This lab moves the
(t, hit, obj) hit state into VMEM scratch so the leaf phase can sit
under `pl.when(any_leaf)` and be SKIPPED on iterations where no row
popped a leaf entry.  The slab phase stays unconditional: its outputs
(child dmin mask) feed the scalar control and would have to round-trip
SMEM to cross a pl.when boundary, which costs more than it saves.

Static opts (all combinations hit-exact vs the production kernel):
  frame_stack  -- 9-slot frame stack control (vs linear fixed-order)
  fused        -- unified node|leaf table (vs two tables); requires the
                  caller to pass fuse_tables() output + nn
  gate_leaf    -- leaf phase under pl.when(any_leaf)

Self-check (interpret mode, tiny scene):  python tools/kernel_lab2.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY
from cpugpupathtracing_tpu.ops.traverse_packet_slim import _ctz8

TILE = 1024
# LAB2_GROUPS sweeps the 1024-ray sub-tiles per grid step: more groups
# amortize the ~13 us/step operand staging over more traversal work
GROUPS = int(os.environ.get("LAB2_GROUPS", "4"))
ROWS = 8
LANES = 128
WIDTH = 8
LEAF_TRIS = 8
STACK = 64
FSTACK = 9 * 24
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF
BIG = 1e30


def _lab2_kernel(*refs, roots, nn, frame_stack, fused, gate_leaf,
                 cond_push=False):
    (
        nodes_ref, ltris_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out, iters_out, leafs_out,
        entry_ref, sptr_ref, stack_ref, t_s, hit_s, obj_s,
    ) = refs
    pid = pl.program_id(0)

    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        any_act = jnp.sum(act_ref[gs]) > 0
        iters_out[pid * GROUPS + g] = 0
        leafs_out[pid * GROUPS + g] = 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gs=gs):
            t_out[gs] = t0_ref[gs]
            hit_out[gs] = jnp.full((TILE,), -1, jnp.int32)
            obj_out[gs] = jnp.full((TILE,), -1, jnp.int32)

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

            t_s[...] = t0_ref[gs].reshape(shape)
            hit_s[...] = jnp.full(shape, -1, jnp.int32)
            obj_s[...] = jnp.full(shape, -1, jnp.int32)

            for j in range(ROWS):
                entry_ref[j] = roots[0]
                if frame_stack:
                    nroots = len(roots) - 1
                    nf = 0
                    pos = 0
                    while pos < nroots:
                        cnt = min(8, nroots - pos)
                        for i in range(cnt):
                            stack_ref[j, 9 * nf + i] = roots[1 + pos + i]
                        stack_ref[j, 9 * nf + 8] = (1 << cnt) - 1
                        nf += 1
                        pos += cnt
                    sptr_ref[j] = 9 * nf
                else:
                    sptr_ref[j] = len(roots) - 1
                    for i, r in enumerate(roots[1:]):
                        stack_ref[j, i] = r

            def step_fn(it, nl):
                m = act0
                t = t_s[...]

                # ---- decode + loads ----
                entries, leaf_s, int_s = [], [], []
                if fused:
                    urows = []
                    for j in range(ROWS):
                        e = entry_ref[j]
                        entries.append(e)
                        live = e != DONE
                        leaf_s.append(live & (e >= nn))
                        int_s.append(live & (e < nn))
                        urows.append(nodes_ref[pl.ds(jnp.where(live, e, 0), 1), :])
                    lmat = jnp.concatenate(urows, axis=0)
                    nmat = lmat[:, :64]
                else:
                    nrows, lrows = [], []
                    for j in range(ROWS):
                        e = entry_ref[j]
                        entries.append(e)
                        live = e != DONE
                        leaf = live & (e < 0)
                        interior = live & (e >= 0)
                        leaf_s.append(leaf)
                        int_s.append(interior)
                        nrows.append(nodes_ref[pl.ds(jnp.where(interior, e, 0), 1), :])
                        lrows.append(ltris_ref[pl.ds(jnp.where(leaf, -e - 1, 0), 1), :])
                    nmat = jnp.concatenate(nrows, axis=0)
                    lmat = jnp.concatenate(lrows, axis=0)
                imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
                evec = jnp.concatenate(
                    [jnp.full((1, 1), entries[j], jnp.int32) for j in range(ROWS)],
                    axis=0,
                )
                live_v = evec != DONE
                if fused:
                    leaf_v = live_v & (evec >= nn)
                    int_v = live_v & (evec < nn)
                else:
                    leaf_v = live_v & (evec < 0)
                    int_v = live_v & (evec >= 0)

                # ---- slab (unconditional, op-stage-major) ----
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
                    jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                            keepdims=True)
                    for k in R
                ]

                # ---- leaf (gated or unconditional) ----
                def leaf_phase():
                    t = t_s[...]
                    hit = hit_s[...]
                    obj = obj_s[...]
                    limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
                    for c in range(LEAF_TRIS):
                        tm = lmat[:, 16 * c : 16 * c + 12]
                        hx = dy * tm[:, 8:9] - dz * tm[:, 7:8]
                        hy = dz * tm[:, 6:7] - dx * tm[:, 8:9]
                        hz = dx * tm[:, 7:8] - dy * tm[:, 6:7]
                        a = tm[:, 3:4] * hx + tm[:, 4:5] * hy + tm[:, 5:6] * hz
                        det_ok = jnp.abs(a) >= TRI_DET_EPS
                        f = 1.0 / jnp.where(det_ok, a, 1.0)
                        sx = ox - tm[:, 0:1]
                        sy = oy - tm[:, 1:2]
                        sz = oz - tm[:, 2:3]
                        u = f * (sx * hx + sy * hy + sz * hz)
                        qx = sy * tm[:, 5:6] - sz * tm[:, 4:5]
                        qy = sz * tm[:, 3:4] - sx * tm[:, 5:6]
                        qz = sx * tm[:, 4:5] - sy * tm[:, 3:4]
                        vv = f * (dx * qx + dy * qy + dz * qz)
                        tt = f * (tm[:, 6:7] * qx + tm[:, 7:8] * qy
                                  + tm[:, 8:9] * qz)
                        ok = (
                            det_ok & (u >= 0.0) & (u <= 1.0) & (vv >= 0.0)
                            & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t)
                            & m & leaf_v
                        )
                        t = jnp.where(ok, tt, t)
                        hit = jnp.where(ok, limat[:, 16 * c + 13 : 16 * c + 14],
                                        hit)
                        obj = jnp.where(ok, limat[:, 16 * c + 12 : 16 * c + 13],
                                        obj)
                    t_s[...] = t
                    hit_s[...] = hit
                    obj_s[...] = obj

                any_leaf = leaf_s[0]
                for j in range(1, ROWS):
                    any_leaf = any_leaf | leaf_s[j]
                if gate_leaf:
                    pl.when(any_leaf)(leaf_phase)
                else:
                    leaf_phase()

                # ---- control ----
                if frame_stack:
                    fs_d = jnp.concatenate(child_dmin, axis=1)
                    fs_fin = jnp.isfinite(fs_d)
                    fs_mask = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(WIDTH):
                        fs_mask = fs_mask | (
                            fs_fin[:, k : k + 1].astype(jnp.int32) << k
                        )

                alive = jnp.int32(0)
                for j in range(ROWS):
                    e = entries[j]
                    live = e != DONE
                    interior = int_s[j]
                    sp = sptr_ref[j]
                    es_ = [imat[j, 48 + k] for k in range(WIDTH)]

                    if frame_stack:
                        w = fs_mask[j, 0]
                        base_p = jnp.minimum(sp, FSTACK - 9)
                        if cond_push:
                            # gate the 9 frame stores on the scalar pass
                            # mask: leaf/dead-row iterations (w == 0,
                            # ~60% of a bounce-fan frame) skip them
                            # entirely.  Exact: un-pushed frames sit
                            # above the live top and are never observed.
                            @pl.when(w != 0)
                            def _push(j=j, base_p=base_p, w=w, es_=es_):
                                for k in range(WIDTH):
                                    stack_ref[j, base_p + k] = es_[k]
                                stack_ref[j, base_p + 8] = w
                        else:
                            for k in range(WIDTH):
                                stack_ref[j, base_p + k] = es_[k]
                            stack_ref[j, base_p + 8] = w
                        sp = sp + jnp.where(w != 0, 9, 0)
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

                    ds_ = [child_dmin[k][j, 0] for k in range(WIDTH)]
                    for k in range(WIDTH):
                        push = jnp.isfinite(ds_[k]) & interior
                        slot = jnp.where(push, jnp.minimum(sp, STACK - 1),
                                         STACK - 1)
                        prev = stack_ref[j, slot]
                        stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                        sp = sp + jnp.where(push, 1, 0)
                    can = live & (sp > 0)
                    top = stack_ref[j, jnp.maximum(sp - 1, 0)]
                    nxt = jnp.where(can, top, DONE)
                    sptr_ref[j] = jnp.where(can, sp - 1, sp)
                    entry_ref[j] = nxt
                    alive = alive + jnp.where(nxt != DONE, 1, 0)
                return it + 1, nl + jnp.where(any_leaf, 1, 0), alive

            def body(carry):
                it, nl, _ = carry
                return step_fn(it, nl)

            out = jax.lax.while_loop(lambda c: c[-1] > 0, body,
                                     (jnp.int32(0), jnp.int32(0), jnp.int32(1)))
            t_out[gs] = t_s[...].reshape(-1)
            hit_out[gs] = hit_s[...].reshape(-1)
            obj_out[gs] = obj_s[...].reshape(-1)
            iters_out[pid * GROUPS + g] = out[0]
            leafs_out[pid * GROUPS + g] = out[1]


@functools.partial(
    jax.jit,
    static_argnames=("roots", "nn", "frame_stack", "fused", "gate_leaf",
                     "cond_push"),
)
def traverse_lab2(origin, direction, t_init, nodes, ltris, roots, *, active,
                  nn=0, frame_stack=False, fused=False, gate_leaf=False,
                  cond_push=False):
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

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 3 + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
    ]
    res = pl.pallas_call(
        functools.partial(
            _lab2_kernel, roots=roots, nn=nn, frame_stack=frame_stack,
            fused=fused, gate_leaf=gate_leaf, cond_push=cond_push,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS, FSTACK if frame_stack else STACK), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(nodes, ltris, ox_c, oy_c, oz_c, dx_c, dy_c, dz_c, t_init, act)
    t, hit, obj, iters, leafs = res
    return t[:n0], hit[:n0], obj[:n0], iters, leafs


def _lab2p_kernel(*refs, roots, nn, frame_stack, fused, nearest=False,
                  parent=False):
    """SOFTWARE-PIPELINED body: each iteration (1) pops the NEXT entry
    and issues its row load, (2) runs slab+leaf on the CURRENT entry
    from the row matrix carried since last iteration, (3) pushes the
    current entry's children.  The scalar pop + dynamic-load issue in
    (1) have no data dependency on (2), so they overlap the VPU work
    instead of serializing ahead of it -- the pop->load->slab->push
    chain measured as the per-iteration floor splits into two parallel
    halves.  A row whose pop precedes a same-iteration push runs one
    bubble iteration (slab no-op) before draining the new frame; hits
    stay exact for any visit order.  Requires fused tables.

    parent=True (requires frame_stack): PARENT-POINTER FRAMES -- a
    frame is 2 SMEM ints [parent row index, pass mask] instead of
    [8 child entries, pass mask].  The push loop (the per-iteration
    attribution's prime suspect, ~9 scalar stores/row) shrinks to 2
    stores; the pop re-reads the popped child's entry from the
    IMMUTABLE node table (one extra dynamic row load on the vector
    unit + an 8-way extract chain, both overlapped by the pipelined
    structure).  Same masks, same pop order, bit-identical visit set.
    Root seeding uses negative sentinel parents resolved against the
    static roots tuple."""
    (
        nodes_ref, ltris_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out, iters_out, leafs_out,
        entry_ref, entry2_ref, sptr_ref, stack_ref, t_s, hit_s, obj_s,
    ) = refs
    assert fused, "pipelined lab kernel requires fused tables"
    assert not parent or frame_stack, "parent frames require the frame stack"
    pid = pl.program_id(0)

    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        any_act = jnp.sum(act_ref[gs]) > 0
        iters_out[pid * GROUPS + g] = 0
        leafs_out[pid * GROUPS + g] = 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gs=gs):
            t_out[gs] = t0_ref[gs]
            hit_out[gs] = jnp.full((TILE,), -1, jnp.int32)
            obj_out[gs] = jnp.full((TILE,), -1, jnp.int32)

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

            t_s[...] = t0_ref[gs].reshape(shape)
            hit_s[...] = jnp.full(shape, -1, jnp.int32)
            obj_s[...] = jnp.full(shape, -1, jnp.int32)

            for j in range(ROWS):
                entry_ref[j] = roots[0]
                if frame_stack and parent:
                    # seed frames: parent = -(group+1), resolved against
                    # the static roots tuple at pop time
                    nroots = len(roots) - 1
                    nf = 0
                    pos = 0
                    while pos < nroots:
                        cnt = min(8, nroots - pos)
                        stack_ref[j, 2 * nf + 0] = -(nf + 1)
                        stack_ref[j, 2 * nf + 1] = (1 << cnt) - 1
                        nf += 1
                        pos += cnt
                    sptr_ref[j] = 2 * nf
                elif frame_stack:
                    nroots = len(roots) - 1
                    nf = 0
                    pos = 0
                    while pos < nroots:
                        cnt = min(8, nroots - pos)
                        for i in range(cnt):
                            stack_ref[j, 9 * nf + i] = roots[1 + pos + i]
                        stack_ref[j, 9 * nf + 8] = (1 << cnt) - 1
                        nf += 1
                        pos += cnt
                    sptr_ref[j] = 9 * nf
                else:
                    sptr_ref[j] = len(roots) - 1
                    for i, r in enumerate(roots[1:]):
                        stack_ref[j, i] = r
            # prologue: the first current entry is the (static) primary
            # root; its row matrix loads once before the loop
            lmat0 = jnp.concatenate(
                [nodes_ref[pl.ds(roots[0], 1), :]] * ROWS, axis=0
            )

            def body(carry):
                lmat, it, nl, _ = carry
                m = act0
                t = t_s[...]

                # ---- (1) scalar: pop NEXT + issue its loads ----
                entries, leaf_s, int_s = [], [], []
                urows = []
                nexts = []
                for j in range(ROWS):
                    e = entry_ref[j]
                    entries.append(e)
                    live = e != DONE
                    leaf_s.append(live & (e >= nn))
                    int_s.append(live & (e < nn))
                    sp = sptr_ref[j]
                    can = sp > 0
                    if frame_stack and parent:
                        base = jnp.maximum(sp - 2, 0)
                        mw = stack_ref[j, base + 1]
                        if nearest:
                            bk = jax.lax.shift_right_logical(mw, 8) & 7
                            bkbit = jax.lax.shift_left(jnp.int32(1), bk)
                            use_bk = (mw & bkbit) != 0
                            kk = jnp.where(use_bk, bk, _ctz8(mw & 0xFF))
                        else:
                            kk = _ctz8(mw & 0xFF)
                        par = stack_ref[j, base + 0]
                        rem = mw & ~jax.lax.shift_left(jnp.int32(1), kk)
                        stack_ref[j, base + 1] = jnp.where(can, rem, mw)
                        sp2 = jnp.where(can & ((rem & 0xFF) == 0), base, sp)
                        # re-read the popped child's entry from the
                        # immutable node table (parent rows are always
                        # interior, always < nn)
                        pr = nodes_ref[
                            pl.ds(jnp.where(can & (par >= 0), par, 0), 1), :
                        ]
                        pim = jax.lax.bitcast_convert_type(pr, jnp.int32)
                        ent = pim[0, 48]
                        for k in range(1, WIDTH):
                            ent = jnp.where(kk == k, pim[0, 48 + k], ent)
                        if len(roots) > 1:
                            # seed frames hold static roots
                            ngrp = (len(roots) - 1 + 7) // 8
                            for gi in range(ngrp):
                                cnt = min(8, len(roots) - 1 - 8 * gi)
                                for k in range(cnt):
                                    sel = (par == -(gi + 1)) & (kk == k)
                                    ent = jnp.where(
                                        sel,
                                        jnp.int32(roots[1 + 8 * gi + k]),
                                        ent,
                                    )
                    elif frame_stack and nearest:
                        # frame word carries the argmin child in bits
                        # 8-10: pop it first, then ctz the rest
                        base = jnp.maximum(sp - 9, 0)
                        mw = stack_ref[j, base + 8]
                        bk = jax.lax.shift_right_logical(mw, 8) & 7
                        bkbit = jax.lax.shift_left(jnp.int32(1), bk)
                        use_bk = (mw & bkbit) != 0
                        kk = jnp.where(use_bk, bk, _ctz8(mw & 0xFF))
                        ent = stack_ref[j, base + kk]
                        rem = mw & ~jax.lax.shift_left(jnp.int32(1), kk)
                        stack_ref[j, base + 8] = jnp.where(can, rem, mw)
                        sp2 = jnp.where(can & ((rem & 0xFF) == 0), base, sp)
                    elif frame_stack:
                        base = jnp.maximum(sp - 9, 0)
                        mw = stack_ref[j, base + 8]
                        ent = stack_ref[j, base + _ctz8(mw)]
                        rem = mw & (mw - 1)
                        stack_ref[j, base + 8] = jnp.where(can, rem, mw)
                        sp2 = jnp.where(can & (rem == 0), base, sp)
                    else:
                        ent = stack_ref[j, jnp.maximum(sp - 1, 0)]
                        sp2 = jnp.where(can, sp - 1, sp)
                    nxt = jnp.where(can, ent, DONE)
                    entry2_ref[j] = nxt
                    sptr_ref[j] = sp2
                    nexts.append(nxt)
                    urows.append(
                        nodes_ref[pl.ds(jnp.where(nxt != DONE, nxt, 0), 1), :]
                    )
                lmat_next = jnp.concatenate(urows, axis=0)

                # ---- (2) vector: slab + leaf on CURRENT from carried lmat
                nmat = lmat[:, :64]
                imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
                evec = jnp.concatenate(
                    [jnp.full((1, 1), entries[j], jnp.int32) for j in range(ROWS)],
                    axis=0,
                )
                live_v = evec != DONE
                leaf_v = live_v & (evec >= nn)
                int_v = live_v & (evec < nn)

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
                fin = [
                    jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                            keepdims=True)
                    for k in R
                ]
                D = jnp.concatenate(fin, axis=1)
                fs_fin = jnp.isfinite(D)
                fs_mask = jnp.zeros((ROWS, 1), jnp.int32)
                for k in range(WIDTH):
                    fs_mask = fs_mask | (
                        fs_fin[:, k : k + 1].astype(jnp.int32) << k
                    )
                if nearest:
                    bd = D[:, 0:1]
                    bkv = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(1, WIDTH):
                        sw = D[:, k : k + 1] < bd
                        bd = jnp.where(sw, D[:, k : k + 1], bd)
                        bkv = jnp.where(sw, jnp.int32(k), bkv)
                    fs_mask = fs_mask | (bkv << 8)

                hit = hit_s[...]
                obj = obj_s[...]
                limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
                for c in range(LEAF_TRIS):
                    tm = lmat[:, 16 * c : 16 * c + 12]
                    hx = dy * tm[:, 8:9] - dz * tm[:, 7:8]
                    hy = dz * tm[:, 6:7] - dx * tm[:, 8:9]
                    hz = dx * tm[:, 7:8] - dy * tm[:, 6:7]
                    a = tm[:, 3:4] * hx + tm[:, 4:5] * hy + tm[:, 5:6] * hz
                    det_ok = jnp.abs(a) >= TRI_DET_EPS
                    f = 1.0 / jnp.where(det_ok, a, 1.0)
                    sx = ox - tm[:, 0:1]
                    sy = oy - tm[:, 1:2]
                    sz = oz - tm[:, 2:3]
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * tm[:, 5:6] - sz * tm[:, 4:5]
                    qy = sz * tm[:, 3:4] - sx * tm[:, 5:6]
                    qz = sx * tm[:, 4:5] - sy * tm[:, 3:4]
                    vv = f * (dx * qx + dy * qy + dz * qz)
                    tt = f * (tm[:, 6:7] * qx + tm[:, 7:8] * qy
                              + tm[:, 8:9] * qz)
                    ok = (
                        det_ok & (u >= 0.0) & (u <= 1.0) & (vv >= 0.0)
                        & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t)
                        & m & leaf_v
                    )
                    t = jnp.where(ok, tt, t)
                    hit = jnp.where(ok, limat[:, 16 * c + 13 : 16 * c + 14], hit)
                    obj = jnp.where(ok, limat[:, 16 * c + 12 : 16 * c + 13], obj)
                t_s[...] = t
                hit_s[...] = hit
                obj_s[...] = obj

                # ---- (3) scalar: push CURRENT's children; rotate ----
                any_leaf = leaf_s[0]
                for j in range(1, ROWS):
                    any_leaf = any_leaf | leaf_s[j]
                alive = jnp.int32(0)
                for j in range(ROWS):
                    sp = sptr_ref[j]
                    w = fs_mask[j, 0]
                    do_push = int_s[j] & ((w & 0xFF) != 0)
                    if frame_stack and parent:
                        # 2-slot frame: the current (interior) entry IS
                        # the parent of everything the mask names
                        base_p = jnp.minimum(sp, FSTACK - 2)
                        stack_ref[j, base_p + 0] = entries[j]
                        stack_ref[j, base_p + 1] = w
                        sp = sp + jnp.where(do_push, 2, 0)
                    elif frame_stack:
                        es_ = [imat[j, 48 + k] for k in range(WIDTH)]
                        base_p = jnp.minimum(sp, FSTACK - 9)
                        for k in range(WIDTH):
                            stack_ref[j, base_p + k] = es_[k]
                        stack_ref[j, base_p + 8] = w
                        sp = sp + jnp.where(do_push, 9, 0)
                    else:
                        es_ = [imat[j, 48 + k] for k in range(WIDTH)]
                        for k in range(WIDTH):
                            push = (
                                ((jax.lax.shift_right_logical(w, k) & 1) != 0)
                                & int_s[j]
                            )
                            slot = jnp.where(
                                push, jnp.minimum(sp, STACK - 1), STACK - 1
                            )
                            prev = stack_ref[j, slot]
                            stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                            sp = sp + jnp.where(push, 1, 0)
                    sptr_ref[j] = sp
                    entry_ref[j] = entry2_ref[j]
                    alive = alive + jnp.where(
                        (nexts[j] != DONE) | (sp > 0), 1, 0
                    )
                return (lmat_next, it + 1,
                        nl + jnp.where(any_leaf, 1, 0), alive)

            out = jax.lax.while_loop(
                lambda c: c[-1] > 0, body,
                (lmat0, jnp.int32(0), jnp.int32(0), jnp.int32(1)),
            )
            t_out[gs] = t_s[...].reshape(-1)
            hit_out[gs] = hit_s[...].reshape(-1)
            obj_out[gs] = obj_s[...].reshape(-1)
            iters_out[pid * GROUPS + g] = out[1]
            leafs_out[pid * GROUPS + g] = out[2]


@functools.partial(
    jax.jit,
    static_argnames=("roots", "nn", "frame_stack", "nearest", "parent"),
)
def traverse_lab2p(origin, direction, t_init, nodes, ltris, roots, *, active,
                   nn, frame_stack=True, nearest=False, parent=False):
    """Pipelined-body lab traversal (fused tables required)."""
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

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 3 + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
    ]
    res = pl.pallas_call(
        functools.partial(
            _lab2p_kernel, roots=roots, nn=nn, frame_stack=frame_stack,
            fused=True, nearest=nearest, parent=parent,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS, FSTACK if frame_stack else STACK), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(nodes, ltris, ox_c, oy_c, oz_c, dx_c, dy_c, dz_c, t_init, act)
    t, hit, obj, iters, leafs = res
    return t[:n0], hit[:n0], obj[:n0], iters, leafs


def _selfcheck():
    """Interpret-mode hit-exactness vs brute force on a tiny scene."""
    import numpy as np

    from cpugpupathtracing_tpu.config import BuildOption
    from cpugpupathtracing_tpu.models import bvh, bvh8, mesh
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX
    from tools.kernel_lab import fuse_tables

    m = mesh.icosphere(subdivisions=1)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    s = bvh8.to_slim(bvh8.collapse(b, leaf_max=8), b.tri_normal)
    un, nn = fuse_tables(s.nodes, s.ltris)

    rng = np.random.default_rng(3)
    n = 1024
    o = rng.normal(size=(n, 3)).astype(np.float32) * 4
    aim = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.ones((n,), jnp.int32)
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    oc = (o[:, 0], o[:, 1], o[:, 2])
    dc = (d[:, 0], d[:, 1], d[:, 2])
    dummy = jnp.zeros((1, 128), jnp.float32)
    for fs in (False, True):
        for fused in (False, True):
            for gl in (False, True):
                for cp in ((False, True) if fs else (False,)):
                    tn = jnp.asarray(un) if fused else jnp.asarray(s.nodes)
                    tl = dummy if fused else jnp.asarray(s.ltris)
                    t, hit, obj, _, _ = traverse_lab2(
                        oc, dc, t0, tn, tl, (0,), active=act,
                        nn=nn if fused else 0, frame_stack=fs, fused=fused,
                        gate_leaf=gl, cond_push=cp,
                    )
                    assert np.array_equal(np.asarray(hit), np.asarray(bidx)), (
                        fs, fused, gl, cp)
                    np.testing.assert_allclose(np.asarray(t), np.asarray(bt),
                                               rtol=1e-5)
                    print(f"fs={fs} fused={fused} gate_leaf={gl} cond_push={cp}"
                          ": hits OK", flush=True)

    for fs in (False, True):
        t, hit, obj, it, _ = traverse_lab2p(
            oc, dc, t0, jnp.asarray(un), dummy, (0,), active=act,
            nn=nn, frame_stack=fs,
        )
        assert np.array_equal(np.asarray(hit), np.asarray(bidx)), ("pipe", fs)
        np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
        print(f"pipelined fs={fs}: hits OK ({int(np.asarray(it).sum())} iters)",
              flush=True)
    t, hit, obj, it, _ = traverse_lab2p(
        oc, dc, t0, jnp.asarray(un), dummy, (0,), active=act,
        nn=nn, frame_stack=True, nearest=True,
    )
    assert np.array_equal(np.asarray(hit), np.asarray(bidx)), "pipe-nearest"
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
    print(f"pipelined fs nearest: hits OK ({int(np.asarray(it).sum())} iters)",
          flush=True)

    # parent-pointer frames: bit-identical visit set to the frame stack
    # (same masks, same pop order), so iters must MATCH exactly too
    ref_it = {}
    for near in (False, True):
        t, hit, obj, it, _ = traverse_lab2p(
            oc, dc, t0, jnp.asarray(un), dummy, (0,), active=act,
            nn=nn, frame_stack=True, nearest=near,
        )
        ref_it[near] = int(np.asarray(it).sum())
    for near in (False, True):
        t, hit, obj, it, _ = traverse_lab2p(
            oc, dc, t0, jnp.asarray(un), dummy, (0,), active=act,
            nn=nn, frame_stack=True, nearest=near, parent=True,
        )
        assert np.array_equal(np.asarray(hit), np.asarray(bidx)), (
            "parent", near)
        np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
        got_it = int(np.asarray(it).sum())
        assert got_it == ref_it[near], ("parent iters", near, got_it,
                                        ref_it[near])
        print(f"pipelined fs parent nearest={near}: hits OK "
              f"({got_it} iters, == frame stack)", flush=True)

    # multi-root seeding through the static-roots resolution: a second
    # sphere's table spliced after the first, both roots traversed
    m2 = mesh.icosphere(subdivisions=1)
    m2 = mesh.Mesh(m2.positions + np.array([2.5, 0, 0], np.float32),
                   m2.normals, m2.indices)
    b2 = bvh.build(m2.positions, m2.normals, m2.indices,
                   BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    s2 = bvh8.to_slim(bvh8.collapse(b2, leaf_max=8), b2.tri_normal)
    nodes_m = np.concatenate([s.nodes, s2.nodes.copy()])
    ci2 = nodes_m[len(s.nodes):, 48:56].view(np.int32)
    cc2 = nodes_m[len(s.nodes):, 56:64].view(np.int32)
    ci2[cc2 == 0] += len(s.nodes)
    ci2[cc2 > 0] -= len(s.ltris)
    lt2 = s2.ltris.copy()
    lt2.view(np.int32)[:, 13::16][lt2.view(np.int32)[:, 13::16] >= 0] += (
        b.num_triangles
    )
    ltris_m = np.concatenate([s.ltris, lt2])
    un2, nn2 = fuse_tables(nodes_m, ltris_m)
    v0m = np.concatenate([b.tri_v0, b2.tri_v0])
    e1m = np.concatenate([b.tri_v1 - b.tri_v0, b2.tri_v1 - b2.tri_v0])
    e2m = np.concatenate([b.tri_v2 - b.tri_v0, b2.tri_v2 - b2.tri_v0])
    bt2, bidx2 = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(v0m), jnp.asarray(e1m), jnp.asarray(e2m), t0,
    )
    for par in (False, True):
        t, hit, obj, it, _ = traverse_lab2p(
            oc, dc, t0, jnp.asarray(un2), dummy, (0, len(s.nodes)),
            active=act, nn=nn2, frame_stack=True, parent=par,
        )
        assert np.array_equal(np.asarray(hit), np.asarray(bidx2)), (
            "multiroot", par)
        np.testing.assert_allclose(np.asarray(t), np.asarray(bt2), rtol=1e-5)
        print(f"pipelined fs multiroot parent={par}: hits OK", flush=True)


if __name__ == "__main__":
    _selfcheck()
