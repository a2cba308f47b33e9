"""Third-generation packet-kernel lab: 16-WIDE NODES.

tools/width_model.py: a W=16 DP collapse costs 0.80x the W=8 one in
expected pops (the per-iteration currency of the packet kernel), and a
16-wide node row is EXACTLY one (B, 128) table row -- 16x(min,max).xyz
bounds in cols 0..95, 16 pre-encoded child entries in 96..111, 16
child counts in 112..127 -- i.e. the same 512-byte row a fused W=8
table already loads per decode.  The slab phase doubles (16 child
tests), but the round-3 attribution says the SCALAR control chain is
the critical path and the pipelined body overlaps vector work anyway,
so fewer iterations at equal-or-hidden vector cost should win.

This lab implements the W16 traversal standalone (fused single table,
17-slot frame-stack control with mask-gated conditional pushes,
closest-hit + any-hit, count_iters) plus the W16 table builder
(width-16 collapse_sah + slim leaf records, identical 8-triangle leaf
rows to production).  Hits must be brute-force exact; iteration counts
are comparable 1:1 with the production kernel's count_iters.

Self-check (interpret, tiny scene):  python tools/kernel_lab3.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY

TILE = 1024
GROUPS = int(os.environ.get("LAB3_GROUPS", "4"))
ROWS = 8
LANES = 128
WIDTH = 16
LEAF_TRIS = 8
FRAME = WIDTH + 1          # 16 entries + mask word
FSTACK = FRAME * 24
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF
BIG = 1e30


# ---------------------------------------------------------------- tables

def collapse16(b, leaf_max: int = 8):
    """Width-16 SAH-cost DP collapse (models/bvh8.py collapse_sah
    generalized); returns (nodes (B, 128) f32, ltris (NL, 128) f32)
    in FUSED encoding: child entries are direct unified-table row
    indices (interior -> node row, leaf -> B + leaf row), SLIM_EMPTY
    for unused slots.  Leaf records are identical to bvh8.to_slim
    (8 tris x 16 cols, obj column left 0, original tri ids)."""
    n_nodes = b.num_nodes
    lf = b.left_first.astype(np.int64)
    pc = b.prim_count.astype(np.int64)
    nmin, nmax = b.nodes_min, b.nodes_max
    is_leaf = pc > 0
    e = np.maximum(nmax - nmin, 0.0).astype(np.float64)
    sa = np.maximum(
        e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0], 1e-12
    )

    t_first = np.where(is_leaf, lf, 0)
    t_count = np.where(is_leaf, pc, 0)
    for n in range(n_nodes - 1, -1, -1):
        if not is_leaf[n]:
            l, r = int(lf[n]), int(lf[n]) + 1
            t_first[n] = min(t_first[l], t_first[r])
            t_count[n] = t_count[l] + t_count[r]

    W1 = WIDTH
    INF = np.inf
    C = np.full((n_nodes, W1), INF)
    choice = np.full((n_nodes, W1), -9, np.int16)
    for n in range(n_nodes - 1, -1, -1):
        if is_leaf[n]:
            C[n, :] = sa[n]
            choice[n, :] = -1
            continue
        l, r = int(lf[n]), int(lf[n]) + 1
        A = np.full(W1, INF)
        Aj = np.zeros(W1, np.int16)
        for i in range(2, W1 + 1):
            js = np.arange(1, i)
            v = C[l, js - 1] + C[r, i - js - 1]
            k = int(np.argmin(v))
            A[i - 1] = v[k]
            Aj[i - 1] = js[k]
        c_leaf = sa[n] if t_count[n] <= leaf_max else INF
        c_node = sa[n] + A[W1 - 1]
        if c_leaf <= c_node:
            C[n, 0], choice[n, 0] = c_leaf, -1
        else:
            C[n, 0], choice[n, 0] = c_node, -2
        for i in range(2, W1 + 1):
            if C[n, i - 2] <= A[i - 1]:
                C[n, i - 1] = C[n, i - 2]
                choice[n, i - 1] = -3
            else:
                C[n, i - 1] = A[i - 1]
                choice[n, i - 1] = Aj[i - 1]

    sys.setrecursionlimit(200000)

    def decompose(n, i):
        while i > 1 and choice[n, i - 1] == -3:
            i -= 1
        if i == 1:
            return [n]
        j = int(choice[n, i - 1])
        l, r = int(lf[n]), int(lf[n]) + 1
        return decompose(l, j) + decompose(r, i - j)

    rows: list[np.ndarray] = []
    # (row_idx, slots) plus deferred leaf emission
    leaf_order: list[np.ndarray] = []
    leaf_refs: list[tuple[int, int, int]] = []  # (row, slot, leaf_row)
    int_refs: list[tuple[int, int, int]] = []   # (row, slot, child_row)
    rows.append(np.zeros(128, np.float32))
    root_slots = [0] if is_leaf[0] else decompose(0, W1)
    stack = [(root_slots, 0)]
    max_depth = 0
    depth_of = {0: 0}
    while stack:
        slots, row_idx = stack.pop()
        d = depth_of[row_idx]
        max_depth = max(max_depth, d)
        bmin = np.full((WIDTH, 3), 1e30, np.float32)
        bmax = np.full((WIDTH, 3), -1e30, np.float32)
        cidx = np.full(WIDTH, SLIM_EMPTY, np.int32)
        ccnt = np.full(WIDTH, -1, np.int32)
        for k, s in enumerate(slots):
            bmin[k] = nmin[s]
            bmax[k] = nmax[s]
            if choice[s, 0] == -1:
                first, cnt = int(t_first[s]), int(t_count[s])
                seg = b.tri_indices[first : first + cnt]
                leaf_refs.append((row_idx, k, len(leaf_order)))
                leaf_order.append(seg)
                ccnt[k] = cnt
            else:
                child_row = len(rows)
                rows.append(np.zeros(128, np.float32))
                int_refs.append((row_idx, k, child_row))
                ccnt[k] = 0
                depth_of[child_row] = d + 1
                stack.append((decompose(s, W1), child_row))
        row = np.zeros(128, np.float32)
        row[0:96] = np.concatenate([bmin, bmax], axis=1).reshape(-1)
        row[96:112].view(np.int32)[:] = cidx
        row[112:128].view(np.int32)[:] = ccnt
        rows[row_idx] = row

    nodes = np.stack(rows)
    nn = len(nodes)
    civ = nodes[:, 96:112].view(np.int32)
    for r, k, cr in int_refs:
        civ[r, k] = cr
    for r, k, lr in leaf_refs:
        civ[r, k] = nn + lr  # fused encoding: leaf row lives after nodes

    nl = len(leaf_order)
    ltris = np.zeros((max(nl, 1), 128), np.float32)
    tid = ltris.view(np.int32)
    for lrow, seg in enumerate(leaf_order):
        for k in range(LEAF_TRIS):
            base = 16 * k
            if k < len(seg):
                t = int(seg[k])
                ltris[lrow, base : base + 3] = b.tri_v0[t]
                ltris[lrow, base + 3 : base + 6] = b.tri_v1[t] - b.tri_v0[t]
                ltris[lrow, base + 6 : base + 9] = b.tri_v2[t] - b.tri_v0[t]
                ltris[lrow, base + 9 : base + 12] = b.tri_normal[t]
                tid[lrow, base + 13] = t
            else:
                tid[lrow, base + 13] = -1
    return nodes, ltris, max_depth


# ---------------------------------------------------------------- kernel

def _ctz16(mw):
    low = mw & (-mw)
    return jnp.minimum(jax.lax.population_count(low - 1), jnp.int32(15))


def _lab3_kernel(*refs, roots, nn, any_hit, count_iters, interp,
                 nearest=False):
    if count_iters:
        # refs = 9 inputs (nodes + 8 ray ops), 3 outputs, [iters], scratch
        refs = list(refs)
        iters_out = refs.pop(12)
    (
        nodes_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out,
        entry_ref, sptr_ref, stack_ref,
    ) = refs

    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        any_act = jnp.sum(act_ref[gs]) > 0
        if count_iters:
            iters_out[(g if interp else pl.program_id(0) * GROUPS + g)] = 0

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

            ix, iy, iz = inv_dir(dx), inv_dir(dy), inv_dir(dz)
            t0 = t0_ref[gs].reshape(shape)

            for j in range(ROWS):
                entry_ref[j] = roots[0]
                nroots = len(roots) - 1
                nf = 0
                pos = 0
                while pos < nroots:
                    cnt = min(WIDTH, nroots - pos)
                    for i in range(cnt):
                        stack_ref[j, FRAME * nf + i] = roots[1 + pos + i]
                    stack_ref[j, FRAME * nf + WIDTH] = (1 << cnt) - 1
                    nf += 1
                    pos += cnt
                sptr_ref[j] = FRAME * nf

            def body(carry):
                t, hit, obj = carry[:3]
                m = act0
                if any_hit:
                    m = m & (hit < 0)
                    row_live_v = jnp.max(m.astype(jnp.int32), axis=1,
                                         keepdims=True)

                # ---- decode: ONE dynamic row load per sub-packet ----
                leaf_s, int_s, urows = [], [], []
                for j in range(ROWS):
                    e = entry_ref[j]
                    live = e != DONE
                    if any_hit:
                        live = live & (row_live_v[j, 0] != 0)
                    leaf_s.append(live & (e >= nn))
                    int_s.append(live & (e < nn))
                    urows.append(nodes_ref[pl.ds(jnp.where(live, e, 0), 1), :])
                lmat = jnp.concatenate(urows, axis=0)       # (8, 128)
                nmat = lmat[:, :96]
                imat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
                leaf_v = jnp.concatenate(
                    [jnp.full((1, 1), leaf_s[j], jnp.int32)
                     for j in range(ROWS)], axis=0) != 0
                int_v = jnp.concatenate(
                    [jnp.full((1, 1), int_s[j], jnp.int32)
                     for j in range(ROWS)], axis=0) != 0

                # ---- slab: 16 child tests, op-stage-major ----
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
                tmin = [jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k])
                        for k in R]
                tmax = [jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k])
                        for k in R]
                valid = [imat[:, 96 + k : 97 + k] != SLIM_EMPTY for k in R]
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
                fs_d = jnp.concatenate(fin, axis=1)          # (8, 16)
                fs_fin = jnp.isfinite(fs_d)
                fs_mask = jnp.zeros((ROWS, 1), jnp.int32)
                for k in R:
                    fs_mask = fs_mask | (
                        fs_fin[:, k : k + 1].astype(jnp.int32) << k)
                if nearest:
                    # argmin child rides bits 16-19 of the frame word
                    # and pops first (cf. CPUGPU_NEAREST on the W8 path)
                    bd = fs_d[:, 0:1]
                    bkv = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(1, WIDTH):
                        sw = fs_d[:, k : k + 1] < bd
                        bd = jnp.where(sw, fs_d[:, k : k + 1], bd)
                        bkv = jnp.where(sw, jnp.int32(k), bkv)
                    fs_mask = fs_mask | (bkv << WIDTH)

                # ---- leaf phase (identical record format to W8) ----
                limat = imat
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

                # ---- control: 17-slot frames, gated push, ctz16 pop ----
                alive = jnp.int32(0)
                for j in range(ROWS):
                    live = entry_ref[j] != DONE
                    if any_hit:
                        live = live & (row_live_v[j, 0] != 0)
                    sp = sptr_ref[j]
                    w = fs_mask[j, 0]
                    base_p = jnp.minimum(sp, FSTACK - FRAME)
                    pushc = int_s[j] & (w != 0)

                    @pl.when(pushc)
                    def _push(j=j, base_p=base_p, w=w, imat=imat):
                        for k in range(WIDTH):
                            stack_ref[j, base_p + k] = imat[j, 96 + k]
                        stack_ref[j, base_p + WIDTH] = w

                    sp = sp + jnp.where(pushc, FRAME, 0)
                    can = live & (sp > 0)
                    base = jnp.maximum(sp - FRAME, 0)
                    mw = stack_ref[j, base + WIDTH]
                    if nearest:
                        bk = jax.lax.shift_right_logical(mw, WIDTH) & 15
                        bkbit = jax.lax.shift_left(jnp.int32(1), bk)
                        use_bk = (mw & bkbit) != 0
                        kk = jnp.where(
                            use_bk, bk, _ctz16(mw & ((1 << WIDTH) - 1)))
                        rem = mw & ~jax.lax.shift_left(jnp.int32(1), kk)
                    else:
                        kk = _ctz16(mw)
                        rem = mw & (mw - 1)
                    ent = stack_ref[j, base + kk]
                    stack_ref[j, base + WIDTH] = jnp.where(can, rem, mw)
                    sp = jnp.where(
                        can & ((rem & ((1 << WIDTH) - 1)) == 0), base, sp)
                    nxt = jnp.where(can, ent, DONE)
                    sptr_ref[j] = sp
                    entry_ref[j] = nxt
                    alive = alive + jnp.where(nxt != DONE, 1, 0)
                out = (t, hit, obj)
                if count_iters:
                    return out + (carry[-2] + 1, alive)
                return out + (alive,)

            init = [
                t0,
                jnp.full(shape, -1, jnp.int32),
                jnp.full(shape, -1, jnp.int32),
            ]
            if count_iters:
                init.append(jnp.int32(0))
            init.append(jnp.int32(1))
            out = jax.lax.while_loop(lambda c: c[-1] > 0, body, tuple(init))
            t_out[gs] = out[0].reshape(-1)
            hit_out[gs] = out[1].reshape(-1)
            obj_out[gs] = out[2].reshape(-1)
            if count_iters:
                iters_out[
                    (g if interp else pl.program_id(0) * GROUPS + g)
                ] = out[-2]


@functools.partial(
    jax.jit,
    static_argnames=("roots", "nn", "any_hit", "count_iters", "interpret",
                     "nearest"),
)
def traverse16(origin, direction, t_init, nodes, roots, *, active, nn,
               any_hit=False, count_iters=False, interpret=None,
               nearest=False):
    """16-wide fused-table traversal; component-tuple rays like the
    production kernel.  Returns (t, tri, obj [, per-sub-tile iters])."""
    ox_c, oy_c, oz_c = origin
    dx_c, dy_c, dz_c = direction
    n0 = ox_c.shape[0]
    roots = tuple(int(r) for r in roots)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 3
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
    ]
    if count_iters:
        if interpret:
            out_specs.append(pl.BlockSpec(
                (GROUPS,), lambda i: (i,), memory_space=pltpu.SMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((num_tiles,), jnp.int32))
    res = pl.pallas_call(
        functools.partial(
            _lab3_kernel, roots=roots, nn=nn, any_hit=any_hit,
            count_iters=count_iters, interp=interpret, nearest=nearest,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS, FSTACK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes, ox_c, oy_c, oz_c, dx_c, dy_c, dz_c, t_init, act)
    if count_iters:
        return res[0][:n0], res[1][:n0], res[2][:n0], res[3]
    return res[0][:n0], res[1][:n0], res[2][:n0]


def scene_tables16(dev_objects):
    """Concatenate per-object W16 tables into one fused table + roots,
    mirroring the production multi-root scheme.  dev_objects: list of
    (binary BVH, object index).  Returns (fused (B+NL, 128) f32 jnp,
    nn, roots tuple) with object indices stamped in leaf records."""
    nodes_l, ltris_l = [], []
    roots = []
    node_off = 0
    metas = []
    for b, oi in dev_objects:
        nodes, ltris, _d = collapse16(b)
        metas.append((nodes, ltris, oi))
    total_nodes = sum(len(n) for n, _, _ in metas)
    leaf_off = 0
    for nodes, ltris, oi in metas:
        nd = nodes.copy()
        civ = nd[:, 96:112].view(np.int32)
        nn_i = len(nodes)
        is_leaf_e = civ >= nn_i
        is_int_e = (civ >= 0) & (civ < nn_i) & (civ != SLIM_EMPTY)
        sel_empty = civ == SLIM_EMPTY
        civ[is_leaf_e & ~sel_empty] += total_nodes - nn_i + leaf_off
        civ[is_int_e] += node_off
        lt = ltris.copy()
        ltv = lt.view(np.int32)
        for k in range(LEAF_TRIS):
            ltv[:, 16 * k + 12] = oi
        nodes_l.append(nd)
        ltris_l.append(lt)
        roots.append(node_off)
        node_off += nn_i
        leaf_off += len(ltris)
    fused = np.concatenate(nodes_l + ltris_l, axis=0)
    return jnp.asarray(fused), total_nodes, tuple(roots)


# ------------------------------------------------------------- selfcheck

def _selfcheck():
    from cpugpupathtracing_tpu.config import BuildOption
    from cpugpupathtracing_tpu.models import bvh, mesh
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    m = mesh.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    fused, nn, roots = scene_tables16([(b, 0)])
    print(f"W16 tables: {nn} node rows, {fused.shape[0] - nn} leaf rows",
          flush=True)

    rng = np.random.default_rng(3)
    n = 4096
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
    t, tri, obj, iters = traverse16(
        oc, dc, t0, fused, roots, active=act, nn=nn, count_iters=True,
    )
    assert np.array_equal(np.asarray(tri), np.asarray(bidx))
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
    print(f"closest-hit: hits OK ({int(np.asarray(iters).sum())} iters)",
          flush=True)
    tn_, trin, objn, itn = traverse16(
        oc, dc, t0, fused, roots, active=act, nn=nn, count_iters=True,
        nearest=True,
    )
    assert np.array_equal(np.asarray(trin), np.asarray(bidx))
    np.testing.assert_allclose(np.asarray(tn_), np.asarray(bt), rtol=1e-5)
    print(f"nearest: hits OK ({int(np.asarray(itn).sum())} iters)",
          flush=True)
    ta, tria, obja, itersa = traverse16(
        oc, dc, t0, fused, roots, active=act, nn=nn, any_hit=True,
        count_iters=True,
    )
    assert np.array_equal(np.asarray(tria) >= 0, np.asarray(bidx) >= 0)
    print(f"any-hit: occlusion OK ({int(np.asarray(itersa).sum())} iters)",
          flush=True)

    # multi-root: two spheres
    m2 = mesh.icosphere(center=(2.5, 0.0, 0.0), subdivisions=2)
    b2 = bvh.build(m2.positions, m2.normals, m2.indices,
                   BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    fused2, nn2, roots2 = scene_tables16([(b, 0), (b2, 1)])
    v0 = np.concatenate([b.tri_v0, b2.tri_v0])
    e1 = np.concatenate([b.tri_v1 - b.tri_v0, b2.tri_v1 - b2.tri_v0])
    e2 = np.concatenate([b.tri_v2 - b.tri_v0, b2.tri_v2 - b2.tri_v0])
    bt2, bidx2 = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), t0,
    )
    t2, tri2, obj2 = traverse16(
        oc, dc, t0, fused2, roots2, active=act, nn=nn2,
    )
    # map local tri ids back to global for comparison
    tri2n = np.asarray(tri2)
    obj2n = np.asarray(obj2)
    glob = np.where(obj2n == 1, tri2n + b.num_triangles, tri2n)
    glob = np.where(tri2n < 0, -1, glob)
    assert np.array_equal(glob, np.asarray(bidx2))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(bt2), rtol=1e-5)
    print("multi-root: hits OK", flush=True)


if __name__ == "__main__":
    _selfcheck()
