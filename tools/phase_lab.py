"""PHASE-SPLIT packet-kernel lab: never pay slab AND leaf vector work in
the same iteration.

The CPUGPU_ROWX decimation fit (tools/widerow_lab.py) proved ~86% of the
~1.05 us production iteration is width-scaled VPU work -- essentially the
8-child slab phase (~250 ns after op-stage-major emission) plus the
8-record Moller-Trumbore leaf phase (~300+ ns, tools/floor_probe.py) plus
the row-matrix copies feeding them.  Both phases run UNCONDITIONALLY
every iteration even though each popped entry only needs one of them; the
round-3 gated-leaf experiment (kernel_lab2 gate_leaf) couldn't help
because with 8 independent rows the probability that NO row popped a leaf
is tiny, so the pl.when(any_leaf) gate essentially always fires.

This lab makes the gate useful by DEFERRING leaves: a row that pops a
leaf entry stashes its ltris row index into a per-row PENDING slot (one
SMEM scalar) and keeps walking interior nodes.  Each while-loop iteration
is then either

  * an INTERIOR iteration -- node-row loads + slab + frame push + pop;
    NO leaf loads, NO Moller-Trumbore -- taken while no row's pending
    slot would overflow, or
  * a LEAF iteration -- triggered when some row pops a leaf while its
    pending slot is full (or when no interior entries remain): every row
    with a pending OR current leaf drains ONE leaf row through the MT
    phase; NO slab work, NO pushes.  Rows holding interior entries
    simply hold them for the next interior iteration.

Batching makes the leaf phase dense (most rows drain something) and the
interior phase cheap.  The cost is a bounded t-lag: a deferred leaf
can't shrink t until it drains, so slab pruning runs on a slightly stale
t and iteration counts rise a little; hits remain exact (every candidate
leaf is still tested with strict-< accepts, like every other visit-order
variant in this tree: framestack / nearest / sweep_dp, all fuzz-proven).

Control scheme is the picked production combo's (9-slot frame stack,
mask-gated conditional pushes).  Results fold back into
ops/traverse_packet_slim.py only if the on-chip A/B wins.

ON-CHIP VERDICT (config-3 bounce fan, 1.07M lanes, hits exact all arms):

    fs+condpush baseline   303.7 ms   293,741 iters   1034 ns/iter
    phase-split v1         349.9 ms   401,471 iters    871 ns/iter
      (187,649 leaf iters: the first-collision trigger fires constantly
       and every leaf iteration stalls the interior rows)
    phase-split drain2     321.1 ms   345,040 iters    931 ns/iter
      (both pending + current leaf drain per leaf iteration: leaf iters
       nearly halve to 109,653, still a loss)

LOSS, and the decomposition is the finding: solving the two arm mixes
gives an INTERIOR-ONLY iteration at ~870 ns -- removing the entire leaf
phase (row load + 8-record Moller-Trumbore + payload selects) from the
body saves only ~160 ns of the 1034 ns iteration.

Methodology caveat (ADVICE r3): these arm timings are 4 block_until_
ready-synced ~300 ms dispatches, not the chained-iteration harness
(tools/profile_*.py) -- block_until_ready can return early through the
tunnel, so the RELATIVE A/B verdict (both phase-split arms lose) is
robust but the ABSOLUTE ns/iter decomposition inherits any sync bias.
The round-4 smem/pipeline A/Bs re-judge the floor on full bench.py
frames (>= 10 s pipelined spans), not on these numbers.  The MT vector math is
almost entirely HIDDEN under the iteration's real critical path (scalar
pop -> dynamic node/leaf row loads+copies -> slab -> mask extract ->
push), so the width-scaled cost the ROWX fit measured is the row
load/copy pipeline, not ALU occupancy.  No phase separation can win:
the work it removes was free, and the stall iterations it adds cost full
price.  Next lever that COULD move the floor: fewer/earlier dynamic row
loads per iteration (the pipelined body already issues them one
iteration early; deeper speculation or batched multi-row loads are the
remaining ideas), not less ALU.

Self-check (interpret, tiny scene):   python tools/phase_lab.py check
Real config-3 fan A/B (chip or CPU):  python tools/phase_lab.py
                                      (PHASE_ONLY=drain2 to filter arms)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY
from cpugpupathtracing_tpu.ops.traverse_packet_slim import _ctz8

TILE = 1024
GROUPS = int(os.environ.get("PHASE_GROUPS", "4"))
ROWS = 8
LANES = 128
WIDTH = 8
LEAF_TRIS = 8
FSTACK = 9 * 24
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF
BIG = 1e30


def _phase_kernel(*refs, roots, drain2):
    (
        nodes_ref, ltris_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
        t_out, hit_out, obj_out, iters_out, leafit_out,
        entry_ref, sptr_ref, pend_ref, alive_ref, stack_ref,
        t_s, hit_s, obj_s,
    ) = refs
    pid = pl.program_id(0)

    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        any_act = jnp.sum(act_ref[gs]) > 0
        iters_out[pid * GROUPS + g] = 0
        leafit_out[pid * GROUPS + g] = 0

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
                pend_ref[j] = -1
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
            alive_ref[0] = 1

            def _mt_pass(lmat, limat, leaf_v, t, hit, obj):
                m = act0
                for c in range(LEAF_TRIS):
                    tm = lmat[:, 16 * c: 16 * c + 12]
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
                    hit = jnp.where(
                        ok, limat[:, 16 * c + 13: 16 * c + 14], hit)
                    obj = jnp.where(
                        ok, limat[:, 16 * c + 12: 16 * c + 13], obj)
                return t, hit, obj

            def body(carry):
                it, lit, _ = carry
                m = act0

                # ---- scalar classification (decides the iteration mode) --
                es = [entry_ref[j] for j in range(ROWS)]
                pnd = [pend_ref[j] for j in range(ROWS)]
                live = [e != DONE for e in es]
                is_leaf = [live[j] & (es[j] < 0) for j in range(ROWS)]
                is_int = [live[j] & (es[j] >= 0) for j in range(ROWS)]
                has_p = [pnd[j] >= 0 for j in range(ROWS)]

                collide = is_leaf[0] & has_p[0]
                any_int = is_int[0]
                any_leafish = is_leaf[0] | has_p[0]
                for j in range(1, ROWS):
                    collide = collide | (is_leaf[j] & has_p[j])
                    any_int = any_int | is_int[j]
                    any_leafish = any_leafish | is_leaf[j] | has_p[j]
                leaf_mode = collide | (any_leafish & jnp.logical_not(any_int))

                @pl.when(jnp.logical_not(leaf_mode))
                def _interior():
                    t = t_s[...]
                    nrows = []
                    for j in range(ROWS):
                        node = jnp.where(is_int[j], es[j], 0)
                        nrows.append(nodes_ref[pl.ds(node, 1), :])
                    nmat = jnp.concatenate(nrows, axis=0)        # (8, 64)
                    imat = jax.lax.bitcast_convert_type(nmat, jnp.int32)
                    int_v = jnp.concatenate(
                        [jnp.full((1, 1), is_int[j], jnp.int32)
                         for j in range(ROWS)], axis=0) != 0

                    # slab, op-stage-major (ops/traverse_packet_slim.py)
                    R = range(WIDTH)
                    tx1 = [(nmat[:, 6 * k + 0: 6 * k + 1] - ox) * ix for k in R]
                    ty1 = [(nmat[:, 6 * k + 1: 6 * k + 2] - oy) * iy for k in R]
                    tz1 = [(nmat[:, 6 * k + 2: 6 * k + 3] - oz) * iz for k in R]
                    tx2 = [(nmat[:, 6 * k + 3: 6 * k + 4] - ox) * ix for k in R]
                    ty2 = [(nmat[:, 6 * k + 4: 6 * k + 5] - oy) * iy for k in R]
                    tz2 = [(nmat[:, 6 * k + 5: 6 * k + 6] - oz) * iz for k in R]
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
                    valid = [imat[:, 48 + k: 49 + k] != SLIM_EMPTY for k in R]
                    bm = [
                        (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                        & m & int_v & valid[k]
                        for k in R
                    ]
                    fs_d = jnp.concatenate(
                        [jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                                 keepdims=True) for k in R], axis=1)
                    fs_fin = jnp.isfinite(fs_d)
                    fs_mask = jnp.zeros((ROWS, 1), jnp.int32)
                    for k in range(WIDTH):
                        fs_mask = fs_mask | (
                            fs_fin[:, k: k + 1].astype(jnp.int32) << k)

                    alive = jnp.int32(0)
                    for j in range(ROWS):
                        sp = sptr_ref[j]
                        es_ = [imat[j, 48 + k] for k in range(WIDTH)]
                        w = fs_mask[j, 0]
                        base_p = jnp.minimum(sp, FSTACK - 9)

                        @pl.when(w != 0)
                        def _push(j=j, base_p=base_p, w=w, es_=es_):
                            for k in range(WIDTH):
                                stack_ref[j, base_p + k] = es_[k]
                            stack_ref[j, base_p + 8] = w

                        sp = sp + jnp.where(w != 0, 9, 0)
                        # stash the popped leaf (pending is empty here:
                        # a full slot would have forced leaf_mode)
                        newp = jnp.where(is_leaf[j], -es[j] - 1, pnd[j])
                        pend_ref[j] = newp
                        # frame-stack pop (identical to kernel_lab2)
                        can = live[j] & (sp > 0)
                        base = jnp.maximum(sp - 9, 0)
                        mw = stack_ref[j, base + 8]
                        ent = stack_ref[j, base + _ctz8(mw)]
                        rem = mw & (mw - 1)
                        stack_ref[j, base + 8] = jnp.where(can, rem, mw)
                        sp = jnp.where(can & (rem == 0), base, sp)
                        nxt = jnp.where(can, ent, DONE)
                        sptr_ref[j] = sp
                        entry_ref[j] = nxt
                        alive = alive + jnp.where(
                            (nxt != DONE) | (newp >= 0), 1, 0)
                    alive_ref[0] = alive

                @pl.when(leaf_mode)
                def _leaf():
                    t = t_s[...]
                    hit = hit_s[...]
                    obj = obj_s[...]
                    if drain2:
                        # TWO MT passes: the pending slot AND the current
                        # leaf entry both drain this iteration (halves the
                        # leaf-iteration count, and with it the stalls the
                        # v1 A/B measured as the loss)
                        passes = [
                            ([jnp.where(has_p[j], pnd[j], 0)
                              for j in range(ROWS)], has_p),
                            ([jnp.where(is_leaf[j], -es[j] - 1, 0)
                              for j in range(ROWS)], is_leaf),
                        ]
                    else:
                        passes = [
                            ([jnp.where(has_p[j], pnd[j],
                                        jnp.where(is_leaf[j], -es[j] - 1, 0))
                              for j in range(ROWS)],
                             [has_p[j] | is_leaf[j] for j in range(ROWS)]),
                        ]
                    for srcs, dmask in passes:
                        lrows = [ltris_ref[pl.ds(srcs[j], 1), :]
                                 for j in range(ROWS)]
                        lmat = jnp.concatenate(lrows, axis=0)    # (8, 128)
                        limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
                        leaf_v = jnp.concatenate(
                            [jnp.full((1, 1), dmask[j], jnp.int32)
                             for j in range(ROWS)], axis=0) != 0
                        t, hit, obj = _mt_pass(lmat, limat, leaf_v, t, hit,
                                               obj)
                    t_s[...] = t
                    hit_s[...] = hit
                    obj_s[...] = obj

                    alive = jnp.int32(0)
                    for j in range(ROWS):
                        # pending update: under drain2 BOTH the slot and
                        # the current leaf drained, so the slot always
                        # empties; otherwise a colliding row drains its
                        # slot and stashes the current leaf
                        if drain2:
                            newp = jnp.int32(-1)
                        else:
                            newp = jnp.where(is_leaf[j] & has_p[j],
                                             -es[j] - 1, -1)
                        pend_ref[j] = newp
                        # only rows whose CURRENT entry was a leaf consumed
                        # it -> pop; interior entries are held untouched
                        sp = sptr_ref[j]
                        can = is_leaf[j] & (sp > 0)
                        base = jnp.maximum(sp - 9, 0)
                        mw = stack_ref[j, base + 8]
                        ent = stack_ref[j, base + _ctz8(mw)]
                        rem = mw & (mw - 1)
                        stack_ref[j, base + 8] = jnp.where(can, rem, mw)
                        sp = jnp.where(can & (rem == 0), base, sp)
                        nxt = jnp.where(
                            can, ent, jnp.where(is_leaf[j], DONE, es[j]))
                        sptr_ref[j] = sp
                        entry_ref[j] = nxt
                        alive = alive + jnp.where(
                            (nxt != DONE) | (newp >= 0), 1, 0)
                    alive_ref[0] = alive

                return (it + 1, lit + jnp.where(leaf_mode, 1, 0),
                        alive_ref[0])

            out = jax.lax.while_loop(
                lambda c: c[-1] > 0, body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(1)))
            t_out[gs] = t_s[...].reshape(-1)
            hit_out[gs] = hit_s[...].reshape(-1)
            obj_out[gs] = obj_s[...].reshape(-1)
            iters_out[pid * GROUPS + g] = out[0]
            leafit_out[pid * GROUPS + g] = out[1]


@functools.partial(jax.jit, static_argnames=("roots", "drain2"))
def traverse_phase(origin, direction, t_init, nodes, ltris, roots, *,
                   active, drain2=False):
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
        functools.partial(_phase_kernel, roots=roots, drain2=drain2),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),      # entry
            pltpu.SMEM((ROWS,), jnp.int32),      # sptr
            pltpu.SMEM((ROWS,), jnp.int32),      # pending leaf row
            pltpu.SMEM((1,), jnp.int32),         # alive
            pltpu.SMEM((ROWS, FSTACK), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(nodes, ltris, ox_c, oy_c, oz_c, dx_c, dy_c, dz_c, t_init, act)
    t, hit, obj, iters, leafit = res
    return t[:n0], hit[:n0], obj[:n0], iters, leafit


# ---------------------------------------------------------------------------


def _tiny_check():
    """Interpret-mode exactness vs the production kernel on small scenes."""
    import numpy as np

    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    rng = np.random.default_rng(7)
    scene = make_reference_scene()
    dev = scene.device()
    n = TILE * GROUPS
    o = np.stack([rng.uniform(-3, 3, n), rng.uniform(-1, 4, n),
                  rng.uniform(2, 9, n)], 1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = (rng.random(n) < 0.9).astype(np.int32)
    t0v = jnp.full((n,), RAY_TMAX, jnp.float32)
    oc = tuple(jnp.asarray(o[:, k]) for k in range(3))
    dc = tuple(jnp.asarray(d[:, k]) for k in range(3))

    interp = jax.default_backend() != "tpu"
    rt, rtri, robj, _, _, _ = pk.traverse_packet_slim(
        oc, dc, t0v, dev.pnodes, dev.pltris, dev.proots,
        active=jnp.asarray(act), interpret=interp)
    m = act != 0
    it = li = 0
    for d2 in (False, True):
        vt, vtri, vobj, iters, leafit = traverse_phase(
            oc, dc, t0v, dev.pnodes, dev.pltris, dev.proots,
            active=jnp.asarray(act), drain2=d2)
        tag = "drain2" if d2 else "v1"
        assert np.array_equal(np.asarray(vt)[m], np.asarray(rt)[m]), \
            f"t mismatch ({tag})"
        assert np.array_equal(np.asarray(vtri)[m], np.asarray(rtri)[m]), \
            f"tri mismatch ({tag})"
        assert np.array_equal(np.asarray(vobj)[m], np.asarray(robj)[m]), \
            f"obj mismatch ({tag})"
        it2 = int(np.asarray(iters).sum())
        li2 = int(np.asarray(leafit).sum())
        print(f"  {tag}: {it2} iters ({li2} leaf, {li2 / max(it2, 1):.1%})",
              flush=True)
        if not d2:
            it, li = it2, li2
    from tools.kernel_lab2 import traverse_lab2
    _, _, _, biters, bleafs = traverse_lab2(
        oc, dc, t0v, dev.pnodes, dev.pltris, dev.proots,
        active=jnp.asarray(act), frame_stack=True, cond_push=True)
    bi = int(np.asarray(biters).sum())
    bl = int(np.asarray(bleafs).sum())
    print(f"phase_lab tiny check OK: {it} iters ({it - li} interior + "
          f"{li} leaf, {li / max(it, 1):.1%} leaf), hits exact; "
          f"baseline fs+condpush: {bi} iters ({bl} with >=1 leaf row)",
          flush=True)


def main():
    import numpy as np

    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.ops import sampling
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
    from cpugpupathtracing_tpu.utils import rng as rnglib
    from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX
    from tools.kernel_lab2 import traverse_lab2

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), flush=True)
    scene = make_reference_scene()
    dev = scene.device()
    w, h = 1920, 1080
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    t0v = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.ones((n,), jnp.int32)

    # the config-3 bounce fan (the frame's dominant population)
    interp = jax.default_backend() != "tpu"
    t, tri, obj, nrm_c, depth, _ = pk.traverse_packet_slim(
        o, d, t0v, dev.pnodes, dev.pltris, dev.proots, active=act,
        interpret=interp)
    normal = jnp.stack(nrm_c, axis=1)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=7)
    pos = o + d * t[:, None]
    state, bd = sampling.cosine_weighted(state, normal)
    hit_mesh = tri >= 0
    bo = jnp.where(hit_mesh[:, None], pos + bd * RAY_NUDGE, o)
    bdir = jnp.where(hit_mesh[:, None], bd, d)
    bact = hit_mesh.astype(jnp.int32)
    bo_c = (bo[:, 0], bo[:, 1], bo[:, 2])
    bd_c = (bdir[:, 0], bdir[:, 1], bdir[:, 2])
    print(f"bounce population: {int(bact.sum()) / 1e6:.2f}M lanes",
          flush=True)

    rt, rtri, robj, _, _, _ = jax.block_until_ready(pk.traverse_packet_slim(
        bo_c, bd_c, t0v, dev.pnodes, dev.pltris, dev.proots, active=bact,
        interpret=interp))
    ref = (np.asarray(rt), np.asarray(rtri), np.asarray(robj))
    mref = np.asarray(bact) != 0

    # ADVICE r3: the lab's fixed FSTACK (9*24, inherited from kernel_lab2)
    # must cover this scene's DFS depth or pushes clamp silently and the
    # perf verdict would come from wrong traversals -- recompute the tree
    # depth from the slim table and assert the headroom scene.py enforces
    ents = np.asarray(dev.pnodes).view(np.int32)[:, 48:56]
    depth_by_row = {int(r): 1 for r in dev.proots}
    frontier = [int(r) for r in dev.proots]
    max_depth = 1
    while frontier:
        r = frontier.pop()
        for e in ents[r]:
            if 0 <= e < 0x40000000:  # interior child (SLIM_EMPTY sentinel)
                d_ = depth_by_row[r] + 1
                if depth_by_row.get(int(e), 0) < d_:
                    depth_by_row[int(e)] = d_
                    frontier.append(int(e))
                    max_depth = max(max_depth, d_)
    root_frames = (max(len(dev.proots) - 1, 0) + 7) // 8
    need = max_depth + 1 + root_frames + 1
    assert 9 * need <= FSTACK, (
        f"lab FSTACK {FSTACK} < scene need {9 * need} "
        f"(tree depth {max_depth}): clamped pushes would drop subtrees")

    arms = [
        ("fs+condpush baseline",
         lambda o_, d_, a_: traverse_lab2(
             o_, d_, t0v, dev.pnodes, dev.pltris, dev.proots, active=a_,
             frame_stack=True, cond_push=True)),
        ("phase-split",
         lambda o_, d_, a_: traverse_phase(
             o_, d_, t0v, dev.pnodes, dev.pltris, dev.proots, active=a_)),
        ("phase-split drain2",
         lambda o_, d_, a_: traverse_phase(
             o_, d_, t0v, dev.pnodes, dev.pltris, dev.proots, active=a_,
             drain2=True)),
    ]
    only = os.environ.get("PHASE_ONLY", "")
    if only:
        arms = [a for a in arms if only in a[0]]
    for label, f in arms:
        fj = jax.jit(f)
        try:
            res = jax.block_until_ready(fj(bo_c, bd_c, bact))
        except Exception as e:
            print(f"{label:22s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            res = fj(bo_c, bd_c, bact)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / reps
        iters = int(np.asarray(res[3]).sum())
        extra = int(np.asarray(res[4]).sum())
        vt, vtri, vobj = (np.asarray(res[0]), np.asarray(res[1]),
                          np.asarray(res[2]))
        good = (np.array_equal(vt[mref], ref[0][mref])
                and np.array_equal(vtri[mref], ref[1][mref])
                and np.array_equal(vobj[mref], ref[2][mref]))
        print(f"{label:22s} {dt * 1e3:8.1f} ms  {iters:9d} iters  "
              f"{dt * 1e9 / max(iters, 1):6.0f} ns/iter  "
              f"aux={extra:9d}  exact={good}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        _tiny_check()
    else:
        main()
