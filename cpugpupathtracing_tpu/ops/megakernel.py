"""Fused per-depth megakernels for the advanced path tracer.

Round-2 profiling put the per-depth XLA skeleton (shading select-chains,
NEE sampling, RNG, launch glue) at ~300 ms/frame at 1080p -- as large as
the traversal itself on simple scenes (VERDICT r2: the zero-triangle
config tops out at 11.6 Mrays/s on skeleton cost alone).  These kernels
fold one whole integrator depth into TWO Pallas launches so the XLA work
per depth shrinks to the wavefront sort:

  * `shade_extend` -- closest-hit traversal (the slim packet walk of
    ops/traverse_packet_slim.py with the slab phase interleaved
    op-stage-major: the 8 child tests are data-independent, and emitting
    them stage-major hides the VPU dependency-chain latency measured at
    ~560 ns/iteration when emitted child-major) PLUS the entire shading
    epilogue of models/integrators.trace_advanced's body in-register:
    analytic sphere/plane tests, material select chains from an SMEM
    table, light-hit emission (with the NEE double-count guard), NEE
    light sampling, Russian roulette, lobe selection, dielectric /
    Fresnel / Beer, and the bounce-ray update.  Emits the shadow rays
    and their premultiplied contribution for the second kernel.
  * `shadow_resolve` -- any-hit traversal over the shadow fan (mesh +
    analytic occluders) and the NEE energy add.

Both kernels skip ALL-DEAD 1024-ray sub-tiles (the wavefront sort packs
dead lanes to the tail), so per-depth cost scales with surviving lanes
-- the TPU analog of the reference's early-returning recursion
(Source/Main.cpp:414-431): terminated paths cost nothing afterward.

Exactness: every RNG draw (per-lane xorshift32), shading predicate, and
epsilon replicates models/integrators.trace_advanced in the same order,
so interpret mode reproduces the XLA integrator's image (tests pin it);
on the compiled path only transcendental ULPs (sin/cos/exp/rsqrt) may
differ.  Dead lanes inside a live sub-tile advance their RNG state
exactly like the XLA integrator's masked lanes; all-dead sub-tiles leave
their lanes' columns untouched (states frozen), which is invisible --
the renderer re-seeds per sample and dead lanes never shade.

Gating (scene.megakernel_active): packet fast path, no instances, no
mesh lights, ADVANCED mode, AOVs off.  Any light count works: the
reference's modulo light pick is a bit mask for power-of-two counts and
a restoring-division `_umod` chain otherwise (round-4 gate lift).

Reference parity: TracePathAdvanced, Source/Main.cpp:396-579.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY
from cpugpupathtracing_tpu.ops.traverse_packet_slim import (
    RESTORE, FSTACK_FRAMES, FRAMESTACK_DEFAULT, PIPELINED_DEFAULT,
    NEAREST_DEFAULT, CONDPUSH_DEFAULT, ROWX_DEFAULT, _check_table_width,
    _ctz8, _frame_mask, _frame_pop, _frame_push, _leaf_tests,
    _resolve_rowx, _resolve_smem, _resolve_width_flags, _smem_pop,
    _smem_push, _smem_seed, _sub_min, _sub_max,
)

TILE = 1024
GROUPS = 4
ROWS = 8
LANES = 128
WIDTH = 8
LEAF_TRIS = 8
STACK = 64
TRI_DET_EPS = 0.001
PLANE_DENOM_EPS = 1e-6
DONE = 0x7FFFFFFF
BIG = 1e30
RAY_TMAX = 1e34
RAY_NUDGE = 0.001
PI = 3.14159265
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
F32_SCALE = 2.3283064365387e-10  # Include/Random.h:31-34

# material table columns (SMEM, (M, 13) f32)
M_ALBEDO = 0      # 0..2
M_SPECULAR = 3
M_REFRACT = 4
M_ABSORB = 5      # 5..7
M_IOR = 8
M_EMISSIVE = 9    # 9..11
M_INTENSITY = 12

# light table columns (SMEM, (L, 9) f32)
L_CENTER = 0      # 0..2
L_RADIUS = 3
L_AREA = 4        # half-sphere area 2*pi*r^2 (mesh: total_area / 2)
L_EMISSION = 5    # 5..7 (= emissive * intensity)
L_IS_SPHERE = 9   # 1.0 sphere light, 0.0 mesh light
# sphere table columns (SMEM, (S, 6) f32): center, radius_sq, mat, is_light
S_CENTER = 0
S_RSQ = 3
S_MAT = 4
S_ISLIGHT = 5
# plane table columns (SMEM, (P, 7) f32): point, normal, mat
P_POINT = 0
P_NORMAL = 3
P_MAT = 6


def _xs32(s):
    """One xorshift32 step on a u32 register set (Include/Random.h:15-21)."""
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s


def _u2f(v):
    """u32 -> uniform [0,1) f32 (Include/Random.h:31-34).

    Mosaic has no uint32->float32 convert, so the value is rebuilt from
    two exact 16-bit halves: hi * 65536 and lo are both exactly
    representable, and their sum rounds ONCE -- bit-identical to a
    correctly-rounded native u32->f32 conversion."""
    vi = jax.lax.bitcast_convert_type(v, jnp.int32)
    lo = (vi & 0xFFFF).astype(jnp.float32)
    hi = jax.lax.shift_right_logical(vi, 16).astype(jnp.float32)
    return (hi * 65536.0 + lo) * jnp.float32(F32_SCALE)


def _umod(v, k: int):
    """u32 vector `v % k` for a compile-time constant k, Mosaic-safe.

    Power-of-two k lowers to the bit mask (bit-identical to the
    pre-round-4 kernels).  Otherwise restoring division: k << s spans
    down from just under 2^32, each step keeping the invariant
    r < (k << (s+1)) via one unsigned compare + select + subtract --
    ~30 vector ops once per NEE draw, exactly RandomUInt() % k
    (Include/Random.h:41-46; the reference's modulo light pick is
    Source/Main.cpp:441)."""
    if k & (k - 1) == 0:
        return v & jnp.uint32(k - 1)
    s = 32 - k.bit_length()
    while (k << s) >= (1 << 32):
        s -= 1
    r = v
    for sh in range(s, -1, -1):
        c = jnp.uint32(k << sh)
        r = jnp.where(r >= c, r - c, r)
    return r


def _select_mat_col(mats_ref, mat_idx, col, num_mats):
    """Select chain over the SMEM material table for one scalar column."""
    out = jnp.full(mat_idx.shape, mats_ref[0, col], jnp.float32)
    for m in range(1, num_mats):
        out = jnp.where(mat_idx == m, mats_ref[m, col], out)
    return out


def _emit_traversal(
    nodes_ref, ltris_ref, entry_ref, sptr_ref, stack_ref,
    ox, oy, oz, dx, dy, dz, m_act, t_init, roots, *, any_hit,
    count_iters=False, num_inst=0, iid_ref=None, rays_ref=None,
    inst_inv_ref=None, inst_root_ref=None, frame_stack=False, fused_nn=0,
    pipelined=False, entry2_ref=None, nearest=False, cond_push=False,
    width=WIDTH, occl=False, pay_ref=None, rowx=1, ents_ref=None,
    smem_mode=0, smem_nn=0, occl_rows=1,
):
    """Trace-time emission of the while-loop traversal for one sub-tile.

    m_act: (8*rowx,128) bool live-lane mask.  Returns (t, tri, obj, nx,
    ny, nz) with tri/obj = -1 and normal 0 on miss (plus the hit
    instance id when num_inst > 0, plus the while-loop iteration count
    when count_iters).  For any_hit=True the per-lane t stays t_init
    and tri >= 0 flags occlusion.

    rowx > 1 (CPUGPU_ROWX, wider packet rows): each of the 8 stacks
    drives rowx sublanes; ray operands arrive as (8*rowx, 128) with
    logical row j owning sublanes [rowx*j, rowx*j + rowx) -- adjacent
    sorted spans.  Non-instanced split tables only (see
    ops/traverse_packet_slim.py ROWX_DEFAULT).

    With num_inst > 0 the TLAS instance machinery of
    ops/traverse_packet_slim.py runs: popping an INSTANCE child entry
    switches the row's ray registers (VMEM scratch `rays_ref`) into the
    instance's object space via the SMEM 3x4 inverse transform, pushes
    a RESTORE marker, and descends into the BLAS root; normals return
    in OBJECT space with the owning instance id for the shading
    epilogue to transform.
    """
    SUB = rowx
    shape = (ROWS * SUB, LANES)
    instanced = num_inst > 0
    # node-arity locals (see ops/traverse_packet_slim.py): width 16 =
    # one full (B, 128) row, entries at col 96, 17-slot frames
    EO = 6 * width
    NC = 8 * width
    FR = width + 1
    LM = (1 << width) - 1
    FSTK = FR * FSTACK_FRAMES
    if smem_mode:
        # SMEM entry side table (traverse_packet_slim CPUGPU_SMEMTREE):
        # 2-word frames (node row, pass mask)
        FR = 2
        FSTK = 2 * FSTACK_FRAMES

    def inv_dir(d):
        return jnp.where(d == 0.0, BIG, 1.0 / d)

    ix0, iy0, iz0 = inv_dir(dx), inv_dir(dy), inv_dir(dz)
    ox0, oy0, oz0 = ox, oy, oz
    dx0, dy0, dz0 = dx, dy, dz

    for j in range(ROWS):
        entry_ref[j] = roots[0]
        if frame_stack and smem_mode:
            _smem_seed(stack_ref, sptr_ref, j, roots, smem_nn, width)
        elif frame_stack:
            # remaining roots seed whole frames (width entries + mask);
            # see ops/traverse_packet_slim.py for the frame scheme
            nroots = len(roots) - 1
            nf = 0
            pos = 0
            while pos < nroots:
                cnt = min(width, nroots - pos)
                for i in range(cnt):
                    stack_ref[j, FR * nf + i] = roots[1 + pos + i]
                stack_ref[j, FR * nf + width] = (1 << cnt) - 1
                nf += 1
                pos += cnt
            sptr_ref[j] = FR * nf
        else:
            sptr_ref[j] = len(roots) - 1
            for i, r in enumerate(roots[1:]):
                stack_ref[j, i] = r
        if instanced:
            iid_ref[j] = -1
    if instanced:
        # per-row mutable ray registers (world or current-instance
        # object space); component c's row j is rays_ref[c * ROWS + j]
        for c, v in enumerate((ox0, oy0, oz0, dx0, dy0, dz0, ix0, iy0, iz0)):
            rays_ref[c * ROWS : (c + 1) * ROWS, :] = v

    if pipelined:
        # software-pipelined body (fused or split tables, non-instanced):
        # see ops/traverse_packet_slim.py pipe_body for the scheme and
        # the exactness argument.  bvh_depth is not tracked here (the
        # megakernels run with AOVs off by gate).
        shape_ = (ROWS * SUB, LANES)
        if fused_nn:
            lmat0 = jnp.concatenate(
                [nodes_ref[pl.ds(roots[0], 1), :]] * (ROWS * SUB), axis=0
            )
            nmat0 = None
        else:
            nmat0 = jnp.concatenate(
                [nodes_ref[pl.ds(roots[0], 1), :]] * (ROWS * SUB), axis=0
            )
            lmat0 = jnp.concatenate(
                [ltris_ref[pl.ds(0, 1), :]] * (ROWS * SUB), axis=0
            )
            if pay_ref is not None:
                pmat0 = jnp.concatenate(
                    [pay_ref[pl.ds(0, 1), :]] * (ROWS * SUB), axis=0
                )

        def pipe_body(carry):
            pmat = lmat2 = None
            if fused_nn:
                t, hit, obj, nx, ny, nz, lmat = carry[:7]
            elif pay_ref is not None:
                t, hit, obj, nx, ny, nz, nmat_c, lmat, pmat = carry[:9]
            elif occl_rows == 2:
                t, hit, obj, nx, ny, nz, nmat_c, lmat, lmat2 = carry[:9]
            else:
                t, hit, obj, nx, ny, nz, nmat_c, lmat = carry[:8]
            m = m_act
            if any_hit:
                m = m & (hit < 0)
                row_live_v = _sub_max(
                    jnp.max(m.astype(jnp.int32), axis=1, keepdims=True),
                    SUB)

            entries, leaf_s, int_s, nexts = [], [], [], []
            urows, ulrows, uprows, ulrows2 = [], [], [], []
            for j in range(ROWS):
                e = entry_ref[j]
                entries.append(e)
                live = e != DONE
                rl = None
                if any_hit:
                    rl = row_live_v[SUB * j, 0] != 0
                    live = live & rl
                if fused_nn:
                    leaf_s.append(live & (e >= fused_nn))
                    int_s.append(live & (e < fused_nn))
                else:
                    leaf_s.append(live & (e < 0))
                    int_s.append(live & (e >= 0))
                sp = sptr_ref[j]
                can = sp > 0
                if any_hit:
                    can = can & rl
                if frame_stack and smem_mode:
                    ent, sp2 = _smem_pop(
                        stack_ref, ents_ref, j, sp, can, nearest, width)
                elif frame_stack:
                    base = jnp.maximum(sp - FR, 0)
                    mw = stack_ref[j, base + width]
                    kk, rem = _frame_pop(mw, nearest, width)
                    ent = stack_ref[j, base + kk]
                    stack_ref[j, base + width] = jnp.where(can, rem, mw)
                    sp2 = jnp.where(can & ((rem & LM) == 0), base, sp)
                else:
                    ent = stack_ref[j, jnp.maximum(sp - 1, 0)]
                    sp2 = jnp.where(can, sp - 1, sp)
                nxt = jnp.where(can, ent, DONE)
                entry2_ref[j] = nxt
                sptr_ref[j] = sp2
                nexts.append(nxt)
                if fused_nn:
                    urows.extend(
                        [nodes_ref[pl.ds(jnp.where(nxt != DONE, nxt, 0), 1),
                                   :]] * SUB
                    )
                else:
                    nn_i = jnp.where((nxt != DONE) & (nxt >= 0), nxt, 0)
                    nl_i = jnp.where(nxt < 0, (-nxt - 1) * occl_rows, 0)
                    urows.extend([nodes_ref[pl.ds(nn_i, 1), :]] * SUB)
                    ulrows.extend([ltris_ref[pl.ds(nl_i, 1), :]] * SUB)
                    if occl_rows == 2:
                        ulrows2.extend(
                            [ltris_ref[pl.ds(nl_i + 1, 1), :]] * SUB)
                    if pay_ref is not None:
                        uprows.extend([pay_ref[pl.ds(nl_i, 1), :]] * SUB)
            pmat_next = lmat2_next = None
            if fused_nn:
                lmat_next = jnp.concatenate(urows, axis=0)
                nmat_next = None
            else:
                nmat_next = jnp.concatenate(urows, axis=0)
                lmat_next = jnp.concatenate(ulrows, axis=0)
                if occl_rows == 2:
                    lmat2_next = jnp.concatenate(ulrows2, axis=0)
                if pay_ref is not None:
                    pmat_next = jnp.concatenate(uprows, axis=0)

            nmat = lmat[:, :NC] if fused_nn else nmat_c
            imat = (None if smem_mode == 2 else
                    jax.lax.bitcast_convert_type(nmat, jnp.int32))
            leaf_v = jnp.concatenate(
                [jnp.full((SUB, 1), leaf_s[j], jnp.int32)
                 for j in range(ROWS)],
                axis=0,
            ) != 0
            int_v = jnp.concatenate(
                [jnp.full((SUB, 1), int_s[j], jnp.int32)
                 for j in range(ROWS)],
                axis=0,
            ) != 0

            R = range(width)
            tx1 = [(nmat[:, 6 * k + 0 : 6 * k + 1] - ox0) * ix0 for k in R]
            ty1 = [(nmat[:, 6 * k + 1 : 6 * k + 2] - oy0) * iy0 for k in R]
            tz1 = [(nmat[:, 6 * k + 2 : 6 * k + 3] - oz0) * iz0 for k in R]
            tx2 = [(nmat[:, 6 * k + 3 : 6 * k + 4] - ox0) * ix0 for k in R]
            ty2 = [(nmat[:, 6 * k + 4 : 6 * k + 5] - oy0) * iy0 for k in R]
            tz2 = [(nmat[:, 6 * k + 5 : 6 * k + 6] - oz0) * iz0 for k in R]
            mnx = [jnp.minimum(tx1[k], tx2[k]) for k in R]
            mny = [jnp.minimum(ty1[k], ty2[k]) for k in R]
            mnz = [jnp.minimum(tz1[k], tz2[k]) for k in R]
            mxx = [jnp.maximum(tx1[k], tx2[k]) for k in R]
            mxy = [jnp.maximum(ty1[k], ty2[k]) for k in R]
            mxz = [jnp.maximum(tz1[k], tz2[k]) for k in R]
            tmin = [jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k]) for k in R]
            tmax = [jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k]) for k in R]
            if smem_mode == 2:
                # bounds-only rows: NaN empties fail every compare
                bm = [
                    (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                    & m & int_v
                    for k in R
                ]
            else:
                valid = [imat[:, EO + k : EO + k + 1] != SLIM_EMPTY
                         for k in R]
                bm = [
                    (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                    & m & int_v & valid[k]
                    for k in R
                ]
            fin = [
                _sub_min(
                    jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                            keepdims=True),
                    SUB,
                )
                for k in R
            ]
            fs_mask = _frame_mask(fin, nearest, width)

            t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                lmat, ox0, oy0, oz0, dx0, dy0, dz0, m, leaf_v,
                t, hit, obj, nx, ny, nz, occl=occl, pmat=pmat)
            if occl_rows == 2:
                t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                    lmat2, ox0, oy0, oz0, dx0, dy0, dz0, m, leaf_v,
                    t, hit, obj, nx, ny, nz, occl=True)

            alive = jnp.int32(0)
            for j in range(ROWS):
                sp = sptr_ref[j]
                w = fs_mask[SUB * j, 0]
                if frame_stack and smem_mode:
                    # 2-word frame: (current node row, mask)
                    base_p = jnp.minimum(sp, FSTK - 2)
                    pushc = int_s[j] & ((w & LM) != 0)
                    _smem_push(stack_ref, j, base_p, entries[j], w,
                               pushc, cond_push)
                    sp = sp + jnp.where(pushc, 2, 0)
                    sptr_ref[j] = sp
                    entry_ref[j] = entry2_ref[j]
                    row_alive = (nexts[j] != DONE) | (sp > 0)
                    if any_hit:
                        row_alive = row_alive & (row_live_v[SUB * j, 0] != 0)
                    alive = alive + jnp.where(row_alive, 1, 0)
                    continue
                es_ = [imat[SUB * j, EO + k] for k in range(width)]
                if frame_stack:
                    base_p = jnp.minimum(sp, FSTK - FR)
                    pushc = int_s[j] & ((w & LM) != 0)
                    _frame_push(stack_ref, j, base_p, es_, w,
                                pushc, cond_push)
                    sp = sp + jnp.where(pushc, FR, 0)
                else:
                    for k in range(width):
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
                row_alive = (nexts[j] != DONE) | (sp > 0)
                if any_hit:
                    row_alive = row_alive & (row_live_v[SUB * j, 0] != 0)
                alive = alive + jnp.where(row_alive, 1, 0)
            out = (t, hit, obj, nx, ny, nz)
            if not fused_nn:
                out = out + (nmat_next,)
            out = out + (lmat_next,)
            if occl_rows == 2:
                out = out + (lmat2_next,)
            if pay_ref is not None:
                out = out + (pmat_next,)
            if count_iters:
                return out + (carry[-2] + 1, alive)
            return out + (alive,)

        init_p = [
            t_init,
            jnp.full(shape_, -1, jnp.int32),
            jnp.full(shape_, -1, jnp.int32),
            jnp.zeros(shape_, jnp.float32),
            jnp.zeros(shape_, jnp.float32),
            jnp.zeros(shape_, jnp.float32),
        ]
        if not fused_nn:
            init_p.append(nmat0)
        init_p.append(lmat0)
        if occl_rows == 2:
            init_p.append(lmat0)  # dummy second leaf row
        if pay_ref is not None:
            init_p.append(pmat0)
        if count_iters:
            init_p.append(jnp.int32(0))
        init_p.append(jnp.int32(1))
        out = jax.lax.while_loop(
            lambda c: c[-1] > 0, pipe_body, tuple(init_p))
        res = out[:6]
        if count_iters:
            res = res + (out[-2],)
        return res

    def body(carry):
        if instanced:
            t, hit, obj, nx, ny, nz, hiid, _ = carry
            ox = rays_ref[0 * ROWS : 1 * ROWS, :]
            oy = rays_ref[1 * ROWS : 2 * ROWS, :]
            oz = rays_ref[2 * ROWS : 3 * ROWS, :]
            dx = rays_ref[3 * ROWS : 4 * ROWS, :]
            dy = rays_ref[4 * ROWS : 5 * ROWS, :]
            dz = rays_ref[5 * ROWS : 6 * ROWS, :]
            ix = rays_ref[6 * ROWS : 7 * ROWS, :]
            iy = rays_ref[7 * ROWS : 8 * ROWS, :]
            iz = rays_ref[8 * ROWS : 9 * ROWS, :]
        else:
            t, hit, obj, nx, ny, nz, _ = carry
            hiid = None
            ox, oy, oz = ox0, oy0, oz0
            dx, dy, dz = dx0, dy0, dz0
            ix, iy, iz = ix0, iy0, iz0
        m = m_act
        if any_hit:
            m = m & (hit < 0)
            # any-hit row flush (see ops/traverse_packet_slim.py): a row
            # whose live lanes are all occluded is parked immediately
            row_live_v = _sub_max(
                jnp.max(m.astype(jnp.int32), axis=1, keepdims=True),
                SUB)                                       # (8*SUB, 1)

        nrows, lrows, prows, leaf_s, int_s = [], [], [], [], []
        lrows2 = []
        if fused_nn:
            # unified node|leaf table: one dynamic load + one address
            # select per row (see ops/traverse_packet_slim.py fused_nn)
            urows = []
            for j in range(ROWS):
                e = entry_ref[j]
                live = e != DONE
                if any_hit:
                    live = live & (row_live_v[SUB * j, 0] != 0)
                leaf_s.append(live & (e >= fused_nn))
                int_s.append(live & (e < fused_nn))
                urows.extend(
                    [nodes_ref[pl.ds(jnp.where(live, e, 0), 1), :]] * SUB)
            lmat = jnp.concatenate(urows, axis=0)
            nmat = lmat[:, :NC]
        else:
            for j in range(ROWS):
                e = entry_ref[j]
                live = e != DONE
                if any_hit:
                    live = live & (row_live_v[SUB * j, 0] != 0)
                leaf = live & (e < 0)
                if instanced:
                    interior = live & (e >= 0) & (e < RESTORE)
                else:
                    interior = live & (e >= 0)
                node = jnp.where(interior, e, 0)
                lrow = jnp.where(leaf, (-e - 1) * occl_rows, 0)
                nrows.extend([nodes_ref[pl.ds(node, 1), :]] * SUB)
                lrows.extend([ltris_ref[pl.ds(lrow, 1), :]] * SUB)
                if occl_rows == 2:
                    lrows2.extend([ltris_ref[pl.ds(lrow + 1, 1), :]] * SUB)
                if pay_ref is not None:
                    prows.extend([pay_ref[pl.ds(lrow, 1), :]] * SUB)
                leaf_s.append(leaf)
                int_s.append(interior)
            nmat = jnp.concatenate(nrows, axis=0)
            lmat = jnp.concatenate(lrows, axis=0)
        lmat2 = jnp.concatenate(lrows2, axis=0) if occl_rows == 2 else None
        pmat = jnp.concatenate(prows, axis=0) if pay_ref is not None else None
        imat = (None if smem_mode == 2 else
                jax.lax.bitcast_convert_type(nmat, jnp.int32))
        leaf_v = jnp.concatenate(
            [jnp.full((SUB, 1), leaf_s[j], jnp.int32) for j in range(ROWS)],
            axis=0,
        ) != 0
        int_v = jnp.concatenate(
            [jnp.full((SUB, 1), int_s[j], jnp.int32) for j in range(ROWS)],
            axis=0,
        ) != 0
        if instanced:
            iid_v = jnp.concatenate(
                [jnp.full((SUB, 1), iid_ref[j], jnp.int32)
                 for j in range(ROWS)],
                axis=0,
            )

        # ---- slab phase, op-stage-major over the children ----
        R = range(width)
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
        if smem_mode == 2:
            # bounds-only rows: NaN empties fail every compare
            bm = [
                (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                & m & int_v
                for k in R
            ]
        else:
            valid = [imat[:, EO + k : EO + k + 1] != SLIM_EMPTY for k in R]
            bm = [
                (tmax[k] >= tmin[k]) & (tmin[k] < t) & (tmax[k] > 0.0)
                & m & int_v & valid[k]
                for k in R
            ]
        child_dmin = [
            _sub_min(
                jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                        keepdims=True),
                SUB,
            )
            for k in R
        ]

        # ---- leaf phase ----
        t, hit, obj, nx, ny, nz, hiid = _leaf_tests(
            lmat, ox, oy, oz, dx, dy, dz, m, leaf_v,
            t, hit, obj, nx, ny, nz,
            hiid=hiid if instanced else None,
            iid_v=iid_v if instanced else None, occl=occl, pmat=pmat)
        if occl_rows == 2:
            # second row of the fat occlusion leaf (CPUGPU_OCCL2)
            t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                lmat2, ox, oy, oz, dx, dy, dz, m, leaf_v,
                t, hit, obj, nx, ny, nz, occl=True)

        # ---- per-row scalar control: push children, pop next ----
        if frame_stack:
            # per-row pass masks built ONCE in the vector domain (see
            # ops/traverse_packet_slim.py's frame-stack scheme)
            fs_mask = _frame_mask(child_dmin, nearest, width)

        alive = jnp.int32(0)
        for j in range(ROWS):
            e = entry_ref[j]
            live = e != DONE
            if any_hit:
                live = live & (row_live_v[SUB * j, 0] != 0)
            interior = int_s[j]
            sp = sptr_ref[j]

            if frame_stack and smem_mode:
                # 2-word frame push (node row, mask) + side-table pop;
                # non-instanced only (resolved upstream)
                w = fs_mask[SUB * j, 0]
                base_p = jnp.minimum(sp, FSTK - 2)
                pushc = (w & LM) != 0
                _smem_push(stack_ref, j, base_p, e, w, pushc, cond_push)
                sp = sp + jnp.where(pushc, 2, 0)
                can = live & (sp > 0)
                nxt, sp = _smem_pop(
                    stack_ref, ents_ref, j, sp, can, nearest, width)
                nxt = jnp.where(can, nxt, DONE)
                sptr_ref[j] = sp
                entry_ref[j] = nxt
                alive = alive + jnp.where(nxt != DONE, 1, 0)
                continue

            es_ = [imat[SUB * j, EO + k] for k in range(width)]

            if frame_stack:
                # 9-slot frame push (8 unconditional stores + pass mask),
                # ctz pop -- bit-exact hits vs the linear scheme
                w = fs_mask[SUB * j, 0]
                slot0 = es_[0]
                if instanced:
                    is_inst = live & (e > SLIM_EMPTY)
                    is_rest = live & (e == RESTORE)
                    iid_e = e - SLIM_EMPTY - 1
                    iid_c = jnp.clip(iid_e, 0, num_inst - 1)
                    slot0 = jnp.where(is_inst, RESTORE, slot0)
                    w = jnp.where(is_inst, jnp.int32(1), w)
                base_p = jnp.minimum(sp, FSTK - FR)
                pushc = (w & LM) != 0
                _frame_push(stack_ref, j, base_p, [slot0] + es_[1:], w,
                            pushc, cond_push)
                sp = sp + jnp.where(pushc, FR, 0)

                if instanced:
                    @pl.when(is_inst)
                    def _enter_f(j=j, iid_c=iid_c):
                        mm = [inst_inv_ref[iid_c, k] for k in range(12)]
                        o_x = mm[0] * ox0[j] + mm[1] * oy0[j] + mm[2] * oz0[j] + mm[3]
                        o_y = mm[4] * ox0[j] + mm[5] * oy0[j] + mm[6] * oz0[j] + mm[7]
                        o_z = mm[8] * ox0[j] + mm[9] * oy0[j] + mm[10] * oz0[j] + mm[11]
                        d_x = mm[0] * dx0[j] + mm[1] * dy0[j] + mm[2] * dz0[j]
                        d_y = mm[4] * dx0[j] + mm[5] * dy0[j] + mm[6] * dz0[j]
                        d_z = mm[8] * dx0[j] + mm[9] * dy0[j] + mm[10] * dz0[j]
                        rays_ref[0 * ROWS + j, :] = o_x
                        rays_ref[1 * ROWS + j, :] = o_y
                        rays_ref[2 * ROWS + j, :] = o_z
                        rays_ref[3 * ROWS + j, :] = d_x
                        rays_ref[4 * ROWS + j, :] = d_y
                        rays_ref[5 * ROWS + j, :] = d_z
                        rays_ref[6 * ROWS + j, :] = inv_dir(d_x)
                        rays_ref[7 * ROWS + j, :] = inv_dir(d_y)
                        rays_ref[8 * ROWS + j, :] = inv_dir(d_z)

                    @pl.when(is_rest)
                    def _leave_f(j=j):
                        rays_ref[0 * ROWS + j, :] = ox0[j]
                        rays_ref[1 * ROWS + j, :] = oy0[j]
                        rays_ref[2 * ROWS + j, :] = oz0[j]
                        rays_ref[3 * ROWS + j, :] = dx0[j]
                        rays_ref[4 * ROWS + j, :] = dy0[j]
                        rays_ref[5 * ROWS + j, :] = dz0[j]
                        rays_ref[6 * ROWS + j, :] = ix0[j]
                        rays_ref[7 * ROWS + j, :] = iy0[j]
                        rays_ref[8 * ROWS + j, :] = iz0[j]

                    iid_ref[j] = jnp.where(
                        is_inst, iid_e, jnp.where(is_rest, -1, iid_ref[j])
                    )

                can = live & (sp > 0)
                if instanced:
                    can = can & ~is_inst  # entering descends, not pops
                base = jnp.maximum(sp - FR, 0)
                mw = stack_ref[j, base + width]
                kk, rem = _frame_pop(mw, nearest, width)
                ent = stack_ref[j, base + kk]
                stack_ref[j, base + width] = jnp.where(can, rem, mw)
                sp = jnp.where(can & ((rem & LM) == 0), base, sp)
                nxt = jnp.where(can, ent, DONE)
                if instanced:
                    blas_e = inst_root_ref[iid_c]
                    nxt = jnp.where(is_inst, blas_e, nxt)
                sptr_ref[j] = sp
                entry_ref[j] = nxt
                alive = alive + jnp.where(nxt != DONE, 1, 0)
                continue

            ds_ = [child_dmin[k][SUB * j, 0] for k in range(width)]
            # fixed push order for both modes (see traverse_packet_slim)
            for k in range(width):
                push = jnp.isfinite(ds_[k]) & interior
                slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                prev = stack_ref[j, slot]
                stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                sp = sp + jnp.where(push, 1, 0)

            if instanced:
                # TLAS instance entry / RESTORE handling, identical to
                # traverse_packet_slim's machinery (module docstring)
                is_inst = live & (e > SLIM_EMPTY)
                is_rest = live & (e == RESTORE)
                iid_e = e - SLIM_EMPTY - 1
                iid_c = jnp.clip(iid_e, 0, num_inst - 1)
                slot = jnp.where(is_inst, jnp.minimum(sp, STACK - 1), STACK - 1)
                prev = stack_ref[j, slot]
                stack_ref[j, slot] = jnp.where(is_inst, RESTORE, prev)
                sp = sp + jnp.where(is_inst, 1, 0)

                @pl.when(is_inst)
                def _enter(j=j, iid_c=iid_c):
                    mm = [inst_inv_ref[iid_c, k] for k in range(12)]
                    o_x = mm[0] * ox0[j] + mm[1] * oy0[j] + mm[2] * oz0[j] + mm[3]
                    o_y = mm[4] * ox0[j] + mm[5] * oy0[j] + mm[6] * oz0[j] + mm[7]
                    o_z = mm[8] * ox0[j] + mm[9] * oy0[j] + mm[10] * oz0[j] + mm[11]
                    d_x = mm[0] * dx0[j] + mm[1] * dy0[j] + mm[2] * dz0[j]
                    d_y = mm[4] * dx0[j] + mm[5] * dy0[j] + mm[6] * dz0[j]
                    d_z = mm[8] * dx0[j] + mm[9] * dy0[j] + mm[10] * dz0[j]
                    rays_ref[0 * ROWS + j, :] = o_x
                    rays_ref[1 * ROWS + j, :] = o_y
                    rays_ref[2 * ROWS + j, :] = o_z
                    rays_ref[3 * ROWS + j, :] = d_x
                    rays_ref[4 * ROWS + j, :] = d_y
                    rays_ref[5 * ROWS + j, :] = d_z
                    rays_ref[6 * ROWS + j, :] = inv_dir(d_x)
                    rays_ref[7 * ROWS + j, :] = inv_dir(d_y)
                    rays_ref[8 * ROWS + j, :] = inv_dir(d_z)

                @pl.when(is_rest)
                def _leave(j=j):
                    rays_ref[0 * ROWS + j, :] = ox0[j]
                    rays_ref[1 * ROWS + j, :] = oy0[j]
                    rays_ref[2 * ROWS + j, :] = oz0[j]
                    rays_ref[3 * ROWS + j, :] = dx0[j]
                    rays_ref[4 * ROWS + j, :] = dy0[j]
                    rays_ref[5 * ROWS + j, :] = dz0[j]
                    rays_ref[6 * ROWS + j, :] = ix0[j]
                    rays_ref[7 * ROWS + j, :] = iy0[j]
                    rays_ref[8 * ROWS + j, :] = iz0[j]

                iid_ref[j] = jnp.where(
                    is_inst, iid_e, jnp.where(is_rest, -1, iid_ref[j])
                )

            can = live & (sp > 0)
            if instanced:
                can = can & ~is_inst  # entering descends, not pops
            top = stack_ref[j, jnp.maximum(sp - 1, 0)]
            nxt = jnp.where(can, top, DONE)
            if instanced:
                blas_e = inst_root_ref[iid_c]
                nxt = jnp.where(is_inst, blas_e, nxt)
            sptr_ref[j] = jnp.where(can, sp - 1, sp)
            entry_ref[j] = nxt
            alive = alive + jnp.where(nxt != DONE, 1, 0)
        if instanced:
            return t, hit, obj, nx, ny, nz, hiid, alive
        return t, hit, obj, nx, ny, nz, alive

    def cond(carry):
        return carry[-1] > 0

    if count_iters:
        inner = body

        def body(carry):
            it = carry[-2]
            res = inner(carry[:-2] + (carry[-1],))
            return res[:-1] + (it + 1, res[-1])

    init = [
        t_init,
        jnp.full(shape, -1, jnp.int32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    ]
    if instanced:
        init.append(jnp.full(shape, -1, jnp.int32))
    if count_iters:
        init.append(jnp.int32(0))
    init.append(jnp.int32(1))
    out = jax.lax.while_loop(cond, body, tuple(init))
    base = out[:7] if instanced else out[:6]
    if count_iters:
        return base + (out[-2],)
    return base


def _analytic_tests(sph_ref, pln_ref, ox, oy, oz, dx, dy, dz,
                    t, kind, num_sph, num_pln):
    """Static per-object sphere/plane loops, same predicates and tie
    rules as models/scene.intersect_scene (Source/Primitives.cpp:49-114).
    kind: 0 = mesh/miss, 1 + s = sphere s, 1 + S + p = plane p."""
    if num_sph:
        best = jnp.full(t.shape, jnp.inf, jnp.float32)
        bj = jnp.zeros(t.shape, jnp.int32)
        for s in range(num_sph):
            cx, cy, cz = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]
            rsq = sph_ref[s, S_RSQ]
            elx, ely, elz = cx - ox, cy - oy, cz - oz
            tca = elx * dx + ely * dy + elz * dz
            d2 = (elx * elx + ely * ely + elz * elz) - tca * tca
            thc = jnp.sqrt(jnp.maximum(rsq - d2, 0.0))
            t0 = tca - thc
            t1 = tca + thc
            ts = jnp.where(t0 < 0.0, t1, t0)
            vs = (tca >= 0.0) & (d2 <= rsq) & (ts >= 0.0)
            ts = jnp.where(vs, ts, jnp.inf)
            closer = vs & (ts < t) & (ts < best)
            best = jnp.where(closer, ts, best)
            bj = jnp.where(closer, s, bj)
        hit_s = jnp.isfinite(best)
        t = jnp.where(hit_s, best, t)
        kind = jnp.where(hit_s, 1 + bj, kind)
    if num_pln:
        best = jnp.full(t.shape, jnp.inf, jnp.float32)
        bj = jnp.zeros(t.shape, jnp.int32)
        for p in range(num_pln):
            nxp, nyp, nzp = pln_ref[p, 3], pln_ref[p, 4], pln_ref[p, 5]
            px, py, pz = pln_ref[p, 0], pln_ref[p, 1], pln_ref[p, 2]
            denom = dx * nxp + dy * nyp + dz * nzp
            den_ok = jnp.abs(denom) > PLANE_DENOM_EPS
            tp = ((px - ox) * nxp + (py - oy) * nyp + (pz - oz) * nzp) / (
                jnp.where(den_ok, denom, 1.0)
            )
            vp = den_ok & (tp > 0.0)
            tp = jnp.where(vp, tp, jnp.inf)
            closer = vp & (tp < t) & (tp < best)
            best = jnp.where(closer, tp, best)
            bj = jnp.where(closer, p, bj)
        hit_p = jnp.isfinite(best)
        t = jnp.where(hit_p, best, t)
        kind = jnp.where(hit_p, 1 + num_sph + bj, kind)
    return t, kind


def _shade_surface(
    mats_ref, lights_ref, sph_ref, pln_ref, sphmat_ref, plnmat_ref,
    objmat_ref,
    ox, oy, oz, dx, dy, dz, state, tpx, tpy, tpz, enx, eny, enz,
    active, is_spec, depth0,
    t, tri, obj, mnx, mny, mnz,
    *, num_mats, num_lights, num_sph, num_pln, num_objs,
    nee, rr, cosine, ref_pdf, ltri_ref=None, light_tri_meta=(),
):
    """The full TracePathAdvanced shading body (Source/Main.cpp:396-579)
    on traversal results, in registers: analytic prim tests, hit
    surface, light-hit emission (w/ NEE double-count guard), NEE light
    sampling, Russian roulette, lobe selection, dielectric/Fresnel/Beer
    and the bounce-ray update.  Shared op for op by the per-depth
    megakernel (_shade_extend_kernel) and the whole-frame path-tracing
    kernel (ops/pt_frame_kernel.py) so both are bitwise-identical in
    interpret mode.

    active/is_spec/depth0: bool registers.  t/tri/obj/mn*: the mesh
    traversal's nearest hit (normals already in world space).

    Returns (nox, noy, noz, ndx, ndy, ndz, state, tpx, tpy, tpz,
    enx, eny, enz, active', spec_i, sneed, so_x, so_y, so_z,
    tlx, tly, tlz, stmax, c_r, c_g, c_b): the bounced rays, updated
    carry, and the NEE shadow fan (sneed bool; stmax raw -- callers
    storing it mask with sneed)."""
    shape = ox.shape
    kind = jnp.zeros(shape, jnp.int32)
    t, kind = _analytic_tests(
        sph_ref, pln_ref, ox, oy, oz, dx, dy, dz, t, kind,
        num_sph, num_pln,
    )

    hit_any = (tri >= 0) | (kind > 0)
    miss = active & ~hit_any
    active = active & ~miss

    # ---- hit surface (GetRayHitResult, Main.cpp:325-338) ----
    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t
    nx, ny, nz = mnx, mny, mnz
    # mat chain: mesh payload obj -> material via objmat table
    mat_idx = jnp.full(shape, objmat_ref[0], jnp.int32)
    for o in range(1, num_objs):
        mat_idx = jnp.where(obj == o, objmat_ref[o], mat_idx)
    for s in range(num_sph):
        is_s = kind == 1 + s
        cxs, cys, czs = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]
        vx, vy, vz = px - cxs, py - cys, pz - czs
        l_s = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        nx = jnp.where(is_s, vx / l_s, nx)
        ny = jnp.where(is_s, vy / l_s, ny)
        nz = jnp.where(is_s, vz / l_s, nz)
        mat_idx = jnp.where(is_s, sphmat_ref[s], mat_idx)
    for p in range(num_pln):
        is_p = kind == 1 + num_sph + p
        nx = jnp.where(is_p, pln_ref[p, 3], nx)
        ny = jnp.where(is_p, pln_ref[p, 4], ny)
        nz = jnp.where(is_p, pln_ref[p, 5], nz)
        mat_idx = jnp.where(is_p, plnmat_ref[p], mat_idx)

    def mat_col(col):
        return _select_mat_col(mats_ref, mat_idx, col, num_mats)

    alb_r = mat_col(M_ALBEDO)
    alb_g = mat_col(M_ALBEDO + 1)
    alb_b = mat_col(M_ALBEDO + 2)
    m_spec = mat_col(M_SPECULAR)
    m_refr = mat_col(M_REFRACT)
    m_ior = mat_col(M_IOR)
    is_light = mat_col(13) > 0.5

    # ---- light hit (Main.cpp:424-431) ----
    hit_light = active & is_light
    if nee:
        add_em = hit_light & (depth0 | is_spec)
    else:
        add_em = hit_light
    inten = mat_col(M_INTENSITY)
    enx = enx + jnp.where(add_em, tpx * mat_col(M_EMISSIVE) * inten, 0.0)
    eny = eny + jnp.where(add_em, tpy * mat_col(M_EMISSIVE + 1) * inten, 0.0)
    enz = enz + jnp.where(add_em, tpz * mat_col(M_EMISSIVE + 2) * inten, 0.0)
    active = active & ~hit_light

    dw = jnp.maximum(0.0, 1.0 - m_spec - m_refr)
    brdf_r = alb_r * INV_PI
    brdf_g = alb_g * INV_PI
    brdf_b = alb_b * INV_PI

    # ---- NEE (Main.cpp:439-465; sample_light draw layout) ----
    if nee:
        do_nee = active & (dw > 0.001)
        state = _xs32(state)
        li = jax.lax.bitcast_convert_type(
            _umod(state, num_lights), jnp.int32
        )

        def light_col(col):
            out = jnp.full(shape, lights_ref[0, col], jnp.float32)
            for l in range(1, num_lights):
                out = jnp.where(li == l, lights_ref[l, col], out)
            return out

        lcx = light_col(L_CENTER)
        lcy = light_col(L_CENTER + 1)
        lcz = light_col(L_CENTER + 2)
        lrad = light_col(L_RADIUS)
        larea = light_col(L_AREA)
        lem_r = light_col(L_EMISSION)
        lem_g = light_col(L_EMISSION + 1)
        lem_b = light_col(L_EMISSION + 2)

        # random_point_sphere_facing (Source/Primitives.cpp:214-220)
        tpx_c, tpy_c, tpz_c = px - lcx, py - lcy, pz - lcz
        l_tp = jnp.sqrt(tpx_c * tpx_c + tpy_c * tpy_c + tpz_c * tpz_c)
        fx, fy, fz = tpx_c / l_tp, tpy_c / l_tp, tpz_c / l_tp
        state = _xs32(state)
        u1 = _u2f(state)
        state = _xs32(state)
        u2 = _u2f(state)
        zz = 1.0 - 2.0 * u1
        rr_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
        phi = TWO_PI * u2
        sx_ = rr_ * jnp.cos(phi)
        sy_ = rr_ * jnp.sin(phi)
        sz_ = zz
        flip = jnp.where(sx_ * fx + sy_ * fy + sz_ * fz < 0.0, -1.0, 1.0)
        sx_, sy_, sz_ = sx_ * flip, sy_ * flip, sz_ * flip
        lpx = lcx + lrad * sx_
        lpy = lcy + lrad * sy_
        lpz = lcz + lrad * sz_
        r_d = jnp.maximum(lrad, 1e-20)
        lnx = (lpx - lcx) / r_d
        lny = (lpy - lcy) / r_d
        lnz = (lpz - lcz) / r_d
        mesh_lights = any(c for _, c in light_tri_meta)
        if mesh_lights:
            # mesh-light arm (sample_light's gathered-triangle branch,
            # Main.cpp:361-394): uniform triangle pick per light
            # (static-divisor modulo, exactly RandomUInt() % count),
            # fold-sample the unit square, select the row over the
            # packed light-triangle table.  Same 3-draw stream layout
            # as the no-mesh-light dummies below.
            state = _xs32(state)
            ti = jnp.zeros(shape, jnp.int32)
            for l, (st_, cnt) in enumerate(light_tri_meta):
                if cnt:
                    til = jnp.int32(st_) + jax.lax.bitcast_convert_type(
                        _umod(state, cnt), jnp.int32)
                    ti = jnp.where(li == l, til, ti)
            state = _xs32(state)
            u0m = _u2f(state)
            state = _xs32(state)
            u1m = _u2f(state)
            over = (u0m + u1m) > 1.0
            alpha = jnp.where(over, 1.0 - u0m, u0m)
            beta = jnp.where(over, 1.0 - u1m, u1m)
            gamma = 1.0 - alpha - beta

            nlt = max(s_ + c_ for s_, c_ in light_tri_meta)

            def ltri_col(c):
                out = jnp.full(shape, ltri_ref[0, c], jnp.float32)
                for t_ in range(1, nlt):
                    out = jnp.where(ti == t_, ltri_ref[t_, c], out)
                return out

            ptx = alpha * ltri_col(0) + beta * ltri_col(3) + gamma * ltri_col(6)
            pty = alpha * ltri_col(1) + beta * ltri_col(4) + gamma * ltri_col(7)
            ptz = alpha * ltri_col(2) + beta * ltri_col(5) + gamma * ltri_col(8)
            is_sph_l = light_col(L_IS_SPHERE) > 0.5
            lpx = jnp.where(is_sph_l, lpx, ptx)
            lpy = jnp.where(is_sph_l, lpy, pty)
            lpz = jnp.where(is_sph_l, lpz, ptz)
            lnx = jnp.where(is_sph_l, lnx, ltri_col(9))
            lny = jnp.where(is_sph_l, lny, ltri_col(10))
            lnz = jnp.where(is_sph_l, lnz, ltri_col(11))
        else:
            # stream-layout dummies (sample_light's no-mesh-light arm)
            state = _xs32(state)
            state = _xs32(state)
            state = _xs32(state)

        tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
        dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        d_d = jnp.maximum(dist, 1e-20)
        tlx, tly, tlz = tlx / d_d, tly / d_d, tlz / d_d
        ndotl = nx * tlx + ny * tly + nz * tlz
        nldotl = -(lnx * tlx + lny * tly + lnz * tlz)
        facing = (ndotl > 0.0) & (nldotl > 0.0)
        sneed = do_nee & facing
        solid = (nldotl * larea) / jnp.maximum(dist * dist, 1e-20)
        s_ = ndotl * solid
        nl_f = jnp.float32(num_lights)
        c_r = jnp.where(sneed, tpx * s_ * brdf_r * lem_r * nl_f * dw, 0.0)
        c_g = jnp.where(sneed, tpy * s_ * brdf_g * lem_g * nl_f * dw, 0.0)
        c_b = jnp.where(sneed, tpz * s_ * brdf_b * lem_b * nl_f * dw, 0.0)
        so_x = px + tlx * RAY_NUDGE
        so_y = py + tly * RAY_NUDGE
        so_z = pz + tlz * RAY_NUDGE
        stmax = dist - 2.0 * RAY_NUDGE
    else:
        sneed = jnp.zeros(shape, jnp.int32) != 0
        c_r = c_g = c_b = jnp.zeros(shape, jnp.float32)
        so_x = so_y = so_z = jnp.zeros(shape, jnp.float32)
        tlx = tly = tlz = jnp.zeros(shape, jnp.float32)
        stmax = jnp.zeros(shape, jnp.float32)

    # ---- Russian roulette (Main.cpp:468-475) ----
    if rr:
        surv = jnp.clip(
            jnp.maximum(jnp.maximum(alb_r, alb_g), alb_b), 0.1, 1.0
        )
        state = _xs32(state)
        r_rr = _u2f(state)
        die = active & (surv < r_rr)
        active = active & ~die
        tpx = jnp.where(active, tpx / surv, tpx)
        tpy = jnp.where(active, tpy / surv, tpy)
        tpz = jnp.where(active, tpz / surv, tpz)

    # ---- lobe selection (Main.cpp:478-570) ----
    state = _xs32(state)
    r_lobe = _u2f(state)
    sel_spec = active & (r_lobe < m_spec)
    sel_diel = active & ~sel_spec & (r_lobe < m_spec + m_refr)
    sel_diff = active & ~sel_spec & ~sel_diel

    ddn = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * nx * ddn
    rfy = dy - 2.0 * ny * ddn
    rfz = dz - 2.0 * nz * ddn

    cosi_raw = jnp.clip(ddn, -1.0, 1.0)
    outside = cosi_raw < 0.0
    inside = ~outside
    cosi = jnp.abs(cosi_raw)
    etai = jnp.where(outside, 1.0, m_ior)
    etat = jnp.where(outside, m_ior, 1.0)
    nrx = jnp.where(outside, nx, -nx)
    nry = jnp.where(outside, ny, -ny)
    nrz = jnp.where(outside, nz, -nz)
    eta = etai / etat
    kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = kk < 0.0
    coef = eta * cosi - jnp.sqrt(jnp.maximum(kk, 0.0))
    rx = dx * eta + coef * nrx
    ry = dy * eta + coef * nry
    rz = dz * eta + coef * nrz
    l_r = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    rx, ry, rz = rx / l_r, ry / l_r, rz / l_r
    angle_in = ddn
    angle_out = rx * nx + ry * ny + rz * nz
    s_pol = (etai * angle_in - etat * angle_out) / (
        etai * angle_in + etat * angle_out
    )
    p_pol = (etai * angle_out - etat * angle_in) / (
        etai * angle_out + etat * angle_in
    )
    fr = 0.5 * (s_pol * s_pol + p_pol * p_pol)
    fr = jnp.where(tir, 1.0, fr)
    state = _xs32(state)
    r_fr = _u2f(state)
    choose_refract = r_fr > fr

    # ---- diffuse bounce (Main.cpp:548-568) ----
    state = _xs32(state)
    u1 = _u2f(state)
    state = _xs32(state)
    u2 = _u2f(state)
    zz = 1.0 - 2.0 * u1
    rr2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
    phi = TWO_PI * u2
    ux = rr2 * jnp.cos(phi)
    uy = rr2 * jnp.sin(phi)
    uz = zz
    if cosine:
        # normalize_safe(normal + d, fallback=normal)
        wx, wy, wz = nx + ux, ny + uy, nz + uz
        len_sq = wx * wx + wy * wy + wz * wz
        ok_l = len_sq > 1e-20
        scale_l = jnp.where(
            ok_l, jax.lax.rsqrt(jnp.maximum(len_sq, 1e-20)), 0.0
        )
        dfx = jnp.where(ok_l, wx * scale_l, nx)
        dfy = jnp.where(ok_l, wy * scale_l, ny)
        dfz = jnp.where(ok_l, wz * scale_l, nz)
        ndotr = dfx * nx + dfy * ny + dfz * nz
        if ref_pdf:
            weight = ndotr / jnp.float32(1.0 / TWO_PI)
        else:
            weight = ndotr / (jnp.maximum(ndotr, 1e-6) / PI)
    else:
        fl2 = jnp.where(ux * nx + uy * ny + uz * nz < 0.0, -1.0, 1.0)
        dfx, dfy, dfz = ux * fl2, uy * fl2, uz * fl2
        ndotr = dfx * nx + dfy * ny + dfz * nz
        if ref_pdf:
            weight = ndotr / (jnp.maximum(ndotr, 1e-6) / PI)
        else:
            weight = ndotr / jnp.float32(1.0 / TWO_PI)

    ab_r = mat_col(M_ABSORB)
    ab_g = mat_col(M_ABSORB + 1)
    ab_b = mat_col(M_ABSORB + 2)
    beer_r = jnp.exp(-ab_r * t)
    beer_g = jnp.exp(-ab_g * t)
    beer_b = jnp.exp(-ab_b * t)

    diel_bounce = sel_diel & ~tir
    diel_refract = diel_bounce & choose_refract
    diel_reflect = diel_bounce & ~choose_refract

    ndir_x = jnp.where(sel_spec | diel_reflect, rfx, dx)
    ndir_y = jnp.where(sel_spec | diel_reflect, rfy, dy)
    ndir_z = jnp.where(sel_spec | diel_reflect, rfz, dz)
    ndir_x = jnp.where(diel_refract, rx, ndir_x)
    ndir_y = jnp.where(diel_refract, ry, ndir_y)
    ndir_z = jnp.where(diel_refract, rz, ndir_z)
    ndir_x = jnp.where(sel_diff, dfx, ndir_x)
    ndir_y = jnp.where(sel_diff, dfy, ndir_y)
    ndir_z = jnp.where(sel_diff, dfz, ndir_z)

    mul_any = sel_spec | diel_reflect | diel_refract
    tm_r = jnp.where(mul_any, alb_r, 1.0)
    tm_g = jnp.where(mul_any, alb_g, 1.0)
    tm_b = jnp.where(mul_any, alb_b, 1.0)
    ref_in = diel_refract & inside
    tm_r = jnp.where(ref_in, alb_r * beer_r, tm_r)
    tm_g = jnp.where(ref_in, alb_g * beer_g, tm_g)
    tm_b = jnp.where(ref_in, alb_b * beer_b, tm_b)
    tm_r = jnp.where(sel_diff, weight * brdf_r, tm_r)
    tm_g = jnp.where(sel_diff, weight * brdf_g, tm_g)
    tm_b = jnp.where(sel_diff, weight * brdf_b, tm_b)
    tpx = tpx * tm_r
    tpy = tpy * tm_g
    tpz = tpz * tm_b

    bounced = sel_spec | diel_bounce | sel_diff
    # specular flag tracked in i32: a where() with bool arms
    # lowers through an i8 vector Mosaic cannot truncate
    spec_i = jnp.where(
        sel_spec | diel_bounce, jnp.int32(1), is_spec.astype(jnp.int32)
    )
    spec_i = jnp.where(sel_diff, jnp.int32(0), spec_i)

    nox = jnp.where(bounced, px + ndir_x * RAY_NUDGE, ox)
    noy = jnp.where(bounced, py + ndir_y * RAY_NUDGE, oy)
    noz = jnp.where(bounced, pz + ndir_z * RAY_NUDGE, oz)
    ndx = jnp.where(bounced, ndir_x, dx)
    ndy = jnp.where(bounced, ndir_y, dy)
    ndz = jnp.where(bounced, ndir_z, dz)

    return (nox, noy, noz, ndx, ndy, ndz, state, tpx, tpy, tpz,
            enx, eny, enz, active, spec_i, sneed,
            so_x, so_y, so_z, tlx, tly, tlz, stmax, c_r, c_g, c_b)


def _analytic_occluded_nee(sph_ref, pln_ref, ox, oy, oz, dx, dy, dz,
                           tmax, sneed, occluded, num_sph, num_pln):
    """Fold the analytic sphere/plane occluders into the shadow-fan
    occlusion bit (Main.cpp:452-453's IntersectScene over analytic
    objects), op for op the loops of _shadow_resolve_kernel -- shared
    with the whole-frame path-tracing kernel."""
    for s in range(num_sph):
        cxs, cys, czs = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]
        rsq = sph_ref[s, S_RSQ]
        elx, ely, elz = cxs - ox, cys - oy, czs - oz
        tca = elx * dx + ely * dy + elz * dz
        d2 = (elx * elx + ely * ely + elz * elz) - tca * tca
        thc = jnp.sqrt(jnp.maximum(rsq - d2, 0.0))
        t0 = tca - thc
        t1 = tca + thc
        ts = jnp.where(t0 < 0.0, t1, t0)
        vs = (tca >= 0.0) & (d2 <= rsq) & (ts >= 0.0) & (ts < tmax)
        occluded = occluded | (vs & sneed)
    for p in range(num_pln):
        nxp, nyp, nzp = pln_ref[p, 3], pln_ref[p, 4], pln_ref[p, 5]
        pxp, pyp, pzp = pln_ref[p, 0], pln_ref[p, 1], pln_ref[p, 2]
        denom = dx * nxp + dy * nyp + dz * nzp
        den_ok = jnp.abs(denom) > PLANE_DENOM_EPS
        tp = ((pxp - ox) * nxp + (pyp - oy) * nyp + (pzp - oz) * nzp) / (
            jnp.where(den_ok, denom, 1.0)
        )
        vp = den_ok & (tp > 0.0) & (tp < tmax)
        occluded = occluded | (vp & sneed)
    return occluded


def _shade_extend_kernel(
    nodes_ref, ltris_ref, mats_ref, lights_ref, ltri_ref, sph_ref, pln_ref,
    sphmat_ref, plnmat_ref, objmat_ref, depth_ref,
    # [inst_inv/inst_nrm/inst_root when num_inst], 14 input columns,
    # 24 output columns, [iters_ref when count_iters], scratch
    *tail,
    roots, num_mats, num_lights, num_sph, num_pln, num_objs,
    nee, rr, cosine, ref_pdf, num_inst=0, count_iters=False,
    frame_stack=False, fused_nn=0, pipelined=False, nearest=False,
    interp=False, cond_push=False, width=WIDTH, with_pay=False, rowx=1,
    smem_mode=0, smem_nn=0, light_tri_meta=(),
):
    """One integrator depth minus the shadow resolve: traversal + the
    full TracePathAdvanced shading body (Source/Main.cpp:396-579).
    with_pay: nodes/ltris are the leaf-14 tables (bvh8.to_slim_occl)
    and the payload table (bvh8.occl_payload) rides as the next ref.
    rowx: wider packet rows (see _emit_traversal); the shading body is
    lane-elementwise so only the tile geometry changes."""
    i = 0
    ents_ref = None
    if smem_mode:
        ents_ref = tail[0]
        i = 1
    pay_ref = None
    if with_pay:
        pay_ref = tail[i]
        i += 1
    if num_inst:
        inst_inv_ref, inst_nrm_ref, inst_root_ref = tail[i : i + 3]
        i += 3
    else:
        inst_inv_ref = inst_nrm_ref = inst_root_ref = None
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        st_ref, tx_ref, ty_ref, tz_ref, ex_ref, ey_ref, ez_ref, fl_ref,
    ) = tail[i : i + 14]
    i += 14
    (
        nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
        nst_ref, ntx_ref, nty_ref, ntz_ref, nex_ref, ney_ref, nez_ref,
        nfl_ref,
        sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref, stm_ref,
        cx_ref, cy_ref, cz_ref,
    ) = tail[i : i + 24]
    i += 24
    if count_iters:
        iters_ref = tail[i]
        i += 1
    entry_ref, sptr_ref, stack_ref = tail[i : i + 3]
    i += 3
    if pipelined:
        entry2_ref = tail[i]
        i += 1
    else:
        entry2_ref = None
    if num_inst:
        rays_ref, iid_ref = tail[i : i + 2]
    else:
        rays_ref = iid_ref = None
    SUB = rowx
    NTILES = GROUPS // SUB
    TL = TILE * SUB
    shape = (ROWS * SUB, LANES)
    for g in range(NTILES):
        gs = slice(g * TL, (g + 1) * TL)
        act_i = fl_ref[gs] & 1
        any_act = jnp.sum(act_i) > 0
        if count_iters:
            # interpret mode blocks the iters output per grid step (its
            # CPU lowering lacks program_id; see traverse_packet_slim)
            iters_ref[g if interp else pl.program_id(0) * NTILES + g] = 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gs=gs):
            # dead sub-tile: pass everything through untouched, no
            # shadow work (sneed bit stays 0); per-lane RNG states
            # freeze, which is invisible (module docstring)
            nox_ref[gs] = ox_ref[gs]
            noy_ref[gs] = oy_ref[gs]
            noz_ref[gs] = oz_ref[gs]
            ndx_ref[gs] = dx_ref[gs]
            ndy_ref[gs] = dy_ref[gs]
            ndz_ref[gs] = dz_ref[gs]
            nst_ref[gs] = st_ref[gs]
            ntx_ref[gs] = tx_ref[gs]
            nty_ref[gs] = ty_ref[gs]
            ntz_ref[gs] = tz_ref[gs]
            nex_ref[gs] = ex_ref[gs]
            ney_ref[gs] = ey_ref[gs]
            nez_ref[gs] = ez_ref[gs]
            nfl_ref[gs] = fl_ref[gs] & 3  # sneed bit cleared
            sox_ref[gs] = jnp.zeros((TL,), jnp.float32)
            soy_ref[gs] = jnp.zeros((TL,), jnp.float32)
            soz_ref[gs] = jnp.zeros((TL,), jnp.float32)
            sdx_ref[gs] = jnp.zeros((TL,), jnp.float32)
            sdy_ref[gs] = jnp.zeros((TL,), jnp.float32)
            sdz_ref[gs] = jnp.zeros((TL,), jnp.float32)
            stm_ref[gs] = jnp.zeros((TL,), jnp.float32)
            cx_ref[gs] = jnp.zeros((TL,), jnp.float32)
            cy_ref[gs] = jnp.zeros((TL,), jnp.float32)
            cz_ref[gs] = jnp.zeros((TL,), jnp.float32)

        @pl.when(any_act)
        def _live(g=g, gs=gs):
            ox = ox_ref[gs].reshape(shape)
            oy = oy_ref[gs].reshape(shape)
            oz = oz_ref[gs].reshape(shape)
            dx = dx_ref[gs].reshape(shape)
            dy = dy_ref[gs].reshape(shape)
            dz = dz_ref[gs].reshape(shape)
            state = st_ref[gs].reshape(shape)
            tpx = tx_ref[gs].reshape(shape)
            tpy = ty_ref[gs].reshape(shape)
            tpz = tz_ref[gs].reshape(shape)
            enx = ex_ref[gs].reshape(shape)
            eny = ey_ref[gs].reshape(shape)
            enz = ez_ref[gs].reshape(shape)
            flags = fl_ref[gs].reshape(shape)
            active = (flags & 1) != 0
            is_spec = (flags & 2) != 0
            # scalar->vector staging via an i32 broadcast: mixing a
            # scalar i1 into vector boolean ops trips Mosaic's i8->i1
            # truncation (same family as the vector-select-on-scalar-
            # predicate trap)
            depth0 = jnp.full(shape, depth_ref[0], jnp.int32) == 0

            t_init = jnp.full(shape, RAY_TMAX, jnp.float32)
            trav = _emit_traversal(
                nodes_ref, ltris_ref, entry_ref, sptr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, active, t_init, roots,
                any_hit=False, count_iters=count_iters,
                num_inst=num_inst, iid_ref=iid_ref, rays_ref=rays_ref,
                inst_inv_ref=inst_inv_ref, inst_root_ref=inst_root_ref,
                frame_stack=frame_stack, fused_nn=fused_nn,
                pipelined=pipelined, entry2_ref=entry2_ref,
                nearest=nearest, cond_push=cond_push, width=width,
                occl=with_pay, pay_ref=pay_ref, rowx=rowx,
                ents_ref=ents_ref, smem_mode=smem_mode, smem_nn=smem_nn,
            )
            t, tri, obj, mnx, mny, mnz = trav[:6]
            if count_iters:
                iters_ref[
                    g if interp else pl.program_id(0) * NTILES + g
                ] = trav[-1]
            if num_inst:
                # world normal = (inv M)^T @ n_object, normalized --
                # the same explicit arithmetic as hit_surface
                # (models/scene.py), so interpret mode stays bitwise
                hiid = trav[6]
                mrow = []
                for c9 in range(9):
                    v = jnp.full(shape, inst_nrm_ref[0, c9], jnp.float32)
                    for ii in range(1, num_inst):
                        v = jnp.where(hiid == ii, inst_nrm_ref[ii, c9], v)
                    mrow.append(v)
                wx = mrow[0] * mnx + mrow[1] * mny + mrow[2] * mnz
                wy = mrow[3] * mnx + mrow[4] * mny + mrow[5] * mnz
                wz = mrow[6] * mnx + mrow[7] * mny + mrow[8] * mnz
                wl = jnp.sqrt(wx * wx + wy * wy + wz * wz)
                winst = (hiid >= 0) & (wl > 0.0)
                wls = jnp.where(winst, wl, 1.0)
                mnx = jnp.where(winst, wx / wls, mnx)
                mny = jnp.where(winst, wy / wls, mny)
                mnz = jnp.where(winst, wz / wls, mnz)
            (
                nox, noy, noz, ndx, ndy, ndz, state, tpx, tpy, tpz,
                enx, eny, enz, active, spec_i, sneed,
                so_x, so_y, so_z, tlx, tly, tlz, stmax, c_r, c_g, c_b,
            ) = _shade_surface(
                mats_ref, lights_ref, sph_ref, pln_ref, sphmat_ref,
                plnmat_ref, objmat_ref,
                ox, oy, oz, dx, dy, dz, state, tpx, tpy, tpz,
                enx, eny, enz, active, is_spec, depth0,
                t, tri, obj, mnx, mny, mnz,
                num_mats=num_mats, num_lights=num_lights,
                num_sph=num_sph, num_pln=num_pln, num_objs=num_objs,
                nee=nee, rr=rr, cosine=cosine, ref_pdf=ref_pdf,
                ltri_ref=ltri_ref, light_tri_meta=light_tri_meta,
            )

            nflags = (
                active.astype(jnp.int32)
                | (spec_i << 1)
                | (sneed.astype(jnp.int32) << 2)
            )

            nox_ref[gs] = nox.reshape(-1)
            noy_ref[gs] = noy.reshape(-1)
            noz_ref[gs] = noz.reshape(-1)
            ndx_ref[gs] = ndx.reshape(-1)
            ndy_ref[gs] = ndy.reshape(-1)
            ndz_ref[gs] = ndz.reshape(-1)
            nst_ref[gs] = state.reshape(-1)
            ntx_ref[gs] = tpx.reshape(-1)
            nty_ref[gs] = tpy.reshape(-1)
            ntz_ref[gs] = tpz.reshape(-1)
            nex_ref[gs] = enx.reshape(-1)
            ney_ref[gs] = eny.reshape(-1)
            nez_ref[gs] = enz.reshape(-1)
            nfl_ref[gs] = nflags.reshape(-1)
            sox_ref[gs] = so_x.reshape(-1)
            soy_ref[gs] = so_y.reshape(-1)
            soz_ref[gs] = so_z.reshape(-1)
            sdx_ref[gs] = tlx.reshape(-1)
            sdy_ref[gs] = tly.reshape(-1)
            sdz_ref[gs] = tlz.reshape(-1)
            stm_ref[gs] = jnp.where(sneed, stmax, 0.0).reshape(-1)
            cx_ref[gs] = c_r.reshape(-1)
            cy_ref[gs] = c_g.reshape(-1)
            cz_ref[gs] = c_b.reshape(-1)


def _shadow_resolve_kernel(
    nodes_ref, ltris_ref, sph_ref, pln_ref,
    # [inst_inv/inst_root when num_inst], 14 input columns, 3 output
    # columns, [iters_ref when count_iters], scratch
    *tail,
    roots, num_sph, num_pln, num_inst=0, count_iters=False,
    frame_stack=False, fused_nn=0, pipelined=False, nearest=False,
    interp=False, cond_push=False, width=WIDTH, occl=False, rowx=1,
    smem_mode=0, smem_nn=0, occl_rows=1,
):
    """NEE shadow any-hit + energy resolve (Main.cpp:452-463)."""
    i = 0
    ents_ref = None
    if smem_mode:
        ents_ref = tail[0]
        i = 1
    if num_inst:
        inst_inv_ref, inst_root_ref = tail[i : i + 2]
        i += 2
    else:
        inst_inv_ref = inst_root_ref = None
    (
        sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref, stm_ref,
        fl_ref, ex_ref, ey_ref, ez_ref, cx_ref, cy_ref, cz_ref,
    ) = tail[i : i + 14]
    i += 14
    nex_ref, ney_ref, nez_ref = tail[i : i + 3]
    i += 3
    if count_iters:
        iters_ref = tail[i]
        i += 1
    entry_ref, sptr_ref, stack_ref = tail[i : i + 3]
    i += 3
    if pipelined:
        entry2_ref = tail[i]
        i += 1
    else:
        entry2_ref = None
    if num_inst:
        rays_ref, iid_ref = tail[i : i + 2]
    else:
        rays_ref = iid_ref = None
    SUB = rowx
    NTILES = GROUPS // SUB
    TL = TILE * SUB
    shape = (ROWS * SUB, LANES)
    for g in range(NTILES):
        gs = slice(g * TL, (g + 1) * TL)
        sneed_i = (fl_ref[gs] >> 2) & 1
        any_s = jnp.sum(sneed_i) > 0
        if count_iters:
            # interpret mode: per-step blocked (see traverse_packet_slim)
            iters_ref[g if interp else pl.program_id(0) * NTILES + g] = 0

        @pl.when(jnp.logical_not(any_s))
        def _dead(gs=gs):
            nex_ref[gs] = ex_ref[gs]
            ney_ref[gs] = ey_ref[gs]
            nez_ref[gs] = ez_ref[gs]

        @pl.when(any_s)
        def _live(g=g, gs=gs):
            ox = sox_ref[gs].reshape(shape)
            oy = soy_ref[gs].reshape(shape)
            oz = soz_ref[gs].reshape(shape)
            dx = sdx_ref[gs].reshape(shape)
            dy = sdy_ref[gs].reshape(shape)
            dz = sdz_ref[gs].reshape(shape)
            tmax = stm_ref[gs].reshape(shape)
            sneed = ((fl_ref[gs].reshape(shape) >> 2) & 1) != 0

            trav = _emit_traversal(
                nodes_ref, ltris_ref, entry_ref, sptr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, sneed, tmax, roots,
                any_hit=True, count_iters=count_iters,
                num_inst=num_inst, iid_ref=iid_ref, rays_ref=rays_ref,
                inst_inv_ref=inst_inv_ref, inst_root_ref=inst_root_ref,
                frame_stack=frame_stack, fused_nn=fused_nn,
                pipelined=pipelined, entry2_ref=entry2_ref,
                nearest=nearest, cond_push=cond_push, width=width,
                occl=occl, rowx=rowx,
                ents_ref=ents_ref, smem_mode=smem_mode, smem_nn=smem_nn,
                occl_rows=occl_rows,
            )
            t, tri = trav[0], trav[1]
            if count_iters:
                iters_ref[
                    g if interp else pl.program_id(0) * NTILES + g
                ] = trav[-1]
            occluded = _analytic_occluded_nee(
                sph_ref, pln_ref, ox, oy, oz, dx, dy, dz, tmax, sneed,
                tri >= 0, num_sph, num_pln,
            )

            add = sneed & ~occluded
            nex_ref[gs] = (
                ex_ref[gs].reshape(shape) + jnp.where(add, cx_ref[gs].reshape(shape), 0.0)
            ).reshape(-1)
            ney_ref[gs] = (
                ey_ref[gs].reshape(shape) + jnp.where(add, cy_ref[gs].reshape(shape), 0.0)
            ).reshape(-1)
            nez_ref[gs] = (
                ez_ref[gs].reshape(shape) + jnp.where(add, cz_ref[gs].reshape(shape), 0.0)
            ).reshape(-1)


def _pad_to(step, arrs, pad_vals):
    n0 = arrs[0].shape[0]
    n = -(-n0 // step) * step
    if n == n0:
        return n, arrs
    pad = n - n0
    out = []
    for a, v in zip(arrs, pad_vals):
        out.append(jnp.concatenate([a, jnp.full((pad,), v, a.dtype)]))
    return n, out


@functools.partial(
    jax.jit,
    static_argnames=(
        "roots", "num_mats", "num_lights", "num_sph", "num_pln", "num_objs",
        "nee", "rr", "cosine", "ref_pdf", "interpret", "count_iters",
        "frame_stack", "fused_nn", "pipelined", "nearest", "cond_push",
        "width", "rowx", "light_tri_meta",
    ),
)
def shade_extend(
    nodes, ltris, mats, lights, ltri, sph, pln, sphmat, plnmat, objmat,
    depth,
    rays, state, throughput, energy, flags,
    *, roots, num_mats, num_lights, num_sph, num_pln, num_objs,
    nee, rr, cosine, ref_pdf, interpret=False, count_iters=False,
    inst_inv=None, inst_nrm=None, inst_root=None, frame_stack=None,
    fused_nn=0, pipelined=None, nearest=None, cond_push=None, width=8,
    pay=None, rowx=None, ents=None, light_tri_meta=(),
):
    """One fused depth step (minus shadow resolve) over the wavefront.

    rays: 6-tuple of (N,) components; throughput/energy: 3-tuples;
    state (N,) u32; flags (N,) i32 bit0=active bit1=is_specular.
    Returns (rays', state', throughput', energy', flags' (bit2 =
    shadow_needed), shadow_o (3), shadow_d (3), shadow_tmax, contrib (3)
    [, per-sub-tile traversal iteration counts when count_iters]).

    With inst_inv (I, 12) / inst_nrm (I, 9) / inst_root (I,) given, the
    traversal runs the TLAS instance machinery and the epilogue
    transforms object-space normals to world before shading.
    """
    step = GROUPS * TILE
    cols = list(rays) + [state] + list(throughput) + list(energy) + [flags]
    pads = [1.0] * 6 + [0] + [0.0] * 6 + [0]
    n, cols = _pad_to(step, cols, pads)
    num_steps = n // step
    num_inst = int(inst_inv.shape[0]) if inst_inv is not None else 0
    if num_inst and fused_nn:
        raise ValueError("fused packet tables do not support the instance "
                         "machinery (flattened scenes may fuse)")
    if pay is not None and (num_inst or fused_nn or width != 8):
        raise ValueError(
            "leaf-14 tables (bvh8.to_slim_occl + occl_payload) require "
            "the plain non-instanced 8-wide split-table kernel")
    frame_stack, nearest = _resolve_width_flags(
        width, num_inst, frame_stack, nearest, any_hit=False)
    if pipelined is None:
        pipelined = PIPELINED_DEFAULT and not num_inst
    elif pipelined and num_inst:
        raise ValueError(
            "pipelined packet body does not support the instance "
            "machinery (flatten the scene)")
    if cond_push is None:
        cond_push = CONDPUSH_DEFAULT and frame_stack
    rowx = _resolve_rowx(rowx, num_inst, fused_nn, width, nearest)
    ents, smem_mode, smem_nn = _resolve_smem(
        ents, nodes, roots, frame_stack, num_inst, fused_nn, width, rowx)
    _check_table_width(nodes, width, fused_nn, smem_mode)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 9
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if smem_mode else [])
        + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if pay is not None else [])
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 if num_inst else [])
        + [pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)] * 14
    )
    # FLAT 1-D layout: see traverse_packet_slim._smem_pop
    ents_inputs = ((ents.astype(jnp.int32).reshape(-1),)
                   if smem_mode else ())
    pay_inputs = (pay,) if pay is not None else ()
    inst_inputs = (inst_inv, inst_nrm, inst_root) if num_inst else ()
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 24
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct((n,), f32)] * 6
        + [jax.ShapeDtypeStruct((n,), jnp.uint32)]
        + [jax.ShapeDtypeStruct((n,), f32)] * 6
        + [jax.ShapeDtypeStruct((n,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n,), f32)] * 10
    )
    if count_iters:
        # whole array per step (rank-1 SMEM blocks can't be tile-blocked
        # on compiled TPU); each step writes its GROUPS slots.  Interpret
        # mode must block it per step (no program_id on CPU).
        if interpret:
            out_specs.append(pl.BlockSpec(
                (GROUPS // rowx,), lambda i: (i,), memory_space=pltpu.SMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_steps * (GROUPS // rowx),), jnp.int32)
        )
    scratch = [
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM(
            (ROWS,
             ((2 if smem_mode else width + 1) * FSTACK_FRAMES
              if frame_stack else STACK)),
            jnp.int32,
        ),
    ]
    if pipelined:
        scratch.append(pltpu.SMEM((ROWS,), jnp.int32))  # entry2 (next)
    if num_inst:
        scratch += [
            pltpu.VMEM((9 * ROWS, LANES), jnp.float32),
            pltpu.SMEM((ROWS,), jnp.int32),
        ]
    res = pl.pallas_call(
        functools.partial(
            _shade_extend_kernel,
            roots=tuple(int(r) for r in roots),
            num_mats=num_mats, num_lights=num_lights,
            num_sph=num_sph, num_pln=num_pln, num_objs=num_objs,
            nee=nee, rr=rr, cosine=cosine, ref_pdf=ref_pdf,
            num_inst=num_inst, count_iters=count_iters,
            frame_stack=frame_stack, fused_nn=fused_nn,
            pipelined=pipelined, nearest=nearest and frame_stack,
            interp=interpret, cond_push=cond_push and frame_stack,
            width=width, with_pay=pay is not None, rowx=rowx,
            smem_mode=smem_mode, smem_nn=smem_nn,
            light_tri_meta=tuple(light_tri_meta),
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes, ltris, mats, lights, ltri, sph, pln, sphmat, plnmat, objmat,
      depth,
      *ents_inputs, *pay_inputs, *inst_inputs, *cols)
    n0 = rays[0].shape[0]
    iters = res[24] if count_iters else None
    res = [r[:n0] for r in res[:24]]
    out = (
        tuple(res[0:3]) + tuple(res[3:6]), res[6],
        tuple(res[7:10]), tuple(res[10:13]), res[13],
        tuple(res[14:17]), tuple(res[17:20]), res[20], tuple(res[21:24]),
    )
    if count_iters:
        return out + (iters,)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("roots", "num_sph", "num_pln", "interpret",
                     "count_iters", "frame_stack", "fused_nn", "pipelined",
                     "cond_push",
                     "nearest", "width", "occl", "rowx", "occl_rows"),
)
def shadow_resolve(
    nodes, ltris, sph, pln,
    shadow_o, shadow_d, shadow_tmax, flags, energy, contrib,
    *, roots, num_sph, num_pln, interpret=False, count_iters=False,
    inst_inv=None, inst_root=None, frame_stack=None, fused_nn=0,
    pipelined=None, nearest=None, cond_push=None, width=8, occl=False,
    rowx=None, ents=None, occl_rows=1,
):
    """Shadow any-hit + NEE energy add.  Returns energy' (3-tuple)
    (plus per-sub-tile iteration counts when count_iters).  inst_inv /
    inst_root enable TLAS instance occluders.  occl=True traverses
    occlusion-specialized tables (bvh8.to_slim_occl: 14 bare triangle
    records per leaf row) -- bitwise-identical energy, fewer
    iterations on shadow fans."""
    step = GROUPS * TILE
    cols = (
        list(shadow_o) + list(shadow_d) + [shadow_tmax, flags]
        + list(energy) + list(contrib)
    )
    pads = [0.0] * 7 + [0] + [0.0] * 6
    n, cols = _pad_to(step, cols, pads)
    num_steps = n // step
    num_inst = int(inst_inv.shape[0]) if inst_inv is not None else 0
    if num_inst and fused_nn:
        raise ValueError("fused packet tables do not support the instance "
                         "machinery (flattened scenes may fuse)")
    if occl and (num_inst or fused_nn or width not in (8, 16)):
        raise ValueError(
            "occlusion tables require the plain non-instanced "
            "split-table kernel (width 8 or 16)")
    if occl_rows == 2 and not occl:
        raise ValueError("occl_rows=2 (CPUGPU_OCCL2) requires occl tables")
    frame_stack, nearest = _resolve_width_flags(
        width, num_inst, frame_stack, nearest, any_hit=True)
    if pipelined is None:
        pipelined = PIPELINED_DEFAULT and not num_inst
    elif pipelined and num_inst:
        raise ValueError(
            "pipelined packet body does not support the instance "
            "machinery (flatten the scene)")
    if cond_push is None:
        cond_push = CONDPUSH_DEFAULT and frame_stack
    rowx = _resolve_rowx(rowx, num_inst, fused_nn, width, nearest)
    ents, smem_mode, smem_nn = _resolve_smem(
        ents, nodes, roots, frame_stack, num_inst, fused_nn, width, rowx)
    _check_table_width(nodes, width, fused_nn, smem_mode)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if smem_mode else [])
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 if num_inst else [])
        + [pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)] * 14
    )
    # FLAT 1-D layout: see traverse_packet_slim._smem_pop
    ents_inputs = ((ents.astype(jnp.int32).reshape(-1),)
                   if smem_mode else ())
    inst_inputs = (inst_inv, inst_root) if num_inst else ()
    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 3
    out_shape = [jax.ShapeDtypeStruct((n,), jnp.float32)] * 3
    if count_iters:
        if interpret:  # see the shade kernel's note
            out_specs.append(pl.BlockSpec(
                (GROUPS // rowx,), lambda i: (i,), memory_space=pltpu.SMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_steps * (GROUPS // rowx),), jnp.int32)
        )
    scratch = [
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM(
            (ROWS,
             ((2 if smem_mode else width + 1) * FSTACK_FRAMES
              if frame_stack else STACK)),
            jnp.int32,
        ),
    ]
    if pipelined:
        scratch.append(pltpu.SMEM((ROWS,), jnp.int32))  # entry2 (next)
    if num_inst:
        scratch += [
            pltpu.VMEM((9 * ROWS, LANES), jnp.float32),
            pltpu.SMEM((ROWS,), jnp.int32),
        ]
    res = pl.pallas_call(
        functools.partial(
            _shadow_resolve_kernel,
            roots=tuple(int(r) for r in roots),
            num_sph=num_sph, num_pln=num_pln,
            num_inst=num_inst, count_iters=count_iters,
            frame_stack=frame_stack, fused_nn=fused_nn,
            pipelined=pipelined, nearest=nearest and frame_stack,
            interp=interpret, cond_push=cond_push and frame_stack,
            width=width, occl=occl, rowx=rowx,
            smem_mode=smem_mode, smem_nn=smem_nn, occl_rows=occl_rows,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes, ltris, sph, pln, *ents_inputs, *inst_inputs, *cols)
    n0 = shadow_o[0].shape[0]
    if count_iters:
        return tuple(r[:n0] for r in res[:3]) + (res[3],)
    return tuple(r[:n0] for r in res)
