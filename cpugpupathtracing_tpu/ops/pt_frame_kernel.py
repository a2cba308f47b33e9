"""Whole-frame Pallas kernel for the ADVANCED path tracer on
small-BVH scenes.

The per-depth megakernel pipeline (ops/megakernel.py) still pays a
per-depth skeleton the reference's recursion never does
(Source/Main.cpp:691-755 dispatches per PIXEL; each recursion level is
free): every depth boundary materializes the ~14-column wavefront carry
to HBM, re-sorts it, and launches two fresh kernels.  On the round-4
chip that skeleton was config 2's whole 84 ms frame (~48 ms shade
launches + 27 ms sorts + 20 ms shadow for a ~217-row tree) -- 25x off
what the analytic whole-frame treatment achieved on config 1
(ops/whitted_kernel.py, 218 Mrays/s).

This kernel runs the ENTIRE advanced trace -- every depth, the packet
BVH traversal, the full TracePathAdvanced shading body, the NEE shadow
any-hit and energy resolve -- inside ONE Pallas launch.  Rays live in
registers for the whole frame; the BVH tables live in VMEM (and the
entry side tables in SMEM) across all depths; HBM traffic collapses to
one read of (origin, direction, rng state) and one write of
(energy, state, traced) per lane.  Per 1024-lane sub-tile the depth
loop is a while-loop that exits as soon as every lane has terminated --
the in-kernel analog of the megakernel's all-dead sub-tile skip, at the
same 1024-lane granularity.  There is NO wavefront sorting: lanes keep
their camera-blocked order for the whole frame, which costs extra
traversal iterations on scattered fans -- affordable exactly when the
tree is small (a handful of iterations per ray), which is what the
activation gate (scene.pt_frame_active) checks.

Exactness: the traversal is ops/megakernel._emit_traversal and the
shading body is ops/megakernel._shade_surface -- the SAME functions the
per-depth megakernels emit -- so every RNG draw, predicate, epsilon,
and f32 association is shared op for op.  In interpret mode the
energy/state/traced outputs are bitwise-identical per lane to
trace_advanced / trace_advanced_mega without sorting
(tests/test_pt_frame.py pins it); on the compiled path only
transcendental ULPs may differ (the megakernel contract).

Gating (scene.pt_frame_active): packet fast path, split 8-wide tables,
no instance machinery, sphere lights only, no AOVs, tree small enough
that unsorted traversal stays cheap (CPUGPU_PTFRAME_MAX_NODES).
First Mosaic compile happens in production; the renderer's
_guarded_frame_kernel falls back to the per-depth path process-wide on
a compile failure (scene.disable_pt_frame_kernel).

Reference parity: TracePathAdvanced, Source/Main.cpp:396-579; the
zero-cost-per-bounce recursion this kernel matches is Main.cpp:691-755.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.ops.traverse_packet_slim import (
    FSTACK_FRAMES,
    PIPELINED_DEFAULT,
    CONDPUSH_DEFAULT,
    _check_table_width,
    _resolve_smem,
    _resolve_width_flags,
)
from cpugpupathtracing_tpu.ops.megakernel import (
    GROUPS,
    LANES,
    RAY_TMAX,
    ROWS,
    STACK,
    TILE,
    _analytic_occluded_nee,
    _emit_traversal,
    _pad_to,
    _shade_surface,
)


def _pt_frame_kernel(
    nodes_ref, ltris_ref,
    # [sh_nodes/sh_ltris when sep_shadow], 7 SMEM scene tables,
    # [ents when smem_mode] [sh_ents when sh_smem_mode],
    # 8 input columns, 5 output columns, scratch
    *tail,
    roots, sh_roots, num_mats, num_lights, num_sph, num_pln, num_objs,
    nee, rr, cosine, ref_pdf, depths,
    frame_stack, fused_nn, pipelined, nearest, cond_push, width,
    smem_mode, smem_nn, sh_smem_mode, sh_smem_nn,
    sep_shadow, occl, occl_rows, count_iters, interp, light_tri_meta,
    depth_base, has_carry_in, carry_out,
):
    i = 0
    if sep_shadow:
        shn_ref, shl_ref = tail[i : i + 2]
        i += 2
    else:
        shn_ref, shl_ref = nodes_ref, ltris_ref
    (
        mats_ref, lights_ref, ltri_ref, sph_ref, pln_ref,
        sphmat_ref, plnmat_ref, objmat_ref,
    ) = tail[i : i + 8]
    i += 8
    ents_ref = None
    if smem_mode:
        ents_ref = tail[i]
        i += 1
    sh_ents_ref = None
    if sh_smem_mode:
        sh_ents_ref = tail[i]
        i += 1
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, st_ref, act_ref,
    ) = tail[i : i + 8]
    i += 8
    if has_carry_in:
        (
            tx_ref, ty_ref, tz_ref, iex_ref, iey_ref, iez_ref, sp_ref,
        ) = tail[i : i + 7]
        i += 7
    if carry_out:
        (
            nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
            ost_ref, ntx_ref, nty_ref, ntz_ref,
            ex_ref, ey_ref, ez_ref, nfl_ref, tr_ref,
        ) = tail[i : i + 15]
        i += 15
    else:
        ex_ref, ey_ref, ez_ref, ost_ref, tr_ref = tail[i : i + 5]
        i += 5
    if count_iters:
        iters_ref = tail[i]
        i += 1
    entry_ref, sptr_ref, stack_ref = tail[i : i + 3]
    i += 3
    entry2_ref = tail[i] if pipelined else None

    shape = (ROWS, LANES)
    f32 = jnp.float32

    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)

        def depth_body(c):
            (d, ox, oy, oz, dx, dy, dz, state, tpx, tpy, tpz,
             enx, eny, enz, act, spec, tr) = c[:17]
            if count_iters:
                it_c, it_s = c[17], c[18]
            act_b = act != 0
            is_spec = spec != 0
            # traced += active at depth start (trace_advanced body)
            tr = tr + act

            t_init = jnp.full(shape, RAY_TMAX, f32)
            trav = _emit_traversal(
                nodes_ref, ltris_ref, entry_ref, sptr_ref, stack_ref,
                ox, oy, oz, dx, dy, dz, act_b, t_init, roots,
                any_hit=False, count_iters=count_iters,
                frame_stack=frame_stack,
                fused_nn=fused_nn, pipelined=pipelined,
                entry2_ref=entry2_ref, nearest=nearest,
                cond_push=cond_push, width=width,
                ents_ref=ents_ref, smem_mode=smem_mode, smem_nn=smem_nn,
            )
            t, tri, obj, mnx, mny, mnz = trav[:6]
            if count_iters:
                it_c = it_c + trav[6]

            depth0 = (jnp.zeros(shape, jnp.int32) + d + depth_base) == 0
            (
                nox, noy, noz, ndx, ndy, ndz, state, tpx, tpy, tpz,
                enx, eny, enz, active, spec_i, sneed,
                so_x, so_y, so_z, tlx, tly, tlz, stmax, c_r, c_g, c_b,
            ) = _shade_surface(
                mats_ref, lights_ref, sph_ref, pln_ref, sphmat_ref,
                plnmat_ref, objmat_ref,
                ox, oy, oz, dx, dy, dz, state, tpx, tpy, tpz,
                enx, eny, enz, act_b, is_spec, depth0,
                t, tri, obj, mnx, mny, mnz,
                num_mats=num_mats, num_lights=num_lights,
                num_sph=num_sph, num_pln=num_pln, num_objs=num_objs,
                nee=nee, rr=rr, cosine=cosine, ref_pdf=ref_pdf,
                ltri_ref=ltri_ref, light_tri_meta=light_tri_meta,
            )

            if nee:
                tr = tr + sneed.astype(jnp.int32)
                stm = jnp.where(sneed, stmax, 0.0)
                shtrav = _emit_traversal(
                    shn_ref, shl_ref, entry_ref, sptr_ref, stack_ref,
                    so_x, so_y, so_z, tlx, tly, tlz, sneed, stm,
                    sh_roots, any_hit=True, count_iters=count_iters,
                    frame_stack=frame_stack,
                    fused_nn=0 if sep_shadow else fused_nn,
                    pipelined=pipelined, entry2_ref=entry2_ref,
                    nearest=nearest, cond_push=cond_push,
                    width=8 if sep_shadow else width, occl=occl,
                    ents_ref=sh_ents_ref, smem_mode=sh_smem_mode,
                    smem_nn=sh_smem_nn, occl_rows=occl_rows,
                )
                if count_iters:
                    it_s = it_s + shtrav[-1]
                occluded = _analytic_occluded_nee(
                    sph_ref, pln_ref, so_x, so_y, so_z, tlx, tly, tlz,
                    stm, sneed, shtrav[1] >= 0, num_sph, num_pln,
                )
                add = sneed & ~occluded
                enx = enx + jnp.where(add, c_r, 0.0)
                eny = eny + jnp.where(add, c_g, 0.0)
                enz = enz + jnp.where(add, c_b, 0.0)

            out = (d + 1, nox, noy, noz, ndx, ndy, ndz, state,
                   tpx, tpy, tpz, enx, eny, enz,
                   active.astype(jnp.int32), spec_i, tr)
            if count_iters:
                out = out + (it_c, it_s)
            return out

        def depth_cond(c):
            # c[14] is the i32 active mask: the sub-tile's depth loop
            # ends as soon as every lane has terminated
            return (c[0] < depths) & (jnp.sum(c[14]) > 0)

        if has_carry_in:
            tp0 = (tx_ref[gs].reshape(shape), ty_ref[gs].reshape(shape),
                   tz_ref[gs].reshape(shape))
            en0 = (iex_ref[gs].reshape(shape), iey_ref[gs].reshape(shape),
                   iez_ref[gs].reshape(shape))
            sp0 = sp_ref[gs].reshape(shape)
        else:
            tp0 = (jnp.ones(shape, f32), jnp.ones(shape, f32),
                   jnp.ones(shape, f32))
            en0 = (jnp.zeros(shape, f32), jnp.zeros(shape, f32),
                   jnp.zeros(shape, f32))
            sp0 = jnp.zeros(shape, jnp.int32)
        init = (
            jnp.int32(0),
            ox_ref[gs].reshape(shape), oy_ref[gs].reshape(shape),
            oz_ref[gs].reshape(shape),
            dx_ref[gs].reshape(shape), dy_ref[gs].reshape(shape),
            dz_ref[gs].reshape(shape),
            st_ref[gs].reshape(shape),
            tp0[0], tp0[1], tp0[2],
            en0[0], en0[1], en0[2],
            act_ref[gs].reshape(shape),
            sp0,
            jnp.zeros(shape, jnp.int32),
        )
        if count_iters:
            init = init + (jnp.int32(0), jnp.int32(0))
        out = jax.lax.while_loop(depth_cond, depth_body, init)
        if carry_out:
            nox_ref[gs] = out[1].reshape(-1)
            noy_ref[gs] = out[2].reshape(-1)
            noz_ref[gs] = out[3].reshape(-1)
            ndx_ref[gs] = out[4].reshape(-1)
            ndy_ref[gs] = out[5].reshape(-1)
            ndz_ref[gs] = out[6].reshape(-1)
            ntx_ref[gs] = out[8].reshape(-1)
            nty_ref[gs] = out[9].reshape(-1)
            ntz_ref[gs] = out[10].reshape(-1)
            nfl_ref[gs] = (out[14] | (out[15] << 1)).reshape(-1)
        ex_ref[gs] = out[11].reshape(-1)
        ey_ref[gs] = out[12].reshape(-1)
        ez_ref[gs] = out[13].reshape(-1)
        ost_ref[gs] = out[7].reshape(-1)
        tr_ref[gs] = out[16].reshape(-1)
        if count_iters:
            # closest-hit and shadow iteration totals per sub-tile,
            # interleaved [2g] / [2g + 1] (interpret: per-step blocked,
            # see ops/megakernel.py's count_iters note)
            base = (2 * g if interp
                    else pl.program_id(0) * 2 * GROUPS + 2 * g)
            iters_ref[base] = out[17]
            iters_ref[base + 1] = out[18]


@functools.partial(
    jax.jit,
    static_argnames=(
        "roots", "sh_roots", "num_mats", "num_lights", "num_sph",
        "num_pln", "num_objs", "nee", "rr", "cosine", "ref_pdf",
        "depths", "interpret", "frame_stack", "fused_nn", "pipelined",
        "nearest", "cond_push", "width", "occl", "occl_rows",
        "count_iters", "light_tri_meta", "depth_base", "carry_out",
    ),
)
def pt_frame(
    nodes, ltris, mats, lights, ltri, sph, pln, sphmat, plnmat, objmat,
    rays, state,
    *, roots, num_mats, num_lights, num_sph, num_pln, num_objs,
    nee, rr, cosine, ref_pdf, depths, interpret=False,
    frame_stack=None, fused_nn=0, pipelined=None, nearest=None,
    cond_push=None, width=8, ents=None,
    sh_nodes=None, sh_ltris=None, sh_roots=None, sh_ents=None,
    occl=False, occl_rows=1, count_iters=False, light_tri_meta=(),
    depth_base=0, carry_in=None, carry_out=False,
):
    """Full advanced path trace in one launch.

    rays: 6-tuple of (N,) ray components; state (N,) u32.  sh_* pass
    the occlusion-specialized any-hit tables (bvh8.to_slim_occl) for
    the NEE shadow fan; when absent the shadow fan walks the shading
    tables.  Returns (energy (N, 3) f32, state' (N,) u32, traced ()
    i32 [, per-sub-tile (closest, shadow) iteration counts interleaved
    when count_iters]) -- per-lane bitwise equal to the unsorted
    megakernel path in interpret mode.

    Span mode (the split-frame schedule): depths counts THIS span's
    depths, depth_base offsets the NEE double-count guard's depth-0
    test; carry_in=(throughput3, energy3, flags) seeds the carry from a
    previous span; carry_out=True returns the full carry instead:
    (rays6, state, throughput3, energy3, flags, traced).
    """
    frame_stack, nearest = _resolve_width_flags(
        width, 0, frame_stack, nearest, any_hit=False)
    if pipelined is None:
        pipelined = PIPELINED_DEFAULT
    if cond_push is None:
        cond_push = CONDPUSH_DEFAULT and frame_stack
    ents, smem_mode, smem_nn = _resolve_smem(
        ents, nodes, roots, frame_stack, 0, fused_nn, width, 1)
    _check_table_width(nodes, width, fused_nn, smem_mode)
    sep_shadow = sh_nodes is not None
    if sep_shadow:
        if not occl:
            raise ValueError("separate shadow tables must be the "
                             "occlusion-specialized (occl) form")
        sh_ents, sh_smem_mode, sh_smem_nn = _resolve_smem(
            sh_ents, sh_nodes, sh_roots, frame_stack, 0, 0, 8, 1)
        _check_table_width(sh_nodes, 8, 0, sh_smem_mode)
    else:
        if occl:
            raise ValueError("occl=True requires separate shadow tables")
        sh_roots, sh_ents, sh_smem_mode, sh_smem_nn = (
            roots, None, smem_mode, smem_nn)

    step = GROUPS * TILE
    n0 = rays[0].shape[0]
    has_carry_in = carry_in is not None
    if has_carry_in:
        # span continuation (the split-frame driver): throughput /
        # energy / flags arrive from the previous span's outputs
        tp_in, en_in, flags_in = carry_in
        act0 = flags_in & 1
        spec0 = (flags_in >> 1) & 1
        cols = (list(rays) + [state, act0] + list(tp_in) + list(en_in)
                + [spec0])
        pads = [1.0] * 6 + [0, 0] + [1.0] * 3 + [0.0] * 3 + [0]
    else:
        cols = list(rays) + [state, jnp.ones((n0,), jnp.int32)]
        pads = [1.0] * 6 + [0, 0]  # padded lanes start DEAD (act 0)
    n, cols = _pad_to(step, cols, pads)
    num_steps = n // step

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 if sep_shadow else 2)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if smem_mode else [])
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if sh_smem_mode else [])
        + [pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)]
        * (15 if has_carry_in else 8)
    )
    sh_inputs = (sh_nodes, sh_ltris) if sep_shadow else ()
    # FLAT 1-D layout: see traverse_packet_slim._smem_pop
    ents_inputs = ((ents.astype(jnp.int32).reshape(-1),)
                   if smem_mode else ())
    sh_ents_inputs = ((sh_ents.astype(jnp.int32).reshape(-1),)
                      if sh_smem_mode else ())
    f32 = jnp.float32
    if carry_out:
        out_specs = [
            pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
        ] * 15
        out_shape = (
            [jax.ShapeDtypeStruct((n,), f32)] * 6
            + [jax.ShapeDtypeStruct((n,), jnp.uint32)]
            + [jax.ShapeDtypeStruct((n,), f32)] * 6
            + [jax.ShapeDtypeStruct((n,), jnp.int32)] * 2
        )
    else:
        out_specs = [
            pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
        ] * 5
        out_shape = (
            [jax.ShapeDtypeStruct((n,), f32)] * 3
            + [jax.ShapeDtypeStruct((n,), jnp.uint32)]
            + [jax.ShapeDtypeStruct((n,), jnp.int32)]
        )
    if count_iters:
        # (closest, shadow) per sub-tile, interleaved; whole array per
        # step on compiled TPU, per-step blocked in interpret (see
        # ops/megakernel.py shade_extend's count_iters note)
        if interpret:
            out_specs.append(pl.BlockSpec(
                (2 * GROUPS,), lambda i: (i,), memory_space=pltpu.SMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_steps * 2 * GROUPS,), jnp.int32))
    # one stack scratch serves both traversals: size for the larger of
    # the two schemes (the clamp bounds inside _emit_traversal are
    # computed per call from its own frame layout)
    def stack_slots(sm):
        if not frame_stack:
            return STACK
        return (2 if sm else width + 1) * FSTACK_FRAMES

    scratch = [
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM(
            (ROWS, max(stack_slots(smem_mode), stack_slots(sh_smem_mode))),
            jnp.int32,
        ),
    ]
    if pipelined:
        scratch.append(pltpu.SMEM((ROWS,), jnp.int32))  # entry2 (next)
    res = pl.pallas_call(
        functools.partial(
            _pt_frame_kernel,
            roots=tuple(int(r) for r in roots),
            sh_roots=tuple(int(r) for r in sh_roots),
            num_mats=num_mats, num_lights=num_lights,
            num_sph=num_sph, num_pln=num_pln, num_objs=num_objs,
            nee=nee, rr=rr, cosine=cosine, ref_pdf=ref_pdf,
            depths=depths,
            frame_stack=frame_stack, fused_nn=fused_nn,
            pipelined=pipelined, nearest=nearest and frame_stack,
            cond_push=cond_push and frame_stack, width=width,
            smem_mode=smem_mode, smem_nn=smem_nn,
            sh_smem_mode=sh_smem_mode, sh_smem_nn=sh_smem_nn,
            sep_shadow=sep_shadow, occl=occl, occl_rows=occl_rows,
            count_iters=count_iters, interp=interpret,
            light_tri_meta=tuple(light_tri_meta),
            depth_base=depth_base, has_carry_in=has_carry_in,
            carry_out=carry_out,
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
    )(nodes, ltris, *sh_inputs, mats, lights, ltri, sph, pln, sphmat,
      plnmat, objmat, *ents_inputs, *sh_ents_inputs, *cols)
    if carry_out:
        iters = res[15] if count_iters else None
        trimmed = [r[:n0] for r in res[:15]]
        (nox, noy, noz, ndx, ndy, ndz, ost,
         ntx, nty, ntz, ex, ey, ez, nfl, tr) = trimmed
        out = (
            (nox, noy, noz, ndx, ndy, ndz), ost,
            (ntx, nty, ntz), (ex, ey, ez), nfl,
            jnp.sum(tr, dtype=jnp.int32),
        )
    else:
        iters = res[5] if count_iters else None
        ex, ey, ez, ost, tr = [r[:n0] for r in res[:5]]
        energy = jnp.stack([ex, ey, ez], axis=1)
        out = (energy, ost, jnp.sum(tr, dtype=jnp.int32))
    if count_iters:
        return out + (iters,)
    return out
