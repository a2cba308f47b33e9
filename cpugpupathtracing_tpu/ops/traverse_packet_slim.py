"""Slim multi-row packet traversal: the round-2 TPU fast path.

Same execution shape as ops/traverse_packet_mr.py (8 independent 128-lane
sub-packets per 1024-ray tile, per-row stacks in SMEM, node rows loading
as an (8, 64) matrix whose column slices broadcast against the (8, 128)
ray registers) but with the per-iteration control cost, measured to be
the bottleneck on the TPU scalar unit, cut hard:

  * NO per-stack-entry lane masks.  A child's slab pass implies the lane
    passed every ancestor slab (child boxes nest), so per-entry masks only
    de-duplicated work that per-lane t-pruning already bounds; dropping
    them removes ~128 dynamic-indexed vector row ops and all staging
    writes per iteration.  Hit results stay exact: triangle accepts are
    validated per lane against (act, t) only.
  * Leaves are ONE padded 512-byte row (models/bvh8.py to_slim): a leaf
    resolves in a single iteration with a single dynamic row load, and
    the records embed flat normal / object index / original triangle id,
    so the hit returns SHADING-COMPLETE payloads -- no XLA per-lane
    gathers (measured ~0.5 GB/s on this chip) remain after traversal.
  * Child entries are PRE-ENCODED in the node row (interior row / leaf
    row / EMPTY sentinel / instance id), so per-child decode disappears.
  * Ordering: children push in FIXED slot order for closest-hit and
    any-hit alike.  The nearest-child-last argmin saved ~9% of
    iterations on the benchmark bounce fan but its vector->scalar
    extract + compare/select chain cost ~19% per iteration on the
    scalar unit (round-3 lab measurements); t-pruning still bounds
    every accept, so hits are exact either way.
  * Per-lane bvh_depth is REAL here (the packet_mr kernel returned
    zeros): a lane counts an expansion when it passes >= 1 child slab,
    which equals the per-lane descend count of ops/traverse_wide.py up to
    t-evolution timing (documented AOV semantics; heatmaps match).

TLAS / instances (the reference's planned feature, README.md:12-16):
with `inst_inv` + `inst_root` given, TLAS node rows may carry INSTANCE
child entries (encoded > SLIM_EMPTY).  Popping one switches the whole
sub-packet row into the instance's object space -- the 3x4 inverse
transform is scalar-loaded from SMEM and applied to the row's ray
registers (kept in VMEM scratch; direction left unnormalized so t stays
the world-space parameter) -- pushes a RESTORE marker, and descends into
the BLAS root.  Popping RESTORE swaps the world-space registers back.
Instances never nest, per-row state is one SMEM scalar, and the whole
machinery is compiled out when `inst_inv is None` (non-instanced scenes
pay nothing).

Reference parity: hit predicate identical to BVH::Traverse
(Source/BVH.cpp:61-127) composed over the 8-wide tree; payload.tri_idx
maps back to original ids via leaf_id like Source/BVH.cpp:81.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY

TILE = 1024
GROUPS = 4  # 1024-ray sub-tiles traversed sequentially per grid step:
# amortizes the ~13 us/step operand staging cost measured on the real
# scene (tools/profile_census.py) without touching sub-packet load
# balancing (every sub-tile runs its own while loop)
ROWS = 8
LANES = 128
WIDTH = 8
LEAF_TRIS = 8
STACK = 64
# frame-stack mode: the stack holds 9-slot FRAMES (8 child entries + a
# pass-mask word) instead of individual entries, so a push is 9
# unconditional SMEM stores instead of 8 conditional select-chains --
# the round-3 lab measured the per-child conditional push loop as the
# largest single share of the ~1.07 us/iteration scalar critical path.
# Pop takes the lowest set bit of the top frame's mask (fixed order,
# like the linear scheme).  Hits are bit-exact either way (strict-<
# accepts are visit-order independent); iteration counts and the
# bvh_depth AOV may shift within the documented t-evolution-timing
# semantics.
FSTACK_FRAMES = 24     # max simultaneous frames (DFS depth); the scene
FSTACK = 9 * FSTACK_FRAMES  # build validates tree depth + 1 frame headroom
# read ONCE at import: flipping the env var later has no effect (jit
# caches key on the resolved value's source argument, not the env)
FRAMESTACK_DEFAULT = os.environ.get("CPUGPU_FRAMESTACK", "") == "1"
# CPUGPU_PIPELINED=1: software-pipelined kernel body (pop + next-row
# load(s) issued before the current entry's slab/leaf so the scalar
# half overlaps the VPU half).  Runs on fused or split tables (split
# issues both speculative loads); no instance machinery -- silently
# ignored on instanced scenes.  Read at import.
PIPELINED_DEFAULT = os.environ.get("CPUGPU_PIPELINED", "") == "1"
# CPUGPU_NEAREST=1 (frame-stack modes only): the slab phase's argmin
# child index rides bits 8-10 of the frame's pass-mask word and pops
# FIRST, restoring nearest-child-first descent order (the round-3 lab
# measured fixed order at +9% iterations; this buys the order back for
# ~4 scalar ops/row instead of the 8-extract compare chain that made
# the original argmin a net loss).  Hit results stay exact either way.
NEAREST_DEFAULT = os.environ.get("CPUGPU_NEAREST", "") == "1"
# CPUGPU_CONDPUSH=1 (frame-stack modes): gate the 9 frame stores per
# row on the scalar pass mask instead of storing unconditionally --
# leaf-pop / dead-row iterations (~60% of the bounce fan) skip them.
# Exact: an un-pushed frame sits above the live top (sp only advances
# when the mask is non-zero) and is never observed.  Read at import.
CONDPUSH_DEFAULT = os.environ.get("CPUGPU_CONDPUSH", "") == "1"

# CPUGPU_SMEMTREE=1|48: SMEM ENTRY SIDE TABLE (round-4 row-load-floor
# attack).  The per-node child entries move out of the node row into an
# SMEM i32 (B + V, 8) input (bvh8.slim_side_tables); the frame stack
# shrinks to 2 words (node row, pass mask) so a push is 2 scalar
# stores instead of 9 and the 8 per-row vector->scalar entry extracts
# disappear -- a pop reads ents[frame_node, ctz(mask)] instead.  "48"
# additionally swaps the node table for the bounds-only (B, 48) form
# (bvh8.slim_bounds48, NaN empties, no per-child valid compare): 25%
# fewer node-row bytes per dynamic load.  Frame-stack scheme only,
# plain non-instanced 8-wide split tables, rowx 1.  Read at import.
SMEMTREE_DEFAULT = os.environ.get("CPUGPU_SMEMTREE", "")

# CPUGPU_ROWX=2|4: WIDER PACKET ROWS -- each of the 8 per-tile stacks
# drives 2 or 4 sublanes (256 / 512 rays) instead of 1 (128).  The
# scalar pop/push/load chain that dominates the ~1.1-1.4 us iteration
# (kernel_lab ns/iter fits; the 14-record occl rows test 75% more
# triangles per leaf iteration at FLAT ns/it, tools/occl_lab.py) is
# paid once per stack per iteration regardless of row width, so the
# win is (iterations per lane) down ~2-4x against (vector ALU per
# iteration) up 2-4x -- net positive wherever adjacent sorted spans
# share most node visits (the round-3 narrower-packet study measured
# ~85% sharing between adjacent 256-lane spans; offline union counts in
# tools/widerow_lab.py).  Hits stay bit-exact (strict-< accepts are
# visit-order independent); iteration counts and the depth AOV shift
# within the documented t-evolution-timing envelope.  Plain split-table
# kernels only (no instance machinery / fused tables / w16 / nearest).
ROWX_DEFAULT = int(os.environ.get("CPUGPU_ROWX") or "1")


def _resolve_rowx(rowx, num_inst, fused_nn, width, nearest):
    """Shared rowx resolution: the env default degrades silently on
    incompatible variants (so CPUGPU_ROWX composes with any scene); an
    explicit incompatible request raises."""
    incompatible = num_inst or fused_nn or width != 8 or nearest
    if rowx is None:
        rowx = ROWX_DEFAULT
        if incompatible:
            rowx = 1
    elif rowx != 1 and incompatible:
        raise ValueError(
            "rowx > 1 (wider packet rows) requires the plain "
            "non-instanced 8-wide split-table kernel without nearest")
    if rowx not in (1, 2, 4):
        raise ValueError(f"rowx must be 1, 2 or 4, got {rowx}")
    return rowx


def _sub_min(x, sub: int):
    """Combine sublane groups of `sub` with minimum: after this, sublane
    sub*j holds the min over sublanes [sub*j, sub*j + sub) (the other
    sublanes hold wrapped garbage that no caller reads).  Static sublane
    slices + concatenate only -- no strided ops, Mosaic-safe."""
    if sub == 1:
        return x
    y = jnp.minimum(x, jnp.concatenate([x[1:], x[:1]], axis=0))
    if sub == 4:
        y = jnp.minimum(y, jnp.concatenate([y[2:], y[:2]], axis=0))
    return y


def _sub_max(x, sub: int):
    """_sub_min's max twin (per-merged-row liveness ORs)."""
    if sub == 1:
        return x
    y = jnp.maximum(x, jnp.concatenate([x[1:], x[:1]], axis=0))
    if sub == 4:
        y = jnp.maximum(y, jnp.concatenate([y[2:], y[:2]], axis=0))
    return y


def _frame_mask(child_dmin, nearest: bool, width: int = WIDTH):
    """Per-row frame word from the per-child dmin columns: pass-mask
    bits 0..width-1, plus the argmin child in the bits just above when
    `nearest` (8-10 at width 8, 16-19 at width 16)."""
    fs_d = jnp.concatenate(child_dmin, axis=1)          # (8, width)
    fs_fin = jnp.isfinite(fs_d)
    fs_mask = jnp.zeros((fs_d.shape[0], 1), jnp.int32)
    for k in range(width):
        fs_mask = fs_mask | (fs_fin[:, k : k + 1].astype(jnp.int32) << k)
    if nearest:
        bd = fs_d[:, 0:1]
        bkv = jnp.zeros((fs_d.shape[0], 1), jnp.int32)
        for k in range(1, width):
            sw = fs_d[:, k : k + 1] < bd
            bd = jnp.where(sw, fs_d[:, k : k + 1], bd)
            bkv = jnp.where(sw, jnp.int32(k), bkv)
        fs_mask = fs_mask | (bkv << width)
    return fs_mask


def _frame_pop(mw, nearest: bool, width: int = WIDTH):
    """(slot index, remaining word) for one pop from frame word `mw`.
    With `nearest`, the stashed argmin child pops first (its bit then
    clears, so later pops fall back to ctz of the remaining mask)."""
    if nearest:
        bk = jax.lax.shift_right_logical(mw, width) & (width - 1)
        bkbit = jax.lax.shift_left(jnp.int32(1), bk)
        use_bk = (mw & bkbit) != 0
        kk = jnp.where(use_bk, bk, _ctz8(mw & ((1 << width) - 1),
                                         width=width))
        rem = mw & ~jax.lax.shift_left(jnp.int32(1), kk)
        return kk, rem
    return _ctz8(mw, width=width), mw & (mw - 1)
# frame-stack pop needs a scalar ctz.  The deployed Mosaic toolchain
# rejects scalar lax.population_count outright ("Population count is
# not supported on scalars", measured round 3), so the default is a
# width-way compare chain (bit-identical result); CPUGPU_CTZ_CHAIN=0
# opts back into the popcount form on toolchains that support it.
# Read once at import like the other kernel flags; empty == unset.
CTZ_CHAIN = (os.environ.get("CPUGPU_CTZ_CHAIN") or "1") == "1"


def _frame_push(stack_ref, j, base_p, slots, w, pushc, cond_push):
    """One 9-slot frame store (8 entries + mask word) for row `j` at
    `base_p`.  With `cond_push` the stores sit under pl.when(pushc) --
    a skipped frame sits above the live top (the caller advances sp on
    `pushc` either way) and is never observed, so hits are exact."""
    def _do():
        for k, v in enumerate(slots):
            stack_ref[j, base_p + k] = v
        stack_ref[j, base_p + len(slots)] = w
    if cond_push:
        pl.when(pushc)(_do)
    else:
        _do()


def _resolve_smem(ents, nodes, roots, frame_stack, num_inst, fused_nn,
                  width, rowx):
    """Shared SMEM side-table resolution (slim kernel + megakernels).

    Returns (ents', smem_mode, smem_nn): mode 2 when the node table is
    the bounds-only 48-col form, mode 1 for the 64-col table with a
    side table, 0 when off.  The scheme needs the frame-stack 8-wide
    non-instanced split-table kernel at rowx 1; with a 64-col table an
    incompatible combination silently drops the side table (so the
    CPUGPU_SMEMTREE env default composes with any scene), but a 48-col
    table CANNOT be traversed without it -- that mismatch raises."""
    if ents is None:
        if nodes.shape[1] == 48:
            raise ValueError(
                "a 48-col bounds-only node table requires the SMEM entry "
                "side table (pass ents=bvh8.slim_side_tables(...))")
        return None, 0, 0
    incompatible = (not frame_stack or num_inst or fused_nn
                    or width != 8 or rowx != 1)
    if incompatible:
        if nodes.shape[1] == 48:
            raise ValueError(
                "48-col node tables need the frame-stack non-instanced "
                "8-wide split-table kernel at rowx 1")
        return None, 0, 0
    mode = 2 if nodes.shape[1] == 48 else 1
    nvirt = (len(roots) - 1 + width - 1) // width
    return ents, mode, ents.shape[0] - nvirt


def _smem_push(stack_ref, j, base_p, node_e, w, pushc, cond_push):
    """2-word frame store for the SMEM side-table scheme: (node row,
    pass mask).  Same never-observed-junk-frame contract as
    _frame_push (the caller advances sp on `pushc` either way) -- but
    the node word of an UNCONDITIONAL junk store is clamped to 0: a
    junk frame at slot 0 is read (masked) by the sp == 0 pop, and its
    node word indexes the SMEM side table, so it must stay in-bounds
    (DONE / leaf entries would not be)."""
    if cond_push:
        def _do():
            stack_ref[j, base_p] = node_e
            stack_ref[j, base_p + 1] = w
        pl.when(pushc)(_do)
    else:
        stack_ref[j, base_p] = jnp.where(pushc, node_e, 0)
        stack_ref[j, base_p + 1] = w


def _smem_pop(stack_ref, ents_ref, j, sp, can, nearest, width=WIDTH):
    """One pop from row j's 2-word frame stack: reads the top frame's
    (node, mask), takes the next slot via _frame_pop, and fetches the
    child entry from the FLAT 1-D SMEM side table at node*width + slot
    (a 2-D (B, 8) SMEM input window pads each row to 512 bytes -- 16x
    waste that blew the 1 MB SMEM budget on the benchmark tree,
    rejected by the AOT compiler as 'Allocation would exceed memory';
    the 1-D window is dense).  Stack slot 0 is always seeded (0 when
    no root frames), so the masked junk pop at sp == 0 stays
    in-bounds.  Returns (entry, sp')."""
    base = jnp.maximum(sp - 2, 0)
    fnode = stack_ref[j, base]
    mw = stack_ref[j, base + 1]
    kk, rem = _frame_pop(mw, nearest, width)
    ent = ents_ref[fnode * width + kk]
    stack_ref[j, base + 1] = jnp.where(can, rem, mw)
    sp2 = jnp.where(can & ((rem & ((1 << width) - 1)) == 0), base, sp)
    return ent, sp2


def _smem_seed(stack_ref, sptr_ref, j, roots, smem_nn, width=WIDTH):
    """Root seeding for the 2-word frame scheme: extra roots live in
    the side table's virtual rows (smem_nn + vi), one frame per chunk
    of `width`.  Slot 0 is zero-initialized when there are no root
    frames so the sp == 0 junk pop stays in-bounds."""
    nroots = len(roots) - 1
    nf = 0
    pos = 0
    while pos < nroots:
        cnt = min(width, nroots - pos)
        stack_ref[j, 2 * nf] = smem_nn + nf
        stack_ref[j, 2 * nf + 1] = (1 << cnt) - 1
        nf += 1
        pos += cnt
    if nf == 0:
        stack_ref[j, 0] = 0
        stack_ref[j, 1] = 0
    sptr_ref[j] = 2 * nf


def _resolve_width_flags(width, num_inst, frame_stack, nearest, any_hit):
    """Shared width flag resolution (slim kernel + the megakernels).

    W16 is frame-stack only (a 16-slot conditional linear push would
    double the measured scalar bottleneck), never runs the object-space
    instance machinery (flattened scenes qualify for the plain kernel),
    and defaults to nearest-child-first for closest-hit: the W16 lab
    measured fixed push order at +17% primary-fan iterations, which the
    frame-word argmin recovers for ~4 scalar ops (tools/kernel_lab3.py);
    any-hit is visit-order insensitive, so it keeps the fixed order."""
    if width not in (8, 16):
        raise ValueError(f"packet node width must be 8 or 16, got {width}")
    if width == 16:
        if num_inst:
            raise ValueError("16-wide packet tables do not support the "
                             "instance machinery (flatten the scene)")
        if frame_stack is None:
            frame_stack = True
        elif not frame_stack:
            raise ValueError("width=16 requires the frame-stack scheme")
        if nearest is None:
            nearest = not any_hit
    if frame_stack is None:
        frame_stack = FRAMESTACK_DEFAULT
    if nearest is None:
        nearest = NEAREST_DEFAULT and frame_stack
    return frame_stack, nearest


def _check_table_width(nodes, width: int, fused_nn: int,
                       smem_mode: int = 0) -> None:
    """A width-8 decode on a (B, 128) width-16 table (or vice versa)
    reads bounds columns as entries and traverses garbage -- catch the
    mismatch loudly.  Non-fused tables are 64 cols at width 8 and 128
    at width 16; fused tables are one 128-col row either way; the
    bounds-only side-table form (CPUGPU_SMEMTREE=48) is 48 cols."""
    expect = 128 if (width == 16 or fused_nn) else (
        48 if smem_mode == 2 else 64)
    if nodes.shape[1] != expect:
        raise ValueError(
            f"packet node table has {nodes.shape[1]} cols but width="
            f"{width} fused_nn={fused_nn} expects {expect} -- pass the "
            "DeviceScene.packet_width the table was built with"
        )


def _ctz8(mw, chain: bool | None = None, width: int = WIDTH):
    """Slot index of the lowest set bit of the width-bit frame mask
    `mw` (scalar i32).  Returns width-1 when mw == 0 (callers gate on
    the mask, so the popped junk entry is never observed)."""
    low = mw & (-mw)
    if CTZ_CHAIN if chain is None else chain:
        kk = jnp.int32(width - 1)
        for k in range(width - 2, -1, -1):
            kk = jnp.where(low == (1 << k), jnp.int32(k), kk)
        return kk
    return jnp.minimum(jax.lax.population_count(low - 1),
                       jnp.int32(width - 1))
TRI_DET_EPS = 0.001
DONE = 0x7FFFFFFF
# occlusion leaf rows (bvh8.to_slim_occl): 14 bare stride-9 records
OCCL_TRIS = 14
OCCL_STRIDE = 9


def _leaf_tests(lmat, ox, oy, oz, dx, dy, dz, m, leaf_v,
                t, hit, obj, nx, ny, nz, hiid=None, iid_v=None,
                occl: bool = False, pmat=None):
    """One leaf row of Moller-Trumbore tests against the (8, 128) ray
    registers (IntersectTriangle, Source/Primitives.cpp:6-47, double-
    sided, 1e-3 determinant epsilon), shared by the slim kernel and the
    megakernels (plain and pipelined bodies).

    Standard rows (bvh8.to_slim): 8 records x 16 cols with embedded
    flat normal / object / original id -- accepts update every payload.
    `occl=True` rows (bvh8.to_slim_occl): 14 bare records x 9 cols; an
    accept shrinks t and sets hit=1 (the occlusion bit) but the shading
    payloads never change -- exactly the any-hit contract (tri >= 0
    flags occlusion).  The occluded bit is bitwise identical to the
    standard rows' any-hit: same arithmetic on the same v0/e1/e2
    floats, OR over the same triangle set.

    `occl=True` with `pmat` (bvh8.occl_payload rows, loaded from the
    parallel payload table at the same leaf row index) is the LEAF-14
    CLOSEST-HIT mode: record k's [nx, ny, nz, obj, id] sit at the same
    stride-9 offsets in pmat, restoring to_slim's shading-complete hit
    contract over the 14-record tree (-14% bounce / -22% interior
    iterations measured offline, tools/leaf14_lab.py).

    Returns (t, hit, obj, nx, ny, nz, hiid)."""
    limat = jax.lax.bitcast_convert_type(lmat, jnp.int32)
    pimat = (jax.lax.bitcast_convert_type(pmat, jnp.int32)
             if pmat is not None else None)
    ntr = OCCL_TRIS if occl else LEAF_TRIS
    stride = OCCL_STRIDE if occl else 16
    for c in range(ntr):
        tm = lmat[:, stride * c : stride * c + (9 if occl else 12)]
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
        tt = f * (tm[:, 6:7] * qx + tm[:, 7:8] * qy + tm[:, 8:9] * qz)
        ok = (
            det_ok & (u >= 0.0) & (u <= 1.0) & (vv >= 0.0)
            & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t)
            & m & leaf_v
        )
        if occl:
            # t shrinks exactly like the standard rows (enables
            # closest-hit iteration counting over occl tables, e.g.
            # tools/leaf14_lab.py); the occluded bit is unaffected --
            # any-hit masks a lane out the moment hit latches, and a
            # lane without an accept never shrank t
            t = jnp.where(ok, tt, t)
            if pimat is None:
                hit = jnp.where(ok, jnp.int32(1), hit)
                continue
            base = OCCL_STRIDE * c
            hit = jnp.where(ok, pimat[:, base + 4 : base + 5], hit)
            obj = jnp.where(ok, pimat[:, base + 3 : base + 4], obj)
            nx = jnp.where(ok, pmat[:, base + 0 : base + 1], nx)
            ny = jnp.where(ok, pmat[:, base + 1 : base + 2], ny)
            nz = jnp.where(ok, pmat[:, base + 2 : base + 3], nz)
            continue
        t = jnp.where(ok, tt, t)
        hit = jnp.where(ok, limat[:, 16 * c + 13 : 16 * c + 14], hit)
        obj = jnp.where(ok, limat[:, 16 * c + 12 : 16 * c + 13], obj)
        nx = jnp.where(ok, tm[:, 9:10], nx)
        ny = jnp.where(ok, tm[:, 10:11], ny)
        nz = jnp.where(ok, tm[:, 11:12], nz)
        if hiid is not None:
            hiid = jnp.where(ok, iid_v, hiid)
    return t, hit, obj, nx, ny, nz, hiid
RESTORE = 0x3FFFFFFF  # stack marker: leave instance space (< SLIM_EMPTY,
# far above any real node row index)
BIG = 1e30


def _traverse_kernel(
    *refs,
    roots: tuple, any_hit: bool, count_depth: bool, instanced: bool,
    count_iters: bool, frame_stack: bool = False, fused_nn: int = 0,
    pipelined: bool = False, nearest: bool = False, interp: bool = False,
    cond_push: bool = False, width: int = WIDTH, occl: bool = False,
    with_pay: bool = False, rowx: int = 1, smem_mode: int = 0,
    smem_nn: int = 0, occl_rows: int = 1,
):
    # node-arity locals: width 8 = the classic (B, 64) slim row, width
    # 16 = one full (B, 128) row (16x6 bounds, entries at 96, counts at
    # 112) -- the W16 layout of tools/kernel_lab3.py productionized
    EO = 6 * width              # entry columns base (48 / 96)
    NC = 8 * width              # node row width (64 / 128)
    FR = width + 1              # frame stride (9 / 17)
    LM = (1 << width) - 1       # pass-mask bits
    FSTK = FR * FSTACK_FRAMES
    # wider rows (CPUGPU_ROWX): each stack drives `rowx` sublanes; the
    # tile widens to rowx*TILE lanes and the step keeps GROUPS*TILE
    SUB = rowx
    NTILES = GROUPS // SUB      # tiles per grid step
    TL = TILE * SUB             # lanes per tile
    def iters_slot(g):
        # interpret mode blocks the iters output per grid step (and its
        # CPU lowering lacks program_id); compiled TPU passes the whole
        # array (rank-1 SMEM outputs can't be tile-blocked) and indexes
        # it absolutely
        return g if interp else pl.program_id(0) * NTILES + g
    refs = list(refs)
    pay_ref = None
    if with_pay:
        # leaf-14 closest-hit payload table, right after ltris
        pay_ref = refs.pop(2)
    ents_ref = None
    if smem_mode:
        # SMEM entry side table, after ltris (and pay when present)
        ents_ref = refs.pop(2)
        FR = 2
        FSTK = 2 * FSTACK_FRAMES
    if count_iters:
        # the iters output ref sits after the 8 regular outputs, before
        # the scratch refs; inputs = nodes, ltris [, inst x2] + 8 ray ops
        iters_out = refs.pop((12 if instanced else 10) + 8)
    if instanced:
        (
            nodes_ref, ltris_ref, inst_inv_ref, inst_root_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
            t_out, hit_out, obj_out, nx_out, ny_out, nz_out, depth_out,
            iid_out,
            entry_ref, sptr_ref, stack_ref, iid_ref, rays_ref,
        ) = refs
        num_inst = inst_root_ref.shape[0]
    elif pipelined:
        (
            nodes_ref, ltris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
            t_out, hit_out, obj_out, nx_out, ny_out, nz_out, depth_out,
            iid_out,
            entry_ref, sptr_ref, stack_ref, entry2_ref,
        ) = refs
    else:
        (
            nodes_ref, ltris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
            t_out, hit_out, obj_out, nx_out, ny_out, nz_out, depth_out,
            iid_out,
            entry_ref, sptr_ref, stack_ref,
        ) = refs

    for g in range(NTILES):
        gs = slice(g * TL, (g + 1) * TL)
        # sorted wavefronts leave most late-depth sub-tiles with ZERO
        # active lanes; skip their whole prologue/traversal/epilogue
        # (the Hit contract leaves inactive rows unspecified)
        any_act = jnp.sum(act_ref[gs]) > 0
        if count_iters:
            iters_out[iters_slot(g)] = 0

        @pl.when(jnp.logical_not(any_act))
        def _dead(gs=gs):
            # exact miss payloads (not garbage VMEM): t = t_init,
            # hit/obj/iid = -1 -- keeps debug_nans clean downstream
            t_out[gs] = t0_ref[gs]
            hit_out[gs] = jnp.full((TL,), -1, jnp.int32)
            obj_out[gs] = jnp.full((TL,), -1, jnp.int32)
            nx_out[gs] = jnp.zeros((TL,), jnp.float32)
            ny_out[gs] = jnp.zeros((TL,), jnp.float32)
            nz_out[gs] = jnp.zeros((TL,), jnp.float32)
            depth_out[gs] = jnp.zeros((TL,), jnp.int32)
            iid_out[gs] = jnp.full((TL,), -1, jnp.int32)

        @pl.when(any_act)
        def _group(g=g, gs=gs):
            shape = (ROWS * SUB, LANES)
            ox0 = ox_ref[gs].reshape(shape)
            oy0 = oy_ref[gs].reshape(shape)
            oz0 = oz_ref[gs].reshape(shape)
            dx0 = dx_ref[gs].reshape(shape)
            dy0 = dy_ref[gs].reshape(shape)
            dz0 = dz_ref[gs].reshape(shape)
            act0 = act_ref[gs].reshape(shape) != 0

            def inv_dir(d):
                return jnp.where(d == 0.0, BIG, 1.0 / d)

            ix0 = inv_dir(dx0)
            iy0 = inv_dir(dy0)
            iz0 = inv_dir(dz0)
            t0 = t0_ref[gs].reshape(shape)

            for j in range(ROWS):
                entry_ref[j] = roots[0]
                if frame_stack and smem_mode:
                    _smem_seed(stack_ref, sptr_ref, j, roots, smem_nn,
                               width)
                elif frame_stack:
                    # remaining roots seed whole 9-slot frames (8 + mask)
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
                # per-row mutable ray registers (world or current-instance object
                # space); component c's row j lives at rays_ref[c * ROWS + j]
                for c, v in enumerate((ox0, oy0, oz0, dx0, dy0, dz0, ix0, iy0, iz0)):
                    rays_ref[c * ROWS : (c + 1) * ROWS, :] = v

            if pipelined:
                # SOFTWARE-PIPELINED body (no instance machinery): each
                # iteration pops the NEXT entry and issues its row
                # load(s) BEFORE running slab+leaf on the CURRENT entry
                # from the row matrix carried since last iteration, then
                # pushes the current entry's children.  The scalar pop +
                # dynamic-load issue carry no data dependency on the VPU
                # phases, so they overlap instead of serializing ahead
                # of them.  With the fused table one unified load per
                # row suffices; with split tables (fused_nn == 0 -- the
                # deployed Mosaic executes the fused decode but its
                # binaries crash the TPU worker, measured round 3) both
                # the node and leaf rows load speculatively, same bytes
                # as the non-pipelined split decode.  A row that pops
                # DONE while its push lands work runs one bubble
                # iteration; hits are exact for any visit order
                # (strict-< accepts bounded by per-lane t).
                if fused_nn:
                    lmat0 = jnp.concatenate(
                        [nodes_ref[pl.ds(roots[0], 1), :]] * (ROWS * SUB),
                        axis=0,
                    )
                    nmat0 = None
                else:
                    nmat0 = jnp.concatenate(
                        [nodes_ref[pl.ds(roots[0], 1), :]] * (ROWS * SUB),
                        axis=0,
                    )
                    # dummy leaf rows: the root is interior, so the leaf
                    # phase is fully masked on iteration 0
                    lmat0 = jnp.concatenate(
                        [ltris_ref[pl.ds(0, 1), :]] * (ROWS * SUB), axis=0
                    )
                    if with_pay:
                        pmat0 = jnp.concatenate(
                            [pay_ref[pl.ds(0, 1), :]] * (ROWS * SUB), axis=0
                        )

                def pipe_body(carry):
                    pmat = lmat2 = None
                    if fused_nn:
                        t, hit, obj, nx, ny, nz, depth, lmat = carry[:8]
                        ncar = 8
                    elif with_pay:
                        (t, hit, obj, nx, ny, nz, depth, nmat_c, lmat,
                         pmat) = carry[:10]
                        ncar = 10
                    elif occl_rows == 2:
                        (t, hit, obj, nx, ny, nz, depth, nmat_c, lmat,
                         lmat2) = carry[:10]
                        ncar = 10
                    else:
                        t, hit, obj, nx, ny, nz, depth, nmat_c, lmat = (
                            carry[:9])
                        ncar = 9
                    m = act0
                    if any_hit:
                        m = m & (hit < 0)
                        row_live_v = _sub_max(
                            jnp.max(m.astype(jnp.int32), axis=1,
                                    keepdims=True), SUB)       # (8*SUB, 1)

                    # ---- (1) scalar: pop NEXT + issue its loads ----
                    entries, leaf_s, int_s, nexts, sps = [], [], [], [], []
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
                                stack_ref, ents_ref, j, sp, can, nearest,
                                width)
                        elif frame_stack:
                            base = jnp.maximum(sp - FR, 0)
                            mw = stack_ref[j, base + width]
                            kk, rem = _frame_pop(mw, nearest, width)
                            ent = stack_ref[j, base + kk]
                            stack_ref[j, base + width] = jnp.where(
                                can, rem, mw)
                            sp2 = jnp.where(
                                can & ((rem & LM) == 0), base, sp)
                        else:
                            ent = stack_ref[j, jnp.maximum(sp - 1, 0)]
                            sp2 = jnp.where(can, sp - 1, sp)
                        nxt = jnp.where(can, ent, DONE)
                        entry2_ref[j] = nxt
                        sptr_ref[j] = sp2
                        nexts.append(nxt)
                        if fused_nn:
                            urows.extend(
                                [nodes_ref[
                                    pl.ds(jnp.where(nxt != DONE, nxt, 0), 1),
                                    :]] * SUB
                            )
                        else:
                            nn_i = jnp.where(
                                (nxt != DONE) & (nxt >= 0), nxt, 0)
                            nl_i = jnp.where(
                                nxt < 0, (-nxt - 1) * occl_rows, 0)
                            urows.extend([nodes_ref[pl.ds(nn_i, 1), :]] * SUB)
                            ulrows.extend(
                                [ltris_ref[pl.ds(nl_i, 1), :]] * SUB)
                            if occl_rows == 2:
                                ulrows2.extend(
                                    [ltris_ref[pl.ds(nl_i + 1, 1), :]] * SUB)
                            if with_pay:
                                uprows.extend(
                                    [pay_ref[pl.ds(nl_i, 1), :]] * SUB)
                    pmat_next = lmat2_next = None
                    if fused_nn:
                        lmat_next = jnp.concatenate(urows, axis=0)
                        nmat_next = None
                    else:
                        nmat_next = jnp.concatenate(urows, axis=0)
                        lmat_next = jnp.concatenate(ulrows, axis=0)
                        if occl_rows == 2:
                            lmat2_next = jnp.concatenate(ulrows2, axis=0)
                        if with_pay:
                            pmat_next = jnp.concatenate(uprows, axis=0)

                    # ---- (2) vector: slab + leaf on CURRENT ----
                    nmat = lmat[:, :NC] if fused_nn else nmat_c
                    imat = (None if smem_mode == 2 else
                            jax.lax.bitcast_convert_type(nmat, jnp.int32))
                    leaf_v = jnp.concatenate(
                        [jnp.full((SUB, 1), leaf_s[j], jnp.int32)
                         for j in range(ROWS)], axis=0,
                    ) != 0
                    int_v = jnp.concatenate(
                        [jnp.full((SUB, 1), int_s[j], jnp.int32)
                         for j in range(ROWS)], axis=0,
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
                    tmin = [jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k])
                            for k in R]
                    tmax = [jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k])
                            for k in R]
                    if smem_mode == 2:
                        # bounds-only rows: empty slots carry NaN bounds,
                        # every comparison below is False -- no entry
                        # columns to compare
                        bm = [
                            (tmax[k] >= tmin[k]) & (tmin[k] < t)
                            & (tmax[k] > 0.0) & m & int_v
                            for k in R
                        ]
                    else:
                        valid = [imat[:, EO + k : EO + k + 1] != SLIM_EMPTY
                                 for k in R]
                        bm = [
                            (tmax[k] >= tmin[k]) & (tmin[k] < t)
                            & (tmax[k] > 0.0) & m & int_v & valid[k]
                            for k in R
                        ]
                    fin = [
                        jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                                keepdims=True)
                        for k in R
                    ]
                    if count_depth:
                        lane_desc = bm[0]
                        for k in range(1, width):
                            lane_desc = lane_desc | bm[k]
                        depth = depth + lane_desc.astype(jnp.int32)
                    fs_mask = _frame_mask(
                        [_sub_min(f, SUB) for f in fin], nearest, width)

                    t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                        lmat, ox0, oy0, oz0, dx0, dy0, dz0, m, leaf_v,
                        t, hit, obj, nx, ny, nz, occl=occl, pmat=pmat)
                    if occl_rows == 2:
                        # second row of the fat occlusion leaf
                        t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                            lmat2, ox0, oy0, oz0, dx0, dy0, dz0, m, leaf_v,
                            t, hit, obj, nx, ny, nz, occl=True)

                    # ---- (3) scalar: push CURRENT's children; rotate ----
                    alive = jnp.int32(0)
                    for j in range(ROWS):
                        sp = sptr_ref[j]
                        w = fs_mask[SUB * j, 0]
                        if frame_stack and smem_mode:
                            # 2-word frame: (current node row, mask); the
                            # child entries stay in the SMEM side table
                            base_p = jnp.minimum(sp, FSTK - 2)
                            pushc = int_s[j] & ((w & LM) != 0)
                            _smem_push(stack_ref, j, base_p, entries[j],
                                       w, pushc, cond_push)
                            sp = sp + jnp.where(pushc, 2, 0)
                            sptr_ref[j] = sp
                            entry_ref[j] = entry2_ref[j]
                            row_alive = (nexts[j] != DONE) | (sp > 0)
                            if any_hit:
                                row_alive = row_alive & (
                                    row_live_v[SUB * j, 0] != 0)
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
                                    ((jax.lax.shift_right_logical(w, k) & 1)
                                     != 0) & int_s[j]
                                )
                                slot = jnp.where(
                                    push, jnp.minimum(sp, STACK - 1), STACK - 1
                                )
                                prev = stack_ref[j, slot]
                                stack_ref[j, slot] = jnp.where(
                                    push, es_[k], prev)
                                sp = sp + jnp.where(push, 1, 0)
                        sptr_ref[j] = sp
                        entry_ref[j] = entry2_ref[j]
                        row_alive = (nexts[j] != DONE) | (sp > 0)
                        if any_hit:
                            row_alive = row_alive & (
                                row_live_v[SUB * j, 0] != 0)
                        alive = alive + jnp.where(row_alive, 1, 0)
                    out = (t, hit, obj, nx, ny, nz, depth)
                    if not fused_nn:
                        out = out + (nmat_next,)
                    out = out + (lmat_next,)
                    if occl_rows == 2:
                        out = out + (lmat2_next,)
                    if with_pay:
                        out = out + (pmat_next,)
                    if count_iters:
                        return out + (carry[-2] + 1, alive)
                    return out + (alive,)

                init_p = [
                    t0,
                    jnp.full(shape, -1, jnp.int32),
                    jnp.full(shape, -1, jnp.int32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.int32),
                ]
                if not fused_nn:
                    init_p.append(nmat0)
                init_p.append(lmat0)
                if occl_rows == 2:
                    init_p.append(lmat0)  # dummy second leaf row
                if with_pay:
                    init_p.append(pmat0)
                if count_iters:
                    init_p.append(jnp.int32(0))
                init_p.append(jnp.int32(1))
                out = jax.lax.while_loop(
                    lambda c: c[-1] > 0, pipe_body, tuple(init_p))
                t, hit, obj, nx, ny, nz, depth = out[:7]
                t_out[gs] = t.reshape(-1)
                hit_out[gs] = hit.reshape(-1)
                obj_out[gs] = obj.reshape(-1)
                nx_out[gs] = nx.reshape(-1)
                ny_out[gs] = ny.reshape(-1)
                nz_out[gs] = nz.reshape(-1)
                depth_out[gs] = depth.reshape(-1)
                iid_out[gs] = jnp.full((TL,), -1, jnp.int32)
                if count_iters:
                    iters_out[iters_slot(g)] = out[-2]
                return

            def body(carry):
                if instanced:
                    t, hit, obj, nx, ny, nz, depth, hiid, _ = carry
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
                    t, hit, obj, nx, ny, nz, depth, _ = carry
                    hiid = None
                    ox, oy, oz = ox0, oy0, oz0
                    dx, dy, dz = dx0, dy0, dz0
                    ix, iy, iz = ix0, iy0, iz0
                m = act0
                if any_hit:
                    m = m & (hit < 0)
                    # any-hit row flush: once every live lane of a row is
                    # occluded, draining its remaining stack entries can
                    # only re-find hits for already-hit lanes -- park the
                    # row NOW (exact; saves the full slab+leaf cost of
                    # every pending pop on coherent shadow fans)
                    row_live_v = _sub_max(
                        jnp.max(m.astype(jnp.int32), axis=1,
                                keepdims=True), SUB)           # (8*SUB, 1)

                # ---- per-row entry decode + row loads (scalar control) ----
                nrows, lrows, prows, leaf_s, int_s = [], [], [], [], []
                lrows2 = []
                if fused_nn:
                    # unified node|leaf table (scene._fuse_packet_tables):
                    # every live entry is a direct row index, so ONE
                    # dynamic load and ONE address select per row replace
                    # the two-table decode (non-instanced scenes only)
                    urows = []
                    for j in range(ROWS):
                        e = entry_ref[j]
                        live = e != DONE
                        if any_hit:
                            live = live & (row_live_v[SUB * j, 0] != 0)
                        leaf_s.append(live & (e >= fused_nn))
                        int_s.append(live & (e < fused_nn))
                        urows.extend(
                            [nodes_ref[pl.ds(jnp.where(live, e, 0), 1), :]]
                            * SUB
                        )
                    lmat = jnp.concatenate(urows, axis=0)      # (8*SUB, 128)
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
                            lrows2.extend(
                                [ltris_ref[pl.ds(lrow + 1, 1), :]] * SUB)
                        if with_pay:
                            prows.extend([pay_ref[pl.ds(lrow, 1), :]] * SUB)
                        leaf_s.append(leaf)
                        int_s.append(interior)
                    nmat = jnp.concatenate(nrows, axis=0)      # (8*SUB, 64)
                    lmat = jnp.concatenate(lrows, axis=0)      # (8*SUB, 128)
                lmat2 = (jnp.concatenate(lrows2, axis=0)
                         if occl_rows == 2 else None)
                pmat = jnp.concatenate(prows, axis=0) if with_pay else None
                imat = (None if smem_mode == 2 else
                        jax.lax.bitcast_convert_type(nmat, jnp.int32))
                leaf_v = jnp.concatenate(
                    [jnp.full((SUB, 1), leaf_s[j], jnp.int32)
                     for j in range(ROWS)],
                    axis=0,
                ) != 0                                          # (8*SUB, 1)
                int_v = jnp.concatenate(
                    [jnp.full((SUB, 1), int_s[j], jnp.int32)
                     for j in range(ROWS)],
                    axis=0,
                ) != 0                                     # (8*SUB, 1): gates slab
                # work to live interior rows (finished / instance-marker rows
                # would otherwise retest row 0's children and inflate bvh_depth)
                if instanced:
                    iid_v = jnp.concatenate(
                        [jnp.full((SUB, 1), iid_ref[j], jnp.int32)
                         for j in range(ROWS)],
                        axis=0,
                    )                                           # (8, 1)

                # ---- interior: 8 child slab tests on (8,1)-broadcast
                # bounds, emitted OP-STAGE-MAJOR across the independent
                # children: consecutive vector instructions then carry no
                # data dependency, hiding the VPU chain latency that a
                # child-major emission serializes (round-3 lab: slab
                # phase 560 -> ~250 ns/iteration, -15% per entry) ----
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
                tmin = [
                    jnp.maximum(jnp.maximum(mnx[k], mny[k]), mnz[k]) for k in R
                ]
                tmax = [
                    jnp.minimum(jnp.minimum(mxx[k], mxy[k]), mxz[k]) for k in R
                ]
                if smem_mode == 2:
                    # bounds-only rows: NaN empties fail every compare
                    bm = [
                        (tmax[k] >= tmin[k]) & (tmin[k] < t)
                        & (tmax[k] > 0.0) & m & int_v
                        for k in R
                    ]
                else:
                    valid = [imat[:, EO + k : EO + k + 1] != SLIM_EMPTY
                             for k in R]
                    bm = [
                        (tmax[k] >= tmin[k]) & (tmin[k] < t)
                        & (tmax[k] > 0.0) & m & int_v & valid[k]
                        for k in R
                    ]
                child_dmin = [
                    _sub_min(
                        jnp.min(
                            jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                            keepdims=True,
                        ),
                        SUB,
                    )
                    for k in R
                ]
                if count_depth:
                    lane_desc = bm[0]
                    for k in range(1, width):
                        lane_desc = lane_desc | bm[k]
                    depth = depth + lane_desc.astype(jnp.int32)

                # ---- leaf: one padded row from the (8, 128) matrix ----
                t, hit, obj, nx, ny, nz, hiid = _leaf_tests(
                    lmat, ox, oy, oz, dx, dy, dz, m, leaf_v,
                    t, hit, obj, nx, ny, nz,
                    hiid=hiid if instanced else None,
                    iid_v=iid_v if instanced else None, occl=occl,
                    pmat=pmat)
                if occl_rows == 2:
                    # second row of the fat occlusion leaf (CPUGPU_OCCL2)
                    t, hit, obj, nx, ny, nz, _ = _leaf_tests(
                        lmat2, ox, oy, oz, dx, dy, dz, m, leaf_v,
                        t, hit, obj, nx, ny, nz, occl=True)

                # ---- per-row control (scalar): push children, pop next ----
                if frame_stack:
                    # per-row pass masks built ONCE in the vector domain:
                    # one packed extract per row replaces the 8 per-child
                    # dmin extracts of the linear scheme.  bm gates on
                    # int_v and m, so the mask is 0 for every non-live /
                    # non-interior row.
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
                        # 2-word frame push (node row, mask) + side-table
                        # pop; non-instanced only (resolved upstream)
                        w = fs_mask[SUB * j, 0]
                        base_p = jnp.minimum(sp, FSTK - 2)
                        pushc = (w & LM) != 0
                        _smem_push(stack_ref, j, base_p, e, w, pushc,
                                   cond_push)
                        sp = sp + jnp.where(pushc, 2, 0)
                        can = live & (sp > 0)
                        nxt, sp = _smem_pop(
                            stack_ref, ents_ref, j, sp, can, nearest,
                            width)
                        nxt = jnp.where(can, nxt, DONE)
                        sptr_ref[j] = sp
                        entry_ref[j] = nxt
                        alive = alive + jnp.where(nxt != DONE, 1, 0)
                        continue

                    es_ = [imat[SUB * j, EO + k] for k in range(width)]

                    if frame_stack:
                        # 9-slot frame push: 8 UNCONDITIONAL stores + the
                        # pass mask replace the conditional select-chain
                        # pushes (junk frames land above the live top and
                        # are never observed; the scene build keeps one
                        # frame of headroom so the boundary clamp never
                        # lands on live data).
                        w = fs_mask[SUB * j, 0]
                        slot0 = es_[0]
                        if instanced:
                            is_inst = live & (e > SLIM_EMPTY)
                            is_rest = live & (e == RESTORE)
                            iid_e = e - SLIM_EMPTY - 1
                            iid_c = jnp.clip(iid_e, 0, num_inst - 1)
                            # an instance entry pushes a 1-slot RESTORE
                            # frame under the BLAS walk
                            slot0 = jnp.where(is_inst, RESTORE, slot0)
                            w = jnp.where(is_inst, jnp.int32(1), w)
                        base_p = jnp.minimum(sp, FSTK - FR)
                        pushc = (w & LM) != 0
                        _frame_push(stack_ref, j, base_p,
                                    [slot0] + es_[1:], w, pushc, cond_push)
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
                        # pop side effects gated on `can`: an entering row
                        # must leave its just-pushed RESTORE frame intact
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
                    # FIXED push order for closest-hit too: the nearest-
                    # child argmin bought ~9% fewer iterations but its
                    # extract/compare/select chain cost ~19% per
                    # iteration (round-3 lab: bounce fan 1321 -> 1117
                    # ns/iter, primaries 2485 -> 2111); hits stay exact
                    # (t-pruning still bounds every accept)
                    for k in range(width):
                        push = jnp.isfinite(ds_[k]) & interior
                        slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                        prev = stack_ref[j, slot]
                        stack_ref[j, slot] = jnp.where(push, es_[k], prev)
                        sp = sp + jnp.where(push, 1, 0)

                    if instanced:
                        is_inst = live & (e > SLIM_EMPTY)
                        is_rest = live & (e == RESTORE)
                        iid_e = e - SLIM_EMPTY - 1
                        iid_c = jnp.clip(iid_e, 0, num_inst - 1)
                        # entering: push the RESTORE marker under the BLAS walk
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

                    # both entry kinds finish in one iteration: pop or done
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
                    return t, hit, obj, nx, ny, nz, depth, hiid, alive
                return t, hit, obj, nx, ny, nz, depth, alive

            def cond(carry):
                return carry[-1] > 0

            if count_iters:
                inner = body

                def body(carry):
                    it = carry[-2]
                    res = inner(carry[:-2] + (carry[-1],))
                    return res[:-1] + (it + 1, res[-1])

            init = [
                t0,
                jnp.full(shape, -1, jnp.int32),
                jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.int32),
            ]
            if instanced:
                init.append(jnp.full(shape, -1, jnp.int32))
            if count_iters:
                init.append(jnp.int32(0))
            init.append(jnp.int32(1))
            out = jax.lax.while_loop(cond, body, tuple(init))
            t, hit, obj, nx, ny, nz, depth = out[:7]
            t_out[gs] = t.reshape(-1)
            hit_out[gs] = hit.reshape(-1)
            obj_out[gs] = obj.reshape(-1)
            nx_out[gs] = nx.reshape(-1)
            ny_out[gs] = ny.reshape(-1)
            nz_out[gs] = nz.reshape(-1)
            depth_out[gs] = depth.reshape(-1)
            if instanced:
                iid_out[gs] = out[7].reshape(-1)
            else:
                iid_out[gs] = jnp.full((TL,), -1, jnp.int32)
            if count_iters:
                iters_out[iters_slot(g)] = out[-2]


@functools.partial(
    jax.jit,
    static_argnames=("roots", "interpret", "any_hit", "count_depth",
                     "count_iters", "frame_stack", "fused_nn", "pipelined",
                     "nearest", "cond_push", "width", "occl", "rowx",
                     "occl_rows"),
)
def traverse_packet_slim(
    origin, direction, t_init, nodes, ltris, roots,
    *, active=None, interpret: bool = False, any_hit: bool = False,
    count_depth: bool = True, inst_inv=None, inst_root=None,
    count_iters: bool = False, frame_stack: bool | None = None,
    fused_nn: int = 0, pipelined: bool | None = None,
    nearest: bool | None = None, cond_push: bool | None = None,
    width: int = 8, occl: bool = False, pay=None,
    rowx: int | None = None, ents=None, occl_rows: int = 1,
):
    """Slim packet traversal with shading-complete hit payloads.

    `origin`/`direction` are EITHER (N, 3) arrays or 3-tuples of (N,)
    component arrays.  The component form is the fast path: 1-D
    T(1024)-tiled operands enter the kernel without the (N,3)->(N,)
    relayout copies measured at ~22 ms/launch on the benchmark scene
    (tools/profile_census.py fixed-cost fit); the wavefront carries in
    models/integrators.py keep rays in that form end-to-end.

    Slim tables come from models/bvh8.to_slim (nodes (B, 64), ltris
    (NL, 128) leaf records), `roots` is a tuple of root rows pre-seeded
    per sub-packet.  With inst_inv (I, 12) world->object transforms and
    inst_root (I,) BLAS slim root rows, TLAS instance entries are
    traversed in object space (see module docstring).
    Returns (t, original tri id or -1, owning object index, flat normal
    components (nx, ny, nz) -- OBJECT space for instanced hits --
    per-lane bvh_depth, hit instance id or -1).
    """
    if isinstance(origin, tuple):
        ox_c, oy_c, oz_c = origin
    else:
        ox_c, oy_c, oz_c = origin[:, 0], origin[:, 1], origin[:, 2]
    if isinstance(direction, tuple):
        dx_c, dy_c, dz_c = direction
    else:
        dx_c, dy_c, dz_c = direction[:, 0], direction[:, 1], direction[:, 2]
    n0 = ox_c.shape[0]
    roots = tuple(int(r) for r in roots)
    instanced = inst_inv is not None
    if instanced and fused_nn:
        raise ValueError(
            "fused packet tables do not support the instance machinery "
            "(flattened scenes run the plain kernel and may fuse)"
        )
    if occl and (instanced or fused_nn or width not in (8, 16)):
        raise ValueError(
            "occlusion tables (bvh8.to_slim_occl) require the plain "
            "non-instanced split-table kernel (width 8 or 16)"
        )
    if pay is not None and not occl:
        raise ValueError("the payload table (bvh8.occl_payload) rides "
                         "the leaf-14 occl tables (occl=True)")
    if occl_rows not in (1, 2):
        raise ValueError("occl_rows must be 1 or 2")
    if occl_rows == 2 and (not occl or pay is not None):
        raise ValueError(
            "occl_rows=2 (CPUGPU_OCCL2 fat shadow leaves) requires the "
            "bare occlusion tables (occl=True, no payload rows)")
    # occl + any_hit=False without pay is a t-only query (exact t and
    # iteration counts; hit is a 0/1 flag and the shading payloads are
    # garbage) -- used by the offline tree labs.  With pay, occl is the
    # full shading-complete LEAF-14 closest-hit mode.
    frame_stack, nearest = _resolve_width_flags(
        width, 1 if instanced else 0, frame_stack, nearest, any_hit)
    if pipelined is None:
        # the pipelined body runs on fused OR split tables (split issues
        # both speculative row loads); only the instance machinery's
        # mutable ray registers are incompatible -- degrade silently so
        # the env default composes with instanced scenes
        pipelined = PIPELINED_DEFAULT and not instanced
    elif pipelined and instanced:
        raise ValueError(
            "pipelined packet body does not support the instance "
            "machinery (flatten the scene)")
    if cond_push is None:
        cond_push = CONDPUSH_DEFAULT and frame_stack
    rowx = _resolve_rowx(
        rowx, 1 if instanced else 0, fused_nn, width, nearest)
    ents, smem_mode, smem_nn = _resolve_smem(
        ents, nodes, roots, frame_stack,
        1 if instanced else 0, fused_nn, width, rowx)
    _check_table_width(nodes, width, fused_nn, smem_mode)
    step = GROUPS * TILE
    n = -(-n0 // step) * step
    num_steps = n // step
    num_tiles = n // (TILE * rowx)
    if active is None:
        act = jnp.ones((n0,), jnp.int32)
    else:
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
    if pay is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(pay)
    if smem_mode:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        # FLAT layout: see _smem_pop (2-D SMEM windows pad rows to 512 B)
        inputs.append(ents.astype(jnp.int32).reshape(-1))
    if frame_stack:
        stack_slots = (2 if smem_mode else width + 1) * FSTACK_FRAMES
    else:
        stack_slots = STACK
    scratch = [
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM((ROWS,), jnp.int32),
        pltpu.SMEM((ROWS, stack_slots), jnp.int32),
    ]
    if pipelined:
        scratch.append(pltpu.SMEM((ROWS,), jnp.int32))  # entry2 (next)
    if instanced:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs += [inst_inv, inst_root.astype(jnp.int32)]
        scratch += [
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.VMEM((9 * ROWS, LANES), jnp.float32),
        ]
    in_specs += [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8

    out_specs = [
        pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 8
    out_shape = [
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
    ]
    if count_iters:
        # whole array per step (rank-1 SMEM blocks can't be tile-blocked
        # on compiled TPU); the kernel writes its program_id slot.
        # Interpret mode CAN block it -- and must (its CPU lowering has
        # no program_id), so the kernel indexes within the step there.
        if interpret:
            out_specs.append(pl.BlockSpec(
                (GROUPS // rowx,), lambda i: (i,), memory_space=pltpu.SMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((num_tiles,), jnp.int32))

    res = pl.pallas_call(
        functools.partial(
            _traverse_kernel,
            roots=roots,
            any_hit=any_hit,
            count_depth=count_depth,
            instanced=instanced,
            count_iters=count_iters,
            frame_stack=frame_stack,
            fused_nn=fused_nn,
            pipelined=pipelined,
            nearest=nearest and frame_stack,
            interp=interpret,
            cond_push=cond_push and frame_stack,
            width=width,
            occl=occl,
            with_pay=pay is not None,
            rowx=rowx,
            smem_mode=smem_mode,
            smem_nn=smem_nn,
            occl_rows=occl_rows,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *inputs,
        ox_c, oy_c, oz_c,
        dx_c, dy_c, dz_c,
        t_init, act,
    )
    t, hit, obj, nx, ny, nz, depth, iid = res[:8]
    base = (
        t[:n0], hit[:n0], obj[:n0],
        (nx[:n0], ny[:n0], nz[:n0]), depth[:n0], iid[:n0],
    )
    if count_iters:
        return base + (res[8],)
    return base
