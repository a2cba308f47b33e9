"""Per-iteration floor probe: build the packet-kernel while-loop up in
stages (bare loop -> scalar stack control -> dynamic row loads -> slab
vector phase -> leaf vector phase) at a FIXED trip count, to attribute
the measured ~1074 ns/iteration (tools/profile_lab.py) between the
scalar unit, memory, and the VPU.

Every stage runs K fixed iterations per 1024-lane sub-tile over one
4096-lane grid step, so ns/iteration = wall / (4 * K).  Control
consumes the same SMEM stack state as the real kernel (8 conditional
pushes + pop per row) but pushes constants, so trip count is exact and
composition-independent.

    python tools/floor_probe.py
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.models.scene import make_reference_scene

TILE, GROUPS, ROWS, LANES, WIDTH, STACK, K = 1024, 4, 8, 128, 8, 64, 2000


def _probe_kernel(nodes_ref, ltris_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  out_ref, entry_ref, sptr_ref, stack_ref, *, stages):
    shape = (ROWS, LANES)
    for g in range(GROUPS):
        gs = slice(g * TILE, (g + 1) * TILE)
        ox = ox_ref[gs].reshape(shape)
        oy = oy_ref[gs].reshape(shape)
        oz = oz_ref[gs].reshape(shape)
        dx = dx_ref[gs].reshape(shape)
        dy = dy_ref[gs].reshape(shape)
        dz = dz_ref[gs].reshape(shape)
        ix = jnp.where(dx == 0.0, 1e30, 1.0 / dx)
        iy = jnp.where(dy == 0.0, 1e30, 1.0 / dy)
        iz = jnp.where(dz == 0.0, 1e30, 1.0 / dz)
        nrows_total = 64  # rows cycled through by the fake pop sequence

        for j in range(ROWS):
            entry_ref[j] = j
            sptr_ref[j] = 1
            stack_ref[j, 0] = j + 8

        def body(carry):
            t, it = carry
            m = t > -1.0  # always-true live mask, data-dependent shape

            if "loads" in stages:
                nrows, lrows = [], []
                for j in range(ROWS):
                    e = entry_ref[j]
                    node = jnp.where(e >= 0, e % nrows_total, 0)
                    nrows.append(nodes_ref[pl.ds(node, 1), :])
                    lrows.append(ltris_ref[pl.ds(node, 1), :])
                nmat = jnp.concatenate(nrows, axis=0)
                lmat = jnp.concatenate(lrows, axis=0)
            else:
                nmat = jnp.zeros((ROWS, 64), jnp.float32) + t[0, 0]
                lmat = jnp.zeros((ROWS, 128), jnp.float32) + t[0, 0]

            if "slab" in stages:
                R = range(WIDTH)
                tx1 = [(nmat[:, 6 * k + 0 : 6 * k + 1] - ox) * ix for k in R]
                ty1 = [(nmat[:, 6 * k + 1 : 6 * k + 2] - oy) * iy for k in R]
                tz1 = [(nmat[:, 6 * k + 2 : 6 * k + 3] - oz) * iz for k in R]
                tx2 = [(nmat[:, 6 * k + 3 : 6 * k + 4] - ox) * ix for k in R]
                ty2 = [(nmat[:, 6 * k + 4 : 6 * k + 5] - oy) * iy for k in R]
                tz2 = [(nmat[:, 6 * k + 5 : 6 * k + 6] - oz) * iz for k in R]
                tmin = [
                    jnp.maximum(
                        jnp.maximum(jnp.minimum(tx1[k], tx2[k]),
                                    jnp.minimum(ty1[k], ty2[k])),
                        jnp.minimum(tz1[k], tz2[k]),
                    )
                    for k in R
                ]
                tmax = [
                    jnp.minimum(
                        jnp.minimum(jnp.maximum(tx1[k], tx2[k]),
                                    jnp.maximum(ty1[k], ty2[k])),
                        jnp.maximum(tz1[k], tz2[k]),
                    )
                    for k in R
                ]
                bm = [(tmax[k] >= tmin[k]) & (tmin[k] < t) & m for k in R]
                dmin = [
                    jnp.min(jnp.where(bm[k], tmin[k], jnp.inf), axis=1,
                            keepdims=True)
                    for k in R
                ]
                acc = dmin[0]
                for k in range(1, WIDTH):
                    acc = jnp.minimum(acc, dmin[k])
                t = jnp.where(jnp.isfinite(acc), t + 1e-7, t)

            if "leaf" in stages:
                for c in range(8):
                    tm = lmat[:, 16 * c : 16 * c + 12]
                    hx = dy * tm[:, 8:9] - dz * tm[:, 7:8]
                    hy = dz * tm[:, 6:7] - dx * tm[:, 8:9]
                    hz = dx * tm[:, 7:8] - dy * tm[:, 6:7]
                    a = tm[:, 3:4] * hx + tm[:, 4:5] * hy + tm[:, 5:6] * hz
                    det_ok = jnp.abs(a) >= 0.001
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
                    ok = det_ok & (u >= 0.0) & (vv >= 0.0) & ((u + vv) <= 1.0) & (tt > 0.0) & (tt < t) & m
                    t = jnp.where(ok, tt, t)

            if "fctrl" in stages:
                # frame-stack-shaped control: 9 unconditional stores +
                # mask word + ctz pop (constant payloads, fixed trips)
                from cpugpupathtracing_tpu.ops.traverse_packet_slim import _ctz8

                for j in range(ROWS):
                    e = entry_ref[j]
                    interior = e >= 0
                    sp = sptr_ref[j]
                    w = (e % 255) + 1  # nonzero 8-bit mask
                    base_p = jnp.minimum(sp, STACK - 9)
                    for k in range(WIDTH):
                        stack_ref[j, base_p + k] = (e + k + 1) % nrows_total
                    stack_ref[j, base_p + 8] = w
                    sp = sp + jnp.where(interior & (w != 0), 9, 0)
                    sp = jnp.minimum(sp, STACK - 18)  # bound growth
                    can = sp > 0
                    base = jnp.maximum(sp - 9, 0)
                    mw = stack_ref[j, base + 8]
                    ent = stack_ref[j, base + _ctz8(mw)]
                    rem = mw & (mw - 1)
                    stack_ref[j, base + 8] = jnp.where(can, rem, mw)
                    sp = jnp.where(can & (rem == 0), base, sp)
                    nxt = jnp.where(can, ent, 0)
                    sptr_ref[j] = sp
                    entry_ref[j] = nxt
            elif "ctrl" in stages:
                for j in range(ROWS):
                    e = entry_ref[j]
                    interior = e >= 0
                    sp = sptr_ref[j]
                    for k in range(WIDTH):
                        # same shape as the real push loop: conditional
                        # slot select, SMEM read+write, sp bump -- the
                        # pushed value is a constant so trips stay fixed
                        push = interior & ((e + k) % 3 == 0)
                        slot = jnp.where(push, jnp.minimum(sp, STACK - 1), STACK - 1)
                        prev = stack_ref[j, slot]
                        stack_ref[j, slot] = jnp.where(push, (e + k + 1) % nrows_total, prev)
                        sp = sp + jnp.where(push, 1, 0)
                    sp = jnp.minimum(sp, STACK - 8)  # bound growth
                    can = sp > 0
                    top = stack_ref[j, jnp.maximum(sp - 1, 0)]
                    nxt = jnp.where(can, top, 0)
                    sptr_ref[j] = jnp.where(can, sp - 1, sp)
                    entry_ref[j] = nxt
            else:
                for j in range(ROWS):
                    entry_ref[j] = (entry_ref[j] + 1) % nrows_total

            return t, it + 1

        out = jax.lax.while_loop(lambda c: c[-1] < K, body,
                                 (ox * 0.0 + 1.0, jnp.int32(0)))
        out_ref[gs] = out[0].reshape(-1)


def run(stages, nodes, ltris, cols):
    step = GROUPS * TILE
    f = pl.pallas_call(
        functools.partial(_probe_kernel, stages=stages),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((step,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((step,), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS,), jnp.int32),
            pltpu.SMEM((ROWS, STACK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda *a: f(*a))
    res = jax.block_until_ready(g(nodes, ltris, *cols))
    t0 = time.perf_counter()
    for _ in range(3):
        res = jax.block_until_ready(g(nodes, ltris, *cols))
    dt = (time.perf_counter() - t0) / 3
    iters = GROUPS * K
    print(f"{'+'.join(stages) or 'loop':28s} {dt * 1e6:9.1f} us "
          f"{dt * 1e9 / iters:7.0f} ns/iter", flush=True)
    return dt


def main():
    dev = make_reference_scene().device()
    step = GROUPS * TILE
    rng = np.random.default_rng(0)
    cols = tuple(
        jnp.asarray(rng.normal(size=step).astype(np.float32) + 0.5)
        for _ in range(6)
    )
    nodes, ltris = dev.pnodes, dev.pltris
    for stages in [
        (),
        ("ctrl",),
        ("fctrl",),
        ("loads",),
        ("ctrl", "loads"),
        ("fctrl", "loads"),
        ("ctrl", "loads", "slab"),
        ("ctrl", "loads", "leaf"),
        ("ctrl", "loads", "slab", "leaf"),
        ("fctrl", "loads", "slab", "leaf"),
    ]:
        run(stages, nodes, ltris, cols)


if __name__ == "__main__":
    main()
