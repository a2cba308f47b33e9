"""Run kernel_lab variants on the real config-3 bounce population and
compare per-iteration cost.  Full variants must match the production
kernel's hits bit-exactly (asserted); ablation variants are timing-only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import make_reference_scene
from cpugpupathtracing_tpu.ops import sampling, traverse_packet_slim as pk
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX
from tools.kernel_lab import traverse_lab


def main():
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

    # primary hits -> the real depth-1 diffuse bounce population
    t, tri, obj, nrm_c, depth, _ = pk.traverse_packet_slim(
        o, d, t0v, dev.pnodes, dev.pltris, dev.proots, active=act
    )
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
    print(f"bounce population: {int(bact.sum()) / 1e6:.2f}M lanes", flush=True)

    # production-kernel reference hits
    rt, rtri, robj, _, _, _ = jax.block_until_ready(
        pk.traverse_packet_slim(
            bo_c, bd_c, t0v, dev.pnodes, dev.pltris, dev.proots, active=bact
        )
    )
    ref = (np.asarray(rt), np.asarray(rtri), np.asarray(robj))
    mref = np.asarray(bact) != 0

    import os as _os

    which = _os.environ.get("LAB_VARIANTS", "r3")
    if which == "r2":
        variants = [
            ("base (seq phases)", dict(), True),
            ("slab ilv", dict(slab="ilv"), True),
            ("leaf ilv", dict(leaf="ilv"), True),
            ("slab+leaf ilv", dict(slab="ilv", leaf="ilv"), True),
            ("slab+leaf ilv + unroll2",
             dict(slab="ilv", leaf="ilv", unroll=2), True),
        ]
    elif which == "r4":
        variants = [
            ("ilv + fixed order", dict(slab="ilv", leaf="ilv", order="fixed"),
             True),
            ("ilv + fixed + fma",
             dict(slab="ilv", leaf="ilv", order="fixed", fma=True), True),
        ]
    elif which == "r5":
        variants = [
            ("ilv + fixed order", dict(slab="ilv", leaf="ilv", order="fixed"),
             True),
            ("ilv + framestack",
             dict(slab="ilv", leaf="ilv", ctrl="framestack"), True),
        ]
    elif which == "r6":
        # decode-phase attack: unified node|leaf table (one load per
        # row, one address select) alone and on top of the frame stack
        variants = [
            ("ilv + fixed order", dict(slab="ilv", leaf="ilv", order="fixed"),
             True),
            ("ilv + framestack",
             dict(slab="ilv", leaf="ilv", ctrl="framestack"), True),
            ("ilv + fixed + fused",
             dict(slab="ilv", leaf="ilv", order="fixed", decode="fused"),
             True),
            ("ilv + framestack + fused",
             dict(slab="ilv", leaf="ilv", ctrl="framestack", decode="fused"),
             True),
        ]
    else:
        variants = [
            ("ilv", dict(slab="ilv", leaf="ilv"), True),
            ("ilv + fixed order", dict(slab="ilv", leaf="ilv", order="fixed"),
             True),
            ("ilv + packedmask",
             dict(slab="ilv", leaf="ilv", ctrl="packedmask"), True),
        ]

    # A/B the greedy-fat tables against the SAH-DP collapse (same kernel)
    from cpugpupathtracing_tpu.models import bvh8 as bvh8lib

    dragon = scene.objects[0]
    ground = scene.objects[1]
    ddp = bvh8lib.to_slim(
        bvh8lib.collapse_sah(dragon.bvh, leaf_max=8), dragon.bvh.tri_normal
    )
    gdp = bvh8lib.to_slim(
        bvh8lib.collapse_sah(ground.bvh, leaf_max=8), ground.bvh.tri_normal
    )
    # globalize the ground rows/leaves/tri-ids like scene._build_device
    gnodes = gdp.nodes.copy()
    gcidx = gnodes[:, 48:56].view(np.int32)
    gccnt = gnodes[:, 56:64].view(np.int32)
    gcidx[gccnt == 0] += len(ddp.nodes)
    gcidx[gccnt > 0] -= len(ddp.ltris)   # leaf enc -(row+1)
    gltris = gdp.ltris.copy()
    gtid = gltris.view(np.int32)
    for krec in range(8):
        col = gtid[:, 16 * krec + 13]
        col[col >= 0] += dragon.bvh.num_triangles
    dp_nodes = np.concatenate([ddp.nodes, gnodes])
    dp_ltris = np.concatenate([ddp.ltris, gltris])
    dp_nodes_j = jnp.asarray(dp_nodes)
    dp_ltris_j = jnp.asarray(dp_ltris)
    dp_roots = (0, len(ddp.nodes))

    tables = [("greedy", dev.pnodes, dev.pltris, dev.proots)]
    if which not in ("r2", "r4", "r5", "r6"):
        tables.append(("dp", dp_nodes_j, dp_ltris_j, dp_roots))

    if any(o.get("decode") == "fused" for _, o, _ in variants):
        from tools.kernel_lab import fuse_tables

        un_np, unn = fuse_tables(np.asarray(dev.pnodes), np.asarray(dev.pltris))
        un_j = jnp.asarray(un_np)
        fused_dummy = jnp.zeros((1, 128), jnp.float32)
        print(f"fused table: {un_np.shape[0]} rows ({unn} node rows, "
              f"{un_np.nbytes / 1e6:.1f} MB)", flush=True)

    if which == "dual":
        from tools.kernel_lab import traverse_lab_dual

        f = jax.jit(
            lambda o_, d_, a_: traverse_lab_dual(
                o_, d_, t0v, dev.pnodes, dev.pltris, dev.proots, active=a_
            )
        )
        res = jax.block_until_ready(f(bo_c, bd_c, bact))
        t0 = time.perf_counter()
        for _ in range(4):
            res = jax.block_until_ready(f(bo_c, bd_c, bact))
        dt = (time.perf_counter() - t0) / 4
        iters = np.asarray(res[4])
        vt, vtri = np.asarray(res[0]), np.asarray(res[1])
        good = np.array_equal(vt[mref], ref[0][mref]) and np.array_equal(
            vtri[mref], ref[1][mref]
        )
        print(
            f"[greedy] dual-tile           {iters.sum():8d} pair-iters  "
            f"{dt * 1000:7.2f} ms  "
            f"{dt * 1e9 / max(2 * iters.sum(), 1):6.0f} ns/entry  "
            f"{'hits OK' if good else 'HITS MISMATCH'}",
            flush=True,
        )
        return

    for tname, tn, tl, tr in tables:
        for label, opts, check in variants:
            vtn, vtl = tn, tl
            if opts.get("decode") == "fused":
                opts = dict(opts, nn=unn)
                vtn, vtl = un_j, fused_dummy
            opts_t = tuple(sorted(opts.items()))
            try:
                f = jax.jit(
                    lambda o_, d_, a_, ot=opts_t, tn=vtn, tl=vtl, tr=tr: traverse_lab(
                        o_, d_, t0v, tn, tl, tr, active=a_, opts_t=ot,
                    )
                )
                res = jax.block_until_ready(f(bo_c, bd_c, bact))
            except Exception as e:
                print(
                    f"[{tname}] {label:24s} FAILED: {type(e).__name__}: "
                    f"{str(e)[:160]}",
                    flush=True,
                )
                continue
            t0 = time.perf_counter()
            for _ in range(4):
                res = f(bo_c, bd_c, bact)
                jax.block_until_ready(res)
            dt = (time.perf_counter() - t0) / 4
            iters = np.asarray(res[4])
            entries = iters.sum() * opts.get("unroll", 1)
            ok = ""
            if check:
                vt, vtri = np.asarray(res[0]), np.asarray(res[1])
                good = np.array_equal(vt[mref], ref[0][mref]) and np.array_equal(
                    vtri[mref], ref[1][mref]
                )
                ok = "hits OK" if good else "HITS MISMATCH"
            print(
                f"[{tname}] {label:24s} {iters.sum():8d} iters  "
                f"{dt * 1000:7.2f} ms  "
                f"{dt * 1e9 / max(iters.sum(), 1):6.0f} ns/iter  "
                f"{dt * 1e9 / max(entries, 1):6.0f} ns/entry  {ok}",
                flush=True,
            )


if __name__ == "__main__":
    main()
