"""Run kernel_lab2 variants (framestack / fused decode / gated leaf) on
the real config-3 bounce population.  Every variant must match the
production kernel's hits bit-exactly (asserted).  Also reports what
fraction of iterations had >= 1 leaf row (the gated-leaf skip rate is
1 - that).
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
from tools.kernel_lab import fuse_tables
from tools.kernel_lab2 import traverse_lab2, traverse_lab2p


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

    rt, rtri, robj, _, _, _ = jax.block_until_ready(
        pk.traverse_packet_slim(
            bo_c, bd_c, t0v, dev.pnodes, dev.pltris, dev.proots, active=bact
        )
    )
    ref = (np.asarray(rt), np.asarray(rtri))
    mref = np.asarray(bact) != 0

    un_np, nn = fuse_tables(np.asarray(dev.pnodes), np.asarray(dev.pltris))
    un_j = jnp.asarray(un_np)
    dummy = jnp.zeros((1, 128), jnp.float32)
    print(f"fused table: {un_np.shape[0]} rows ({nn} node rows, "
          f"{un_np.nbytes / 1e6:.1f} MB)", flush=True)

    variants = [
        ("linear baseline", dict()),
        ("framestack", dict(frame_stack=True)),
        ("framestack+condpush", dict(frame_stack=True, cond_push=True)),
        ("framestack+fused", dict(frame_stack=True, fused=True)),
        ("framestack+fused+gate", dict(frame_stack=True, fused=True,
                                       gate_leaf=True)),
        ("fs+fused+gate+condpush", dict(frame_stack=True, fused=True,
                                        gate_leaf=True, cond_push=True)),
        ("fused only", dict(fused=True)),
        ("gate only", dict(gate_leaf=True)),
        # software-pipelined body (pop+load before slab): fused required
        ("pipelined linear+fused", dict(pipelined=True, frame_stack=False,
                                        fused=True)),
        ("pipelined fs+fused", dict(pipelined=True, frame_stack=True,
                                    fused=True)),
        ("pipelined fs+fused+nearest", dict(pipelined=True, frame_stack=True,
                                            fused=True, nearest=True)),
        # parent-pointer frames: push = 2 SMEM stores instead of 9 (the
        # attribution's prime suspect); pop re-reads the entry from the
        # node table (one extra overlapped row load + extract chain)
        ("pipelined fs+fused+parent", dict(pipelined=True, frame_stack=True,
                                           fused=True, parent=True)),
        ("pipe fs+fused+near+parent", dict(pipelined=True, frame_stack=True,
                                           fused=True, nearest=True,
                                           parent=True)),
    ]
    only = os.environ.get("LAB2_ONLY", "")
    if only:
        variants = [v for v in variants if only in v[0]]
    for label, kw in variants:
        fused = kw.get("fused", False)
        tn = un_j if fused else dev.pnodes
        tl = dummy if fused else dev.pltris
        pipelined = kw.pop("pipelined", False)
        try:
            if pipelined:
                f = jax.jit(
                    lambda o_, d_, a_, kw=kw, tn=tn, tl=tl: traverse_lab2p(
                        o_, d_, t0v, tn, tl, dev.proots, active=a_,
                        nn=nn, frame_stack=kw["frame_stack"],
                        nearest=kw.get("nearest", False),
                        parent=kw.get("parent", False),
                    )
                )
            else:
                f = jax.jit(
                    lambda o_, d_, a_, kw=kw, tn=tn, tl=tl: traverse_lab2(
                        o_, d_, t0v, tn, tl, dev.proots, active=a_,
                        nn=nn if kw.get("fused") else 0, **kw,
                    )
                )
            res = jax.block_until_ready(f(bo_c, bd_c, bact))
        except Exception as e:
            print(f"{label:26s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(4):
            res = f(bo_c, bd_c, bact)
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / 4
        iters = int(np.asarray(res[3]).sum())
        leafs = int(np.asarray(res[4]).sum())
        vt, vtri = np.asarray(res[0]), np.asarray(res[1])
        good = np.array_equal(vt[mref], ref[0][mref]) and np.array_equal(
            vtri[mref], ref[1][mref]
        )
        print(
            f"{label:26s} {iters:8d} iters  {100 * leafs / max(iters, 1):5.1f}% leaf  "
            f"{dt * 1000:7.2f} ms  {dt * 1e9 / max(iters, 1):6.0f} ns/iter  "
            f"{'hits OK' if good else 'HITS MISMATCH'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
