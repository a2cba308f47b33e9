"""W16 iteration-count measurement on the real config-3 fans: the
production 8-wide sweep_dp tree (best W8 variant, tools/tree_lab.py)
vs the 16-wide lab kernel (tools/kernel_lab3.py) on the SAME rays
under the production sort schedule.  Counts are exact and identical
on CPU and TPU; only ns/iteration needs the chip (queued).

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/tree_lab16.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax

if jax.config.jax_platforms not in ("cpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import scene as scenelib
from tools.kernel_lab3 import scene_tables16, traverse16
from tools.tree_lab import CENSUS, make_fans, morton8, W, H
from tools.tree_lab import run_fan as run_w8  # same W8 measurement recipe


def run_w16(fused, nn, roots, o, d, act, tmax, any_hit, key,
            nearest=False):
    if key is not None:
        perm = jnp.argsort(key)
        o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
    res = jax.jit(lambda o, d, a, t0: traverse16(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, fused, roots, active=a, nn=nn, any_hit=any_hit,
        count_iters=True, interpret=True, nearest=nearest,
    ))(o, d, act, tmax)
    jax.block_until_ready(res)
    return int(np.asarray(res[-1]).sum())


def main():
    print(f"tree_lab16 {W}x{H} backend={jax.default_backend()}", flush=True)
    scene = scenelib.make_reference_scene()
    dev = scene.device()
    fans = make_fans(dev)
    print("fans ready", flush=True)

    # production best-W8: sweep_dp
    scenelib.PACKET_TREE = "sweep_dp"
    dev8 = scenelib.make_reference_scene().device()

    # W16: same sweep binary inputs, width-16 DP collapse
    objs = []
    for oi, obj in enumerate(scene.objects):
        if obj.kind == scenelib.PRIM_MESH:
            pb = obj.bvh.rebuild(
                BuildOption.SAH_SPLIT_PRIMITIVES, max_leaf_size=8)
            objs.append((pb, oi))
    fused, nn, roots = scene_tables16(objs)
    print(f"W16 tables: {nn} node rows, {fused.shape[0] - nn} leaf rows "
          f"({fused.nbytes / 1e6:.1f} MB)", flush=True)

    do_near = os.environ.get("TREELAB16_NEAREST", "") == "1"
    base, w16 = {}, {}
    for name, (o, d, act, tmax, any_hit, sort) in fans.items():
        key = None
        if sort == "compact":
            key = 1 - act
        elif sort == "morton8":
            key = ((1 - act) << 28) | morton8(dev, o, d)
        t0 = time.time()
        base[name] = run_w8(dev8, o, d, act, tmax, any_hit, key)
        w16[name] = run_w16(fused, nn, roots, o, d, act, tmax, any_hit, key)
        extra = ""
        if do_near:
            wn = run_w16(fused, nn, roots, o, d, act, tmax, any_hit, key,
                         nearest=True)
            extra = f"  W16near {wn:8d} ({wn / max(w16[name], 1):.3f})"
        print(f"  {name:9s} W8(sweep_dp) {base[name]:8d}  "
              f"W16 {w16[name]:8d}  ({w16[name] / max(base[name], 1):.3f})  "
              f"[{time.time() - t0:.0f}s]{extra}", flush=True)

    est = sum(CENSUS[k] * w16[k] / max(base[k], 1) for k in CENSUS)
    est0 = sum(CENSUS.values())
    print(f"\nframe-level W16/W8(sweep_dp): {est / est0 * 100:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
