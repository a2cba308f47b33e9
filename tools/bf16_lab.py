"""bf16 node-bounds lab: the OFFLINE half of the precision experiment
(SURVEY Phase 6 / round-2 verdict item 9).

The idea: store packet node-row child bounds in bfloat16 (min rounded
toward -inf, max toward +inf -- boxes only grow, so culling stays
conservative and triangle tests adjudicate hits exactly).  The payoff
would be halved node-row bytes and halved VPU slab work; the cost is
extra iterations from false-positive slab passes.

This lab measures the COST side exactly, with no chip time: it
quantizes the production tables (any CPUGPU_PACKET_TREE variant) and
replays tools/tree_lab.py's four benchmark fans through the
interpret-mode counting kernel, asserting hit equality along the way.

The BENEFIT side is already measured and null: the round-3
per-iteration attribution (tools/kernel_lab.py fma/packedmask ablations,
CLAUDE.md) shows the slab arithmetic is NOT the critical path -- the
~1.07 us iteration is latency-bound on the scalar pop/decode/push
chain, and halving VPU slab bytes moves none of it.  So any iteration
inflation measured here is pure regression; this lab exists to record
the win/loss with numbers either way.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/bf16_lab.py
    TREELAB_W=256 TREELAB_H=144 BF16_MODES=,sweep_dp,w16 ...
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
os.environ.setdefault("TREELAB_W", "256")
os.environ.setdefault("TREELAB_H", "144")

import jax

if jax.config.jax_platforms not in ("cpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tree_lab
from cpugpupathtracing_tpu.models import scene as scenelib

MODES = os.environ.get("BF16_MODES", ",sweep_dp,w16").split(",")


def bf16_toward(x: np.ndarray, up: bool) -> np.ndarray:
    """Nearest bfloat16-representable value at or beyond x in the given
    direction (up = toward +inf), returned as f32.  Truncating the low
    16 mantissa bits rounds toward zero; when that moved the value the
    wrong way, one bf16 ulp AWAY from zero (bits + 0x10000, sign
    included) lands on the conservative side."""
    x = np.asarray(x, np.float32)
    tr = x.view(np.uint32) & np.uint32(0xFFFF0000)
    y = tr.view(np.float32)
    adj = (y < x) if up else (y > x)
    tr = tr + np.where(adj, np.uint32(0x10000), np.uint32(0)).astype(np.uint32)
    return tr.view(np.float32)


def dilate_tables(dev):
    """DeviceScene copy whose packet node-row child bounds are
    bf16-dilated (entries/counts columns untouched, leaf records exact)."""
    pn = np.asarray(dev.pnodes).copy()
    w = pn.shape[1] // 8
    for k in range(w):
        c = 6 * k
        pn[:, c : c + 3] = bf16_toward(pn[:, c : c + 3], up=False)
        pn[:, c + 3 : c + 6] = bf16_toward(pn[:, c + 3 : c + 6], up=True)
    return dataclasses.replace(dev, pnodes=jnp.asarray(pn))


def main():
    W, H = tree_lab.W, tree_lab.H
    print(f"bf16_lab {W}x{H} backend={jax.default_backend()}", flush=True)
    base_dev = scenelib.make_reference_scene().device()
    fans = tree_lab.make_fans(base_dev)
    print("fans ready", flush=True)

    for mode in MODES:
        scenelib.PACKET_TREE = mode
        dev = scenelib.make_reference_scene().device()
        qdev = dilate_tables(dev)

        # hit-exactness gate: dilation only adds slab passes, so the
        # nearest hit must be identical on every fan
        for name, (o, d, act, tmax, any_hit, _s) in fans.items():
            r0 = tree_lab.trace(dev, o, d, act, tmax, any_hit)
            r1 = tree_lab.trace(qdev, o, d, act, tmax, any_hit)
            np.testing.assert_array_equal(
                np.asarray(r0[1]), np.asarray(r1[1]), err_msg=f"{name} tri"
            )
            np.testing.assert_array_equal(
                np.asarray(r0[0]), np.asarray(r1[0]), err_msg=f"{name} t"
            )
        print(f"  [{mode or 'default'}] hits exact under dilation", flush=True)

        rows = {}
        for name, (o, d, act, tmax, any_hit, sort) in fans.items():
            key = None
            if sort == "compact":
                key = 1 - act
            elif sort == "morton8":
                key = ((1 - act) << 28) | tree_lab.morton8(dev, o, d)
            t0 = time.time()
            it_f32 = tree_lab.run_fan(dev, o, d, act, tmax, any_hit, key)
            it_bf = tree_lab.run_fan(qdev, o, d, act, tmax, any_hit, key)
            rows[name] = (it_f32, it_bf)
            print(
                f"  [{mode or 'default'}] {name:9s} f32 {it_f32:8d}  "
                f"bf16 {it_bf:8d}  ({it_bf / max(it_f32, 1) * 100:.2f}% "
                f"of f32, {time.time() - t0:.0f}s)",
                flush=True,
            )
        est_f32 = sum(
            tree_lab.CENSUS[k] for k in tree_lab.CENSUS
        )
        est_bf = sum(
            tree_lab.CENSUS[k] * rows[k][1] / max(rows[k][0], 1)
            for k in tree_lab.CENSUS
        )
        print(
            f"  [{mode or 'default'}] frame-weighted bf16 iterations: "
            f"{est_bf / est_f32 * 100:.2f}% of f32",
            flush=True,
        )


if __name__ == "__main__":
    main()
