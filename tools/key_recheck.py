"""Re-validate the landed sort-key schedule against a packet-tree
variant: the round-3 schedule (stable compaction at the depth-0
boundary, 8-bit origin morton on scattered fans, no shadow sort) was
measured on the DEFAULT tree (tools/fan_lab.py, on-chip); a tree with
different node granularity could move the optimum.  Exact interpret
counts, so no chip needed.

    PYTHONPATH= JAX_PLATFORMS=cpu TREELAB_W=256 TREELAB_H=144 \
        KEYCHECK_TREE=sweep_dp python tools/key_recheck.py
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

from cpugpupathtracing_tpu.models import scene as scenelib
from tools.tree_lab import make_fans, morton8, run_fan, W, H


def spread5(v):
    v = (v | (v << 8)) & 0x0300F
    v = (v | (v << 4)) & 0x030C3
    v = (v | (v << 2)) & 0x09249
    return v


def morton5(dev, o, d):
    q5 = jnp.clip(((o - dev.world_lo) * dev.world_inv_extent * 32.0)
                  .astype(jnp.int32), 0, 31)
    mor = (spread5(q5[:, 0]) | (spread5(q5[:, 1]) << 1)
           | (spread5(q5[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    return (octant << 15) | mor


def main():
    mode = os.environ.get("KEYCHECK_TREE", "sweep_dp")
    print(f"key_recheck {W}x{H} tree={mode or 'default'}", flush=True)
    base = scenelib.make_reference_scene()
    dev0 = base.device()
    fans = make_fans(dev0)
    scenelib.PACKET_TREE = mode
    dev = scenelib.make_reference_scene().device()
    print("fans ready", flush=True)

    def keys_for(o, d, act):
        return {
            "nosort": None,
            "compact": 1 - act,
            "compact|mor5": ((1 - act) << 19) | morton5(dev, o, d),
            "compact|mor8": ((1 - act) << 28) | morton8(dev, o, d),
        }

    for name, (o, d, act, tmax, any_hit, _sort) in fans.items():
        print(f"{name}:", flush=True)
        for lbl, key in keys_for(o, d, act).items():
            t0 = time.time()
            it = run_fan(dev, o, d, act, tmax, any_hit, key)
            print(f"  {lbl:14s} {it:8d} it  [{time.time() - t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
