"""Leaf-14 CLOSEST-HIT tree study: would the shading fans also gain
from the occlusion-style fat-leaf DP collapse (14 records/leaf row)?

The occl tables cut the d0 shadow any-hit 13% under the production
frame-stack scheme (tools/occl_lab.py + census A/B); closest-hit fans
(d1 bounce = 233k it, the frame's hottest launch per the round-3
census) might gain similarly.  The occl kernel's t-only query
(occl=True, any_hit=False -- exact t and iteration counts, payloads
hit-flag only) lets us measure those counts offline on CPU before
engineering the payload problem (14 bare records leave no room for
the embedded normal/object/id payload; a real closest-hit leaf14 tree
would need a deferred payload fetch).

Counts use the PRODUCTION frame-stack scheme (the picked bench flags)
to match what the frame would actually pay.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/leaf14_lab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
os.environ["CPUGPU_PACKET_TREE"] = "sweep_dp"
os.environ["CPUGPU_FRAMESTACK"] = "1"
os.environ["CPUGPU_CONDPUSH"] = "1"
os.environ["CPUGPU_PIPELINED"] = "1"
os.environ["CPUGPU_OCCL"] = "1"

import jax

if jax.config.jax_platforms not in ("cpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from tools.tree_lab import make_fans, W, H


def count(o, d, act, tmax, any_hit, nodes, ltris, roots, occl, key=None):
    if key is not None:
        perm = jnp.argsort(key)
        o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
    res = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, nodes, ltris, roots,
        active=a, any_hit=any_hit, count_depth=False, count_iters=True,
        interpret=True, occl=occl,
    ))(o, d, act, tmax)
    jax.block_until_ready(res)
    return int(np.asarray(res[-1]).sum())


def main():
    print(f"leaf14_lab {W}x{H} (sweep_dp + framestack/condpush/pipelined)",
          flush=True)
    dev = scenelib.make_reference_scene().device()
    occ = scenelib.occl_tables(dev)
    assert occ is not None
    onodes, oltris, oroots, oents = occ
    print(f"shading: {dev.pnodes.shape[0]} nodes / "
          f"{dev.pltris.shape[0]} leaf rows; leaf14: "
          f"{onodes.shape[0]} / {oltris.shape[0]}", flush=True)
    fans = make_fans(dev)
    for name, (o, d, act, tmax, any_hit, sort) in fans.items():
        key = None
        if sort == "compact":
            key = 1 - act
        elif sort == "morton8":
            key = scenelib.reorder_key(dev, o, d, act, bits=8)
        a = count(o, d, act, tmax, any_hit,
                  dev.pnodes, dev.pltris, dev.proots, False, key)
        b = count(o, d, act, tmax, any_hit,
                  onodes, oltris, oroots, True, key)
        print(f"  {name:9s} sweep_dp8 {a:8d} it   leaf14 {b:8d} it   "
              f"ratio {b / max(a, 1):.3f}", flush=True)


if __name__ == "__main__":
    main()
