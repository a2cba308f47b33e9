"""Wider-packet-row study: would 256-lane (or 512-lane) rows pay?

The packet kernel walks one stack per 128-lane row; per-iteration cost
is ~1.1 us of which only ~0.4-0.5 us is vector ALU (kernel_lab ns/iter
fits), the rest scalar pop/push chains and row-load latency that do
NOT scale with row width.  Doubling the lanes per row would double the
vector ALU but halve the number of stacks walked per lane -- IF the
union node-walk of 256 adjacent (sorted) lanes is not much bigger than
a 128-lane walk.

This lab measures that union growth EXACTLY without kernel surgery:
after applying the production sort key, every-other-lane decimation
makes one 128-lane row span the same ray spread as a 256-lane row, so
its interpret-mode iteration count IS the 256-wide row's count (slab
unions depend on the ray spread; decimated t-evolution tracks the same
rays).  Cost model per 2N lanes:

    current:  2 tiles x T_norm iterations  @ it_ns
    2x rows:  1 tile  x T_dec  iterations  @ it_ns + alu_ns

so 2x-wide wins when T_dec/T_norm < 2 / (1 + alu_frac); with
alu_frac ~0.45 the break-even ratio is ~1.38 (i.e. union growth up to
+38% still wins).  Stride-4 rows analogously vs 4 / (1 + 3*alu_frac).

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/widerow_lab.py
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

import jax

if jax.config.jax_platforms not in ("cpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from tools.tree_lab import make_fans, morton8, W, H


def count(dev, o, d, act, tmax, any_hit):
    res = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, dev.pnodes, dev.pltris, dev.proots,
        active=a, any_hit=any_hit, count_depth=False, count_iters=True,
        interpret=True,
    ))(o, d, act, tmax)
    jax.block_until_ready(res)
    return int(np.asarray(res[-1]).sum())


def main():
    print(f"widerow_lab {W}x{H} (sweep_dp, production sort keys)",
          flush=True)
    dev = scenelib.make_reference_scene().device()
    fans = make_fans(dev)
    for name, (o, d, act, tmax, any_hit, sort) in fans.items():
        key = None
        if sort == "compact":
            key = 1 - act
        elif sort == "morton8":
            key = ((1 - act) << 28) | morton8(dev, o, d)
        if key is not None:
            perm = jnp.argsort(key)
            o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
        base = count(dev, o, d, act, tmax, any_hit)
        line = f"  {name:9s} base {base:8d} it"
        for stride in (2, 4):
            # average the stride phases: each decimated run stands in
            # for the whole fan walked with stride*128-lane rows
            tot = 0
            for ph in range(stride):
                tot += count(dev, o[ph::stride], d[ph::stride],
                             act[ph::stride], tmax[ph::stride], any_hit)
            dec = tot / stride  # modeled total trips at stride*128 lanes/row
            # union growth per merged row group (1.0 = perfect sharing,
            # `stride` = no sharing / no iteration win at all)
            union = stride * dec / max(base, 1)
            line += (f"   | {stride}x: {dec:9.0f} it "
                     f"({dec / max(base, 1):5.3f}x, union {union:4.2f})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
