"""Expected-pops cost model for wide-BVH arity W on the benchmark
dragon: the packet kernel pays one iteration per popped entry, and a
uniform random ray pushes an entry with probability ~ SA(entry), so
expected iterations ~ sum over emitted child entries of SA(entry)
(the collapse_sah objective).  This sweeps the DP over W = 4..16 to
see whether a 16-wide node row -- exactly (B, 128): 16x6 bounds + 16
entries + 16 counts -- would cut pops enough to pay for the doubled
slab phase (which the pipelined body overlaps with scalar control).

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/width_model.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import bvh as bvhlib
from cpugpupathtracing_tpu.models.bvh import _half_area
from cpugpupathtracing_tpu.models.mesh import dragon_standin


def dp_cost(b, width: int, leaf_max: int = 8):
    """collapse_sah's DP cost (models/bvh8.py) generalized to `width`
    slots, returning (total emitted-entry SA, wide node count, leaf row
    count, mean slot fill) without reconstructing tables."""
    n_nodes = b.num_nodes
    lf = b.left_first.astype(np.int64)
    pc = b.prim_count.astype(np.int64)
    nmin, nmax = b.nodes_min, b.nodes_max
    is_leaf = pc > 0
    e = np.maximum(nmax - nmin, 0.0).astype(np.float64)
    sa = np.maximum(
        e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0], 1e-12
    )

    t_count = np.where(is_leaf, pc, 0)
    for n in range(n_nodes - 1, -1, -1):
        if not is_leaf[n]:
            t_count[n] = t_count[lf[n]] + t_count[lf[n] + 1]

    INF = np.inf
    C = np.full((n_nodes, width), INF)
    choice = np.full((n_nodes, width), -9, np.int16)
    for n in range(n_nodes - 1, -1, -1):
        if is_leaf[n]:
            C[n, :] = sa[n]
            choice[n, :] = -1
            continue
        l, r = int(lf[n]), int(lf[n]) + 1
        A = np.full(width, INF)
        Aj = np.zeros(width, np.int16)
        for i in range(2, width + 1):
            js = np.arange(1, i)
            v = C[l, js - 1] + C[r, i - js - 1]
            k = int(np.argmin(v))
            A[i - 1] = v[k]
            Aj[i - 1] = js[k]
        c_leaf = sa[n] if t_count[n] <= leaf_max else INF
        c_node = sa[n] + A[width - 1]
        if c_leaf <= c_node:
            C[n, 0], choice[n, 0] = c_leaf, -1
        else:
            C[n, 0], choice[n, 0] = c_node, -2
        for i in range(2, width + 1):
            if C[n, i - 2] <= A[i - 1]:
                C[n, i - 1] = C[n, i - 2]
                choice[n, i - 1] = -3
            else:
                C[n, i - 1] = A[i - 1]
                choice[n, i - 1] = Aj[i - 1]

    # count wide nodes / leaf rows by reconstruction walk (no tables)
    import sys as _s
    _s.setrecursionlimit(100000)

    def decompose(n, i):
        while i > 1 and choice[n, i - 1] == -3:
            i -= 1
        if i == 1:
            return [n]
        j = int(choice[n, i - 1])
        l, r = int(lf[n]), int(lf[n]) + 1
        return decompose(l, j) + decompose(r, i - j)

    nodes = leaves = 0
    fill = 0
    stack = [decompose(0, width) if not is_leaf[0] else [0]]
    while stack:
        slots = stack.pop()
        nodes += 1
        fill += len(slots)
        for s in slots:
            if choice[s, 0] == -1:
                leaves += 1
            else:
                stack.append(decompose(s, width))
    return C[0, 0], nodes, leaves, fill / nodes


def main():
    m = dragon_standin()
    print(f"dragon stand-in: {len(m.indices) // 3} tris", flush=True)
    for opt, name in ((BuildOption.SAH_SPLIT_PRIMITIVES, "sweep"),
                      (BuildOption.SAH_SPLIT_INTERVALS, "intervals")):
        b = bvhlib.build(m.positions, m.normals, m.indices, opt,
                         max_leaf_size=8)
        root_sa = _half_area(b.nodes_min[0], b.nodes_max[0])
        print(f"binary [{name}]: {b.num_nodes} nodes", flush=True)
        base = None
        for w in (4, 8, 12, 16):
            cost, nn, nl, fill = dp_cost(b, w)
            rel = cost / base if base else 1.0
            if base is None:
                base = cost
            print(f"  W={w:2d}: cost {cost / root_sa:8.2f} x rootSA "
                  f"(rel {rel:5.3f})  nodes {nn:6d} leafrows {nl:6d} "
                  f"fill {fill:4.1f}/{w}", flush=True)


if __name__ == "__main__":
    main()
