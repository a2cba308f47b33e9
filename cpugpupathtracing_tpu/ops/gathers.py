"""Gather replacements tuned to TPU memory behavior.

XLA's per-lane gather on this part runs at ~130-260 M lookups/s
(~0.5 GB/s for (N,) element gathers -- measured in-jit, tools/profile_
tpu3.py), so a wavefront-sized gather from even a 4-row material table
costs ~15 ms.  For small tables a chain of K broadcast compares + selects
is pure VPU work (~2 ms at 2M lanes for K=8), ~10x faster, and fuses into
neighboring element-wise ops.

The reference's equivalents are plain pointer lookups
(data.materials[mat_index], Source/Main.cpp:336); this module is where
that idiom lands on a machine without cheap random access.
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this row count a real gather wins (K selects each stream the
# whole wavefront; the crossover is ~dozens of rows).
SMALL_TABLE_MAX = 32


def select_rows(table, idx):
    """table[(idx,)] for a SMALL leading-dim table via a select chain.

    table: (K, ...) array with small static K; idx: (N,) integer lanes.
    Returns (N, ...) rows.  Falls back to a real gather above
    SMALL_TABLE_MAX rows.  Out-of-range idx clamps (matching the callers'
    existing jnp.maximum/minimum guards around gathers).
    """
    k = table.shape[0]
    if k == 0:
        raise ValueError("select_rows on an empty table")
    if k > SMALL_TABLE_MAX:
        return table[jnp.clip(idx, 0, k - 1)]
    # clamp so both regimes agree (the select chains below would
    # otherwise leave any out-of-range idx at row 0)
    idx = jnp.clip(idx, 0, k - 1)
    if table.ndim == 1:
        out = jnp.broadcast_to(table[0], idx.shape)
        for row in range(1, k):
            out = jnp.where(idx == row, table[row], out)
        return out
    if table.ndim != 2:
        expand = (slice(None),) + (None,) * (table.ndim - 1)
        out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
        for row in range(1, k):
            out = jnp.where((idx == row)[expand], table[row], out)
        return out
    # 2-column tables select per COLUMN with 1-D predicates: an
    # (N, 1) broadcast predicate materializes in the pathological
    # T(1,128) layout on TPU (measured in the frame xplane profile); the
    # final stack fuses into elementwise consumers
    ncol = table.shape[1]
    cols = [jnp.broadcast_to(table[0, j], idx.shape) for j in range(ncol)]
    for row in range(1, k):
        pred = idx == row
        for j in range(ncol):
            cols[j] = jnp.where(pred, table[row, j], cols[j])
    return jnp.stack(cols, axis=-1)
