"""SMEM input-operand limits on the deployed toolchain (round-4).

Measured 2026-08-20 on the tunneled v5e AOT compile helper (committed
per ADVICE r3 so the evidence survives box wipes):

  * 1-D s32 SMEM *input* windows are DENSE: s32[260_000] = 1016 KB
    compiles AND executes (the budget the 2-D rejection reported is
    1 MB = 1048576 B, so dense 1-D inputs can use nearly all of it
    when little else sits in SMEM).
  * 2-D (B, 8) s32 SMEM input windows pad EACH ROW to 512 bytes (the
    AOT rejection for the benchmark tree showed u8[1527808] for
    s32[2981, 8], i.e. 512 B/row = 16x waste): never ship per-node
    side tables in 2-D SMEM form -- flatten to 1-D (node*8 + slot).
  * SMEM *scratch* is budgeted from the same 1 MB: the round-3 'entry
    mirror exceeds SMEM' rejection was a scratch allocation.

Run (tunnel up): python tools/smem_probe.py [elems...]
Each probe compiles + executes a trivial kernel whose SMEM input is
read at a dynamic scalar index, printing OK/FAIL per size.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tab_ref, idx_ref, out_ref, *, shape2d):
    i = idx_ref[0]
    if shape2d:
        v = tab_ref[i, 3]
    else:
        v = tab_ref[i * 8 + 3]
    out_ref[0] = v


def probe(elems: int, shape2d: bool = False) -> bool:
    shape = (elems // 8, 8) if shape2d else (elems,)
    tab = jnp.arange(np.prod(shape), dtype=jnp.int32).reshape(shape)
    idx = jnp.zeros((1,), jnp.int32)
    try:
        out = pl.pallas_call(
            functools.partial(_kernel, shape2d=shape2d),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(tab, idx)
        got = int(out[0])
        ok = got == 3
        print(f"  {elems:>9} elems ({elems * 4 / 1024:.0f} KB, "
              f"{'2-D' if shape2d else '1-D'}): "
              f"{'OK' if ok else f'WRONG VALUE {got}'}")
        return ok
    except Exception as e:
        print(f"  {elems:>9} elems ({elems * 4 / 1024:.0f} KB, "
              f"{'2-D' if shape2d else '1-D'}): FAIL "
              f"{type(e).__name__}: {str(e)[:140]}")
        return False


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [40_000, 160_000, 260_000]
    print(f"backend: {jax.default_backend()}")
    for n in sizes:
        probe(n, shape2d=False)
    # the padded 2-D form: fails far earlier
    probe(40_000, shape2d=True)
