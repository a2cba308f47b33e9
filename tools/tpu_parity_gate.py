"""On-chip compiled parity gate for the Pallas traversal fast path.

Interpret-mode tests (tests/test_packet.py) pin the kernel's semantics on
CPU, but Mosaic compilation can legally differ from the interpreter
(flush-to-zero, reduction order, NaN handling).  This gate runs the
COMPILED slim packet kernel on the real chip against the brute-force
all-triangles oracle (ops/intersect.py brute_force_nearest_triangle) on
the benchmark scene and asserts exact hit-id equality and close t.

bench.py runs this before timing, so every recorded perf number
re-proves correctness on the same binary.  Standalone:

    python tools/tpu_parity_gate.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def check_parity(n_rays: int = 2048, chunk: int = 512, seed: int = 5) -> dict:
    """Returns {"ok": bool, "checked": n, "mismatched_ids": k, "max_t_rel": x}.
    Raises AssertionError on failure."""
    from cpugpupathtracing_tpu.config import CameraConfig
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    scene = make_reference_scene()
    dev = scene.device()

    # triangle soup in GLOBAL order (matches the scene's tri offsets)
    v0s, e1s, e2s = [], [], []
    for obj in scene.objects:
        if obj.bvh is not None:
            v0s.append(obj.bvh.tri_v0)
            e1s.append(obj.bvh.tri_v1 - obj.bvh.tri_v0)
            e2s.append(obj.bvh.tri_v2 - obj.bvh.tri_v0)
    v0 = jnp.asarray(np.concatenate(v0s))
    e1 = jnp.asarray(np.concatenate(e1s))
    e2 = jnp.asarray(np.concatenate(e2s))

    # mixed ray set: half camera primaries, half random scene rays
    rng = np.random.default_rng(seed)
    cam = camlib.to_arrays(CameraConfig())
    lane = jnp.asarray(
        rng.choice(1920 * 1080, n_rays // 2, replace=False).astype(np.uint32)
    )
    o1, d1 = camlib.lane_rays(cam, lane, 1920, 1080)
    o2 = jnp.asarray(rng.normal(size=(n_rays - n_rays // 2, 3)).astype(np.float32) * 6)
    aim = jnp.asarray(rng.normal(size=(n_rays - n_rays // 2, 3)).astype(np.float32) * 2)
    d2 = aim - o2
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t0 = jnp.full((n_rays,), RAY_TMAX, jnp.float32)

    t, hit, obj, normal, depth, _iid = tps.traverse_packet_slim(
        o, d, t0, dev.pnodes, dev.pltris, dev.proots
    )
    _, hit_any, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, dev.pnodes, dev.pltris, dev.proots, any_hit=True
    )

    bts, bidxs = [], []
    for s in range(0, n_rays, chunk):
        bt, bidx = intersect.brute_force_nearest_triangle(
            o[s : s + chunk], d[s : s + chunk], v0, e1, e2, t0[s : s + chunk]
        )
        bts.append(np.asarray(bt))
        bidxs.append(np.asarray(bidx))
    bt = np.concatenate(bts)
    bidx = np.concatenate(bidxs)

    hit_np = np.asarray(hit)
    t_np = np.asarray(t)
    mism = int((hit_np != bidx).sum())
    hm = bidx >= 0
    rel = np.abs(t_np[hm] - bt[hm]) / np.maximum(np.abs(bt[hm]), 1e-20)
    max_rel = float(rel.max()) if hm.any() else 0.0
    any_mism = int(((np.asarray(hit_any) >= 0) != hm).sum())
    assert mism == 0, f"{mism}/{n_rays} compiled hit ids differ from the oracle"
    assert max_rel < 1e-5, f"compiled t deviates rel {max_rel:.2e}"
    assert any_mism == 0, f"{any_mism} any-hit occlusion mismatches"
    # depth AOV sanity on the compiled path (was all-zeros in round 1)
    assert int(np.asarray(depth)[hm].min()) >= 1, "bvh_depth AOV is zero on hits"
    return {
        "ok": True,
        "checked": int(n_rays),
        "backend": jax.default_backend(),
        "max_t_rel": max_rel,
    }


if __name__ == "__main__":
    out = check_parity()
    print(f"TPU parity gate OK: {out}")
