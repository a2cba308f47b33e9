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
    from cpugpupathtracing_tpu.models.scene import make_reference_scene, packet_tables
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    scene = make_reference_scene()
    dev = scene.device()
    # route through the SAME table/flag selection the bench uses, so the
    # gate proves the kernel variant actually being timed
    p_nodes, p_ltris, p_fused_nn, p_ents = packet_tables(dev)

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
        o, d, t0, p_nodes, p_ltris, dev.proots, fused_nn=p_fused_nn,
        width=dev.packet_width, ents=dev.pents,
    )
    _, hit_any, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, p_nodes, p_ltris, dev.proots, any_hit=True,
        fused_nn=p_fused_nn, width=dev.packet_width, ents=dev.pents,
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
    res = {
        "ok": True,
        "checked": int(n_rays),
        "backend": jax.default_backend(),
        "max_t_rel": max_rel,
    }

    # CPUGPU_OCCL / CPUGPU_LEAF14: the benched megakernels route shadow
    # any-hits (and, under LEAF14, the closest-hit traversal itself)
    # over the leaf-14 occl tables -- prove THOSE compiled kernels too.
    from cpugpupathtracing_tpu.models.scene import PACKET_OCCL2, occl_tables

    occ = occl_tables(dev)
    if occ is not None:
        onodes, oltris, oroots, oents = occ
        _, ohit, *_ = tps.traverse_packet_slim(
            o, d, t0, onodes, oltris, oroots, any_hit=True, occl=True,
            ents=oents, occl_rows=2 if PACKET_OCCL2 else 1,
        )
        o_mism = int(((np.asarray(ohit) >= 0) != hm).sum())
        assert o_mism == 0, (
            f"{o_mism} occl-table any-hit occlusion mismatches"
        )
        res["occl_any_hit_checked"] = True
        if dev.poccl_pay is not None:
            lt, lhit, lobj, lnrm, _, _ = tps.traverse_packet_slim(
                o, d, t0, onodes, oltris, oroots, occl=True,
                pay=dev.poccl_pay,
            )
            # identical nearest triangle + bitwise t/payload vs the
            # shading tables (equal-t ties aside; none in this ray set
            # -- the shading gate above already pinned ids to the
            # oracle, so equality here is id exactness again)
            l_mism = int((np.asarray(lhit) != hit_np).sum())
            assert l_mism == 0, (
                f"{l_mism} leaf-14 closest-hit ids differ from the "
                "shading tables"
            )
            np.testing.assert_array_equal(
                np.asarray(lt)[hm], t_np[hm], err_msg="leaf-14 t"
            )
            np.testing.assert_array_equal(
                np.asarray(lobj)[hm], np.asarray(obj)[hm],
                err_msg="leaf-14 obj",
            )
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(lnrm[c])[hm], np.asarray(normal[c])[hm],
                    err_msg=f"leaf-14 normal[{c}]",
                )
            res["leaf14_checked"] = True
    return res


def check_parity_instanced(n_rays: int = 2048, chunk: int = 512, seed: int = 9) -> dict:
    """Compiled parity for the INSTANCED packet kernel (TLAS entries,
    SMEM transforms, RESTORE markers -- ops/traverse_packet_slim.py:323-379),
    which interpret-mode tests cover off-chip only.  Oracle: per-instance
    object-space brute force over the shared BLAS triangles, nearest
    across instances.  Asserts exact (tri id, instance id) equality and
    close world-space t.  Raises AssertionError on failure."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    rng = np.random.default_rng(seed)
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    mesh = meshlib.icosphere(subdivisions=3)  # 1280 tris
    mats = []
    for i in range(6):
        ang = 2 * np.pi * i / 6
        c, sn = np.cos(ang), np.sin(ang)
        scale = 0.6 + 0.15 * i
        m = np.array(
            [
                [c * scale, 0, sn * scale, 3.0 * c],
                [0, scale, 0, 0.4 * i - 1.0],
                [-sn * scale, 0, c * scale, 3.0 * sn],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
        mats.append(m)
    s.add_instanced_mesh("spheres", mesh, white, np.stack(mats))
    dev = s.device()

    o_np = rng.normal(size=(n_rays, 3)).astype(np.float32) * 5
    aim = rng.normal(size=(n_rays, 3)).astype(np.float32) * 2
    d_np = aim - o_np
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    t0 = jnp.full((n_rays,), RAY_TMAX, jnp.float32)

    hit = intersect_scene(dev, o, d, t0)
    k_t = np.asarray(hit.t)
    k_tri = np.asarray(hit.prim)
    k_iid = np.asarray(hit.inst)

    if dev.packet_flattened:
        # FLATTENED path (production default): the kernel traverses
        # world-space leaf records, so the oracle is brute force over
        # those same records -- tri id must match exactly, t to fp
        # tolerance (the oracle orders float ops differently), and
        # every hit is a world-space hit (iid == -1)
        lt = np.asarray(dev.pltris)
        ids = lt.view(np.int32)
        tris_l, tid_l = [], []
        for k in range(8):
            r = lt[:, 16 * k : 16 * k + 16]
            m = ids[:, 16 * k + 13] >= 0
            tris_l.append(r[m, 0:9])
            tid_l.append(ids[m, 16 * k + 13])
        tris = np.concatenate(tris_l)
        tid = np.concatenate(tid_l)
        v0 = jnp.asarray(tris[:, 0:3])
        e1 = jnp.asarray(tris[:, 3:6])
        e2 = jnp.asarray(tris[:, 6:9])
        best_t = np.full(n_rays, np.float32(RAY_TMAX))
        best_tri = np.full(n_rays, -1, np.int32)
        for st in range(0, n_rays, chunk):
            bt, bidx = intersect.brute_force_nearest_triangle(
                o[st : st + chunk], d[st : st + chunk],
                v0, e1, e2, jnp.asarray(best_t[st : st + chunk]),
            )
            bt = np.asarray(bt)
            bidx = np.asarray(bidx)
            better = bidx >= 0
            sl = slice(st, st + chunk)
            best_t[sl] = np.where(better, bt, best_t[sl])
            best_tri[sl] = np.where(better, tid[bidx], best_tri[sl])
        best_iid = np.full(n_rays, -1, np.int32)
    else:
        b = s.objects[0].bvh
        v0 = jnp.asarray(b.tri_v0)
        e1 = jnp.asarray(b.tri_v1 - b.tri_v0)
        e2 = jnp.asarray(b.tri_v2 - b.tri_v0)
        best_t = np.full(n_rays, np.float32(RAY_TMAX))
        best_tri = np.full(n_rays, -1, np.int32)
        best_iid = np.full(n_rays, -1, np.int32)
        for iid, m in enumerate(mats):
            inv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
            oo = o_np @ inv[:3, :3].T + inv[:3, 3]
            dd = d_np @ inv[:3, :3].T  # unnormalized: t stays the world param
            for st in range(0, n_rays, chunk):
                bt, bidx = intersect.brute_force_nearest_triangle(
                    jnp.asarray(oo[st : st + chunk]), jnp.asarray(dd[st : st + chunk]),
                    v0, e1, e2, jnp.asarray(best_t[st : st + chunk]),
                )
                bt = np.asarray(bt)
                bidx = np.asarray(bidx)
                better = bidx >= 0
                sl = slice(st, st + chunk)
                best_t[sl] = np.where(better, bt, best_t[sl])
                best_tri[sl] = np.where(better, bidx, best_tri[sl])
                best_iid[sl] = np.where(better, iid, best_iid[sl])

    mism = int(((k_tri != best_tri) | (k_iid != best_iid)).sum())
    hm = best_tri >= 0
    rel = np.abs(k_t[hm] - best_t[hm]) / np.maximum(np.abs(best_t[hm]), 1e-20)
    max_rel = float(rel.max()) if hm.any() else 0.0
    assert mism == 0, f"{mism}/{n_rays} instanced hits differ from the oracle"
    assert max_rel < 1e-5, f"instanced t deviates rel {max_rel:.2e}"
    assert hm.sum() > n_rays // 10, "degenerate instanced gate: too few hits"
    return {
        "ok": True,
        "checked": int(n_rays),
        "hits": int(hm.sum()),
        "backend": jax.default_backend(),
        "flattened": bool(dev.packet_flattened),
        "max_t_rel": max_rel,
    }


def check_parity_whitted(w: int = 64, h: int = 32, seed: int = 0x1CE) -> dict:
    """Compiled parity for the whole-frame Whitted kernel
    (ops/whitted_kernel.py) vs the XLA wavefront loop, on the chip.
    Contract per tests/test_whitted_kernel.py: traced and rng state
    exact; energy within codegen-FMA ulps outside a small set of
    silhouette occlusion flips, each bounded by one light's attenuated
    contribution.  Raises AssertionError on failure."""
    from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings, RenderMode
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models.whitted import (
        make_whitted_scene,
        trace_whitted,
        trace_whitted_kernel,
    )
    from cpugpupathtracing_tpu.utils import rng as rnglib

    dev = make_whitted_scene().device()
    settings = RenderSettings(render_mode=RenderMode.WHITTED)
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.5, 8.0), aspect=w / h))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d = camlib.lane_rays(cam, lane, w, h)
    state = rnglib.seed_lanes(lane, jnp.uint32(0), salt=seed)

    st_ref, ref = trace_whitted(dev, settings, o, d, state, idx=None)
    st_got, got = trace_whitted_kernel(dev, settings, o, d, state, idx=None)
    assert int(ref.traced_rays) == int(got.traced_rays), "traced mismatch"
    assert np.array_equal(np.asarray(st_ref), np.asarray(st_got)), "rng state"
    ea = np.asarray(ref.energy)
    em = np.asarray(got.energy)
    diff = np.abs(ea - em)
    flips = (diff > 3e-6 + 3e-5 * np.abs(ea)).any(axis=1)
    assert flips.mean() < 0.01, f"{int(flips.sum())} lanes beyond boundary flips"
    assert diff.max() < 0.05, f"flip magnitude {diff.max():.4f}"
    return {
        "ok": True,
        "checked": n,
        "backend": jax.default_backend(),
        "flip_lanes": int(flips.sum()),
        "max_energy_diff": float(diff.max()),
    }


def check_parity_ptframe(w: int = 64, h: int = 32, seed: int = 0x9E7) -> dict:
    """Compiled parity for the whole-frame PT kernel
    (ops/pt_frame_kernel.py) vs the compiled per-depth megakernel
    pipeline, on the chip, over a small mesh scene shaped like the
    pt-frame gate (config 2's family).  Both paths emit the SAME
    traversal and shading ops (interpret mode is bitwise,
    tests/test_pt_frame.py); compiled they may differ by Mosaic
    scheduling/FMA ulps plus NEE occlusion boundary flips -- the
    megakernel contract.  Traced and RNG state are integer math and
    must be EXACT.  Raises AssertionError on failure."""
    from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings
    from cpugpupathtracing_tpu.models import camera as camlib
    from cpugpupathtracing_tpu.models import integrators
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import Scene, pt_frame_gate_reason
    from cpugpupathtracing_tpu.utils import rng as rnglib

    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.85, 0.85, 0.85)))
    shiny = s.add_material(
        matlib.Material.diffuse((0.9, 0.7, 0.3), specular=0.35))
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    s.add_mesh("ball", meshlib.icosphere(radius=1.5, subdivisions=2), shiny)
    s.add_mesh("ground", meshlib.ground_quad(y=-2.0), white)
    li = s.add_sphere("light", (10.0, 10.0, 10.0), 5.0, light)
    s.mark_light(li)
    dev = s.device()
    settings = RenderSettings()
    reason = pt_frame_gate_reason(dev, settings)
    assert reason is None, f"pt-frame gate unexpectedly closed: {reason}"

    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.5, 7.0), aspect=w / h))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d = camlib.lane_rays(cam, lane, w, h)
    state = rnglib.seed_lanes(lane, jnp.uint32(0), salt=seed)

    st_ref, ref = integrators.trace_advanced_mega(dev, settings, o, d, state)
    st_got, got = integrators.trace_advanced_frame(dev, settings, o, d, state)
    assert int(ref.traced_rays) == int(got.traced_rays), "traced mismatch"
    assert np.array_equal(np.asarray(st_ref), np.asarray(st_got)), "rng state"
    ea = np.asarray(ref.energy)
    em = np.asarray(got.energy)
    diff = np.abs(ea - em)
    flips = (diff > 3e-6 + 3e-5 * np.abs(ea)).any(axis=1)
    assert flips.mean() < 0.03, f"{int(flips.sum())} lanes beyond boundary flips"
    assert diff.max() < 0.05, f"flip magnitude {diff.max():.4f}"
    return {
        "ok": True,
        "checked": n,
        "backend": jax.default_backend(),
        "flip_lanes": int(flips.sum()),
        "max_energy_diff": float(diff.max()),
    }


if __name__ == "__main__":
    out = check_parity()
    print(f"TPU parity gate OK: {out}")
    out2 = check_parity_instanced()
    print(f"TPU instanced parity gate OK: {out2}")
    out3 = check_parity_whitted()
    print(f"TPU whitted kernel parity gate OK: {out3}")
    out4 = check_parity_ptframe()
    print(f"TPU whole-frame PT kernel parity gate OK: {out4}")
