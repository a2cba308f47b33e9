"""Occlusion-specialized any-hit tables (bvh8.to_slim_occl, CPUGPU_OCCL).

The NEE shadow test (Source/Main.cpp:452-453) only needs a boolean
"does anything intersect with t < tmax", so shadow rays can traverse a
fatter-leaf tree whose leaf rows pack 14 bare stride-9 triangle records
(no normal/object/id columns).  The occluded bit must be IDENTICAL to
the shading tree's any-hit: same Moller-Trumbore floats, OR over the
same triangle set -- asserted here against the brute-force oracle and,
at scene level, as bitwise energy equality of the full advanced
integrator with the tables on vs off.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import (
    BuildOption, CameraConfig, RenderSettings,
)
from cpugpupathtracing_tpu.models import bvh, bvh8, camera as camlib
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


@pytest.fixture(scope="module")
def occl_pair():
    """(binary BVH, shading slim tables, occlusion slim tables) over one
    icosphere; the two trees cover the same triangle set."""
    m = meshlib.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_PRIMITIVES, max_leaf_size=8)
    s = bvh8.to_slim(bvh8.collapse_sah(b, leaf_max=8), b.tri_normal)
    so = bvh8.to_slim_occl(bvh8.collapse_sah(b, leaf_max=bvh8.OCCL_TRIS))
    return b, s, so


def _rays(rng_np, n):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 4
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_occl_builder_layout(occl_pair):
    b, s, so = occl_pair
    # node rows keep the slim encoding; leaf rows pack <= 14 records
    assert so.nodes.shape[1] == 64
    assert so.ltris.shape[1] == 128
    ccnt = so.nodes[:, 56:64].view(np.int32)
    cidx = so.nodes[:, 48:56].view(np.int32)
    leaf = ccnt > 0
    assert int(ccnt[leaf].max()) <= bvh8.OCCL_TRIS
    # every leaf entry pre-encoded -(row+1), rows in emission order
    rows = -cidx[leaf] - 1
    assert sorted(rows.tolist()) == list(range(so.ltris.shape[0]))
    # the fatter collapse must actually be shallower or equal
    assert so.max_depth <= s.max_depth
    # record count conservation: sum of leaf counts == triangle count
    assert int(ccnt[leaf].sum()) == b.num_triangles
    # padding records are degenerate (all-zero -> det epsilon rejects)
    for r, c in zip(rows, ccnt[leaf]):
        tail = so.ltris[r, bvh8.OCCL_STRIDE * int(c):]
        assert not tail.any()


@pytest.mark.parametrize("frame_stack", [False, True])
@pytest.mark.parametrize("pipelined", [False, True])
def test_occl_matches_oracle(occl_pair, rng_np, frame_stack, pipelined):
    """occl=True occluded bit == brute force == standard any-hit bit."""
    b, s, so = occl_pair
    n = 2048
    o, d = _rays(rng_np, n)
    # mixed tmax: half before the sphere, half generous
    t0 = jnp.asarray(
        np.where(rng_np.random(n) < 0.5, 3.0, RAY_TMAX).astype(np.float32)
    )
    _, h_occ, *_ = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(so.nodes), jnp.asarray(so.ltris), (0,),
        any_hit=True, occl=True, interpret=True,
        frame_stack=frame_stack, pipelined=pipelined,
    )
    _, h_std, *_ = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(s.nodes), jnp.asarray(s.ltris), (0,),
        any_hit=True, interpret=True,
        frame_stack=frame_stack, pipelined=pipelined,
    )
    np.testing.assert_array_equal(
        np.asarray(h_occ) >= 0, np.asarray(h_std) >= 0
    )


def test_occl_t_only_query(occl_pair, rng_np):
    """occl + any_hit=False is the t-only closest-hit query (exact t
    and iteration counts over the leaf-14 tree; payloads are hit-flag
    only) -- t must equal the brute-force nearest t exactly."""
    from cpugpupathtracing_tpu.ops import intersect

    b, s, so = occl_pair
    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, *_ = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(so.nodes), jnp.asarray(so.ltris), (0,),
        occl=True, interpret=True,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit) >= 0, np.asarray(bidx) >= 0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def _scene():
    s = scenelib.Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8,
                                   (0.1, 0.2, 0.2), 1.5)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    s.add_mesh("ball", meshlib.icosphere(subdivisions=1), glass)
    s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
    i = s.add_sphere("light0", (6.0, 6.0, 6.0), 2.0, light)
    s.mark_light(i)
    i = s.add_sphere("light1", (-6.0, 6.0, -4.0), 2.0, light)
    s.mark_light(i)
    return s


def _trace(dev, settings):
    w, h = 64, 32
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 6.0), aspect=2.0))
    lane = jnp.arange(w * h, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=0x7777)
    _, res = integrators.trace_advanced_mega(dev, settings, o, d, state)
    return res


def test_scene_energy_bitwise(monkeypatch):
    """Full advanced-integrator frame: occl tables on vs off is bitwise
    invisible (identical occluded bit -> identical NEE energy adds)."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    settings = RenderSettings(max_ray_depth=3)
    s = _scene()

    monkeypatch.setattr(scenelib, "PACKET_OCCL", False)
    dev_off = s.device()
    assert dev_off.poccl_nodes is None
    ref = _trace(dev_off, settings)

    monkeypatch.setattr(scenelib, "PACKET_OCCL", True)
    s2 = _scene()
    dev_on = s2.device()
    assert dev_on.poccl_nodes is not None
    assert len(dev_on.poccl_roots) == 2  # one root per mesh object
    got = _trace(dev_on, settings)

    assert int(ref.traced_rays) == int(got.traced_rays)
    np.testing.assert_array_equal(
        np.asarray(ref.energy), np.asarray(got.energy)
    )


def _tf(tx=0.0, scale=1.0, yaw=0.0, ty=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [c * scale, 0, s * scale, tx],
            [0, scale * 1.2, 0, ty],
            [-s * scale, 0, c * scale, 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )


def _flat_scene(transforms) -> scenelib.Scene:
    s = scenelib.Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    s.add_instanced_mesh(
        "b", meshlib.icosphere(subdivisions=2), grey, transforms
    )
    return s


def test_flattened_occl_bit_parity(monkeypatch, rng_np):
    """Flattened-instance occl tables (leaf records REPACKED from the
    spliced shading pltris, scene._occl_repack) report the identical
    occluded bit as the shading tables' any-hit."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    monkeypatch.setattr(scenelib, "PACKET_OCCL", True)
    dev = _flat_scene([_tf(), _tf(3.0, 0.5, 0.7),
                       _tf(-3.0, 1.5, -1.2, 1.0)]).device()
    assert dev.packet_flattened and dev.poccl_nodes is not None
    n = 2048
    o, d = _rays(rng_np, n)
    tmax = jnp.asarray(np.where(
        rng_np.random(n) < 0.5, rng_np.uniform(1.0, 12.0, n), RAY_TMAX
    ).astype(np.float32))
    _, h_std, *_ = tps.traverse_packet_slim(
        o, d, tmax, dev.pnodes, dev.pltris, dev.proots,
        any_hit=True, interpret=True,
    )
    _, h_occ, *_ = tps.traverse_packet_slim(
        o, d, tmax, dev.poccl_nodes, dev.poccl_ltris, dev.poccl_roots,
        any_hit=True, occl=True, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(h_occ) >= 0, np.asarray(h_std) >= 0
    )


def test_leaf14_payload_exact(occl_pair, rng_np):
    """Leaf-14 closest-hit (occl geometry + bvh8.occl_payload rows)
    returns the identical (t, id, normal) payload as the standard
    shading tables on every hit (ties aside -- none on this fan)."""
    b, s, so = occl_pair
    pay = bvh8.occl_payload(
        bvh8.collapse_sah(b, leaf_max=bvh8.OCCL_TRIS), b.tri_normal
    )
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    r1 = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(s.nodes), jnp.asarray(s.ltris), (0,),
        interpret=True, count_depth=False,
    )
    r2 = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(so.nodes), jnp.asarray(so.ltris), (0,),
        interpret=True, count_depth=False, occl=True, pay=jnp.asarray(pay),
    )
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(r1[3][c]), np.asarray(r2[3][c])
        )


def test_leaf14_scene_energy_bitwise(monkeypatch):
    """Full advanced frame: CPUGPU_LEAF14 on vs off is bitwise
    invisible away from equal-t ties (identical nearest hit + payload
    -> identical shading and RNG).  The camera sits off the icosphere's
    symmetry planes so no tie is sampled."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    settings = RenderSettings(max_ray_depth=4)

    def _trace_off_axis(dev):
        w, h = 64, 32
        cam = camlib.to_arrays(
            CameraConfig(pos=(0.37, 0.11, 6.0), aspect=2.0))
        lane = jnp.arange(w * h, dtype=jnp.uint32)
        o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 16)
        state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=0x7777)
        _, res = integrators.trace_advanced_mega(dev, settings, o, d, state)
        return res

    monkeypatch.setattr(scenelib, "PACKET_OCCL", False)
    monkeypatch.setattr(scenelib, "PACKET_LEAF14", False)
    ref = _trace_off_axis(_scene().device())

    monkeypatch.setattr(scenelib, "PACKET_LEAF14", True)
    dev = _scene().device()
    assert dev.poccl_pay is not None
    got = _trace_off_axis(dev)
    assert int(ref.traced_rays) == int(got.traced_rays)
    np.testing.assert_array_equal(
        np.asarray(ref.energy), np.asarray(got.energy)
    )


def test_flattened_leaf14_payload_exact(monkeypatch, rng_np):
    """Flattened-instance leaf-14 payload rows (repacked from the
    spliced shading pltris) carry the identical world normal/obj/id."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    monkeypatch.setattr(scenelib, "PACKET_OCCL", False)
    monkeypatch.setattr(scenelib, "PACKET_LEAF14", True)
    dev = _flat_scene([_tf(), _tf(3.0, 0.5, 0.7),
                       _tf(-3.0, 1.5, -1.2, 1.0)]).device()
    assert dev.packet_flattened and dev.poccl_pay is not None
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    r1 = tps.traverse_packet_slim(
        o, d, t0, dev.pnodes, dev.pltris, dev.proots,
        interpret=True, count_depth=False,
    )
    r2 = tps.traverse_packet_slim(
        o, d, t0, dev.poccl_nodes, dev.poccl_ltris, dev.poccl_roots,
        interpret=True, count_depth=False, occl=True, pay=dev.poccl_pay,
    )
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[2]), np.asarray(r2[2]))
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(r1[3][c]), np.asarray(r2[3][c])
        )


@pytest.mark.parametrize("leaf14", [False, True], ids=["occl", "leaf14"])
def test_flattened_occl_refit_bitwise(monkeypatch, leaf14):
    """A transform refit reproduces a fresh build's occl (and leaf-14
    payload) tables BITWISE (build and refit share _refit_apply_occl's
    splice + repack)."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    monkeypatch.setattr(scenelib, "PACKET_OCCL", True)
    monkeypatch.setattr(scenelib, "PACKET_LEAF14", leaf14)
    target = _tf(3.0, 0.5, 0.7)
    s1 = _flat_scene([_tf(), target])
    d1 = s1.device()
    s2 = _flat_scene([_tf(), _tf(1.0)])
    _ = s2.device()
    s2.set_instance_transform(0, 1, target)
    d2 = s2.device()
    assert d1.poccl_nodes is not None and d2.poccl_nodes is not None
    fields = ["poccl_nodes", "poccl_ltris"]
    if leaf14:
        assert d1.poccl_pay is not None
        fields.append("poccl_pay")
    for f in fields:
        a, b = np.asarray(getattr(d1, f)), np.asarray(getattr(d2, f))
        assert a.tobytes() == b.tobytes(), f
