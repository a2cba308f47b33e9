"""Instance flattening (scene.DeviceScene.packet_flattened): instanced
BLASes replicated into world space so the packet/megakernel hot path
runs the plain non-instanced machinery (measured +880 ns/iteration for
the object-space register path -- see ops/megakernel.py docstring).

Contracts pinned here:
  * the packet kernel's hits on a flattened scene are EXACT against a
    brute-force oracle over the world-space leaf records it traverses
    (the same exactness contract every traversal carries,
    Source/BVH.cpp:61-127);
  * a transform refit reproduces a fresh build BITWISE (build and refit
    share one jitted _flatten_splice);
  * the over-budget fallback keeps the object-space TLAS machinery.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.models import materials as matlib, mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


@pytest.fixture()
def force_packet(monkeypatch):
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")


@pytest.fixture(params=["", "w16"], ids=["w8", "w16"])
def tree_mode(request, monkeypatch):
    """Flattened scenes must behave identically under the default
    8-wide tree and CPUGPU_PACKET_TREE=w16 (the 8-wide TLAS rows
    re-layout to 16-wide on splice, scene._widen_slim_rows)."""
    if request.param:
        from cpugpupathtracing_tpu.models import scene as scenelib

        monkeypatch.setattr(scenelib, "PACKET_TREE", request.param)
    return request.param


def _tf(tx=0.0, scale=1.0, yaw=0.0, ty=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [c * scale, 0, s * scale, tx],
            [0, scale * 1.2, 0, ty],  # anisotropic: real |A| extents
            [-s * scale, 0, c * scale, 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )


TF = [_tf(), _tf(3.0, 0.5, 0.7), _tf(-3.0, 1.5, -1.2, 1.0)]


def _scene(transforms=TF) -> Scene:
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    s.add_instanced_mesh("b", meshlib.icosphere(subdivisions=2), grey, transforms)
    return s


def _world_records(dev):
    lt = np.asarray(dev.pltris)
    ids = lt.view(np.int32)
    tris, tid = [], []
    for k in range(8):
        r = lt[:, 16 * k : 16 * k + 16]
        m = ids[:, 16 * k + 13] >= 0
        tris.append(r[m, 0:9])
        tid.append(ids[m, 16 * k + 13])
    return np.concatenate(tris), np.concatenate(tid)


def test_flatten_active_and_exact(force_packet, tree_mode, rng_np):
    dev = _scene().device()
    assert dev.packet_flattened
    assert dev.packet_width == (16 if tree_mode == "w16" else 8)
    assert dev.pnodes.shape[1] == (128 if tree_mode == "w16" else 64)
    n = 1024
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 6
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 2
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    h = intersect_scene(dev, jnp.asarray(o), jnp.asarray(d), t0)

    tris, tid = _world_records(dev)
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    bt = np.full(n, np.float32(RAY_TMAX), np.float32)
    bi = np.full(n, -1, np.int64)
    for i in range(n):
        h_ = np.cross(d[i].astype(np.float64), e2.astype(np.float64))
        a = np.sum(e1 * h_, axis=1)
        ok = np.abs(a) >= 0.001
        f = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
        sv = o[i] - v0
        u = f * np.sum(sv * h_, axis=1)
        q = np.cross(sv.astype(np.float64), e1.astype(np.float64))
        v = f * np.sum(d[i] * q, axis=1)
        t = f * np.sum(e2 * q, axis=1)
        okh = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0)
        if okh.any():
            j = np.argmin(np.where(okh, t, np.inf))
            bt[i], bi[i] = t[j], tid[j]
    hit_k = np.asarray(h.obj) >= 0
    hit_b = bi >= 0
    assert (hit_k == hit_b).mean() > 0.999
    m = hit_k & hit_b
    assert m.sum() > 200
    # f64 oracle vs f32 kernel: same triangle, t to fp tolerance
    assert (np.asarray(h.prim)[m] == bi[m]).mean() > 0.999
    rel = np.abs(np.asarray(h.t)[m] - bt[m]) / bt[m]
    assert rel.max() < 1e-3
    # flattened hits are world-space: no instance id
    assert (np.asarray(h.inst) == -1).all()


def test_refit_bitwise_equals_rebuild(force_packet, tree_mode):
    target = _tf(3.0, 0.5, 0.7)
    s1 = _scene([_tf(), target])
    d1 = s1.device()
    s2 = _scene([_tf(), _tf(1.0)])
    _ = s2.device()
    s2.set_instance_transform(0, 1, target)
    d2 = s2.device()
    assert d2.packet_flattened
    for f in ("pnodes", "pltris", "wnodes", "snodes12"):
        a = np.asarray(getattr(d1, f))
        b = np.asarray(getattr(d2, f))
        assert a.tobytes() == b.tobytes(), f


def test_flatten_w16_hits_bitwise_equal_w8(force_packet, rng_np, monkeypatch):
    """The packet tree is an iteration-count lever only: a flattened
    scene's hits under CPUGPU_PACKET_TREE=w16 are BITWISE equal to the
    default 8-wide tree's (same world-space triangle records, same
    Moller-Trumbore -- only the node shape differs)."""
    from cpugpupathtracing_tpu.models import scene as scenelib

    dev8 = _scene().device()
    monkeypatch.setattr(scenelib, "PACKET_TREE", "w16")
    dev16 = _scene().device()
    assert dev8.packet_width == 8 and dev16.packet_width == 16
    assert dev16.packet_flattened

    n = 2048
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 6
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 2
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    h8 = intersect_scene(dev8, o, d, t0)
    h16 = intersect_scene(dev16, o, d, t0)
    for name in ("t", "obj", "prim", "inst"):
        np.testing.assert_array_equal(
            np.asarray(getattr(h8, name)),
            np.asarray(getattr(h16, name)),
            err_msg=name,
        )


def test_budget_fallback_keeps_machinery(force_packet, tree_mode, monkeypatch):
    monkeypatch.setenv("CPUGPU_FLATTEN_BUDGET_MB", "0.01")
    dev = _scene().device()
    assert not dev.packet_flattened
    # the machinery path is 8-wide regardless of the requested tree
    assert dev.packet_width == 8
    # machinery path still resolves instance ids
    o = jnp.asarray(np.array([[3.0, 0.0, 8.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    t0 = jnp.full((1,), RAY_TMAX, jnp.float32)
    h = intersect_scene(dev, o, d, t0)
    assert int(h.obj[0]) >= 0 and int(h.inst[0]) == 1


def test_flattened_normals_are_world(force_packet, rng_np):
    from cpugpupathtracing_tpu.models.scene import hit_surface

    dev = _scene().device()
    n = 256
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 6
    aim = rng_np.normal(size=(n, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    h = intersect_scene(dev, jnp.asarray(o), jnp.asarray(d), t0)
    _, nrm, _ = hit_surface(dev, h, jnp.asarray(o), jnp.asarray(d))
    m = np.asarray(h.obj) >= 0
    ln = np.linalg.norm(np.asarray(nrm)[m], axis=1)
    # pre-normalized world normals, unit length, facing checked by dot
    # with the ray being negative for front hits on a convex shell
    assert np.abs(ln - 1.0).max() < 1e-4


def test_flatten_fused_refit_bitwise(force_packet, tree_mode, rng_np, monkeypatch):
    """Fused tables on a flattened instanced scene: hits bitwise-equal
    to the split tables, before AND after a transform refit (the refit
    path rebuilds pfused from the re-spliced tables).  Runs at both
    packet widths -- fused + flattened + w16 is the config-5 production
    combo."""
    import dataclasses

    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_FUSED", True)
    s = _scene()
    dev = s.device()
    assert dev.packet_flattened and dev.pfused is not None

    n = 1024
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 6
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 2
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)

    for step in range(2):
        if step == 1:
            s.set_instance_transform(0, 1, _tf(2.0, 0.8, 0.3))
            dev = s.device()
            assert dev.pfused is not None
        dev0 = dataclasses.replace(dev, pfused=None, pfused_nn=0)
        h1 = intersect_scene(dev, o, d, t0)
        h0 = intersect_scene(dev0, o, d, t0)
        for name in ("t", "obj", "prim", "inst"):
            np.testing.assert_array_equal(
                np.asarray(getattr(h1, name)),
                np.asarray(getattr(h0, name)),
                err_msg=f"{name} step={step}",
            )
