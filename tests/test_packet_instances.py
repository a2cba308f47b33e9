"""Packet-kernel TLAS/instance parity (interpret mode on CPU).

The slim packet kernel's instance path (object-space register swap +
RESTORE marker, ops/traverse_packet_slim.py) must agree with the wide
traversal's per-lane instance path (ops/traverse_wide.py) -- the same
object-space Moller-Trumbore over the same BLAS, so hit ids are equal
and t matches to float tolerance (the two paths order the transform
arithmetic differently)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


@pytest.fixture()
def force_packet(monkeypatch):
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    # this file pins the object-space MACHINERY path (register swap +
    # RESTORE); the default world-space flattening is covered by
    # tests/test_flatten.py
    monkeypatch.setenv("CPUGPU_NO_FLATTEN", "1")


def _transforms():
    out = np.zeros((3, 4, 4), np.float32)
    for i in range(3):
        ang = 2.1 * i + 0.4
        c, s = np.cos(ang), np.sin(ang)
        sc = 0.6 + 0.2 * i  # non-uniform placement incl. scale
        out[i] = [
            [c * sc, 0, s * sc, 2.2 * (i - 1)],
            [0, sc, 0, 0.3 * i],
            [-s * sc, 0, c * sc, 0.5],
            [0, 0, 0, 1],
        ]
    return out


def _instanced_scene() -> Scene:
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    s.add_instanced_mesh(
        "balls", meshlib.icosphere(subdivisions=2), white, _transforms()
    )
    s.add_mesh("floor", meshlib.ground_quad(half_extent=20.0, y=-2.0), white)
    return s


def _rays(n=8192):
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.5, 7.0)))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, _ = camlib.blocked_lane_rays(cam, lane, 128, n // 128, 8, 128)
    return o, d


def test_instanced_packet_matches_wide(force_packet):
    scene = _instanced_scene()
    dev_packet = scene.device()
    scene_wide = _instanced_scene()
    scene_wide.traversal = "wide"
    dev_wide = scene_wide.device()
    o, d = _rays()
    tmax = jnp.full((o.shape[0],), RAY_TMAX, jnp.float32)

    hp = intersect_scene(dev_packet, o, d, tmax)
    hw = intersect_scene(dev_wide, o, d, tmax)

    # interpret-mode Pallas and XLA jnp order the float ops differently,
    # so a hit landing EXACTLY on a triangle edge (v == -0.0) can flip
    # by one ulp between the paths; tolerate a couple of such lanes
    # (compiled-vs-wide on the real chip matches exactly -- the
    # tpu_parity_gate covers that).  Everything else must agree.
    prim_p, prim_w = np.asarray(hp.prim), np.asarray(hw.prim)
    same = prim_p == prim_w
    assert int((~same).sum()) <= 8, np.nonzero(~same)[0]
    np.testing.assert_array_equal(np.asarray(hp.inst)[same], np.asarray(hw.inst)[same])
    np.testing.assert_array_equal(np.asarray(hp.obj)[same], np.asarray(hw.obj)[same])
    np.testing.assert_allclose(
        np.asarray(hp.t)[same], np.asarray(hw.t)[same], rtol=1e-5, atol=1e-5
    )
    # scene must actually exercise instances
    assert int((np.asarray(hp.inst) >= 0).sum()) > 100


def test_instanced_packet_any_hit(force_packet):
    scene = _instanced_scene()
    dev = scene.device()
    o, d = _rays(1024)
    tmax = jnp.full((o.shape[0],), RAY_TMAX, jnp.float32)
    h_near = intersect_scene(dev, o, d, tmax)
    h_any = intersect_scene(dev, o, d, tmax, any_hit=True)
    # any-hit occludes exactly where closest-hit found something
    np.testing.assert_array_equal(
        np.asarray(h_near.obj >= 0), np.asarray(h_any.obj >= 0)
    )


def test_instanced_render_matches_wide(force_packet):
    """Full advanced-integrator frame (with wavefront sorting) on an
    instanced scene: forced packet path vs wide path."""
    import os

    from cpugpupathtracing_tpu.models import integrators
    from cpugpupathtracing_tpu.utils import rng as rnglib

    s = _instanced_scene()
    li = s.add_sphere(
        "light", (6.0, 8.0, 6.0), 2.0,
        s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 20.0)),
    )
    s.mark_light(li)
    dev = s.device()
    o, d = _rays(1024)
    n = o.shape[0]
    state = rnglib.seed_lanes(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0), salt=5)
    settings = RenderSettings(max_ray_depth=3)
    idx = jnp.arange(n, dtype=jnp.int32)
    _, res_p = integrators.trace_advanced(dev, settings, o, d, state, idx=idx)
    os.environ.pop("CPUGPU_TPU_FORCE_PACKET", None)
    _, res_w = integrators.trace_advanced(dev, settings, o, d, state, idx=idx)
    np.testing.assert_allclose(
        np.asarray(res_p.energy), np.asarray(res_w.energy), rtol=2e-4, atol=2e-4
    )
    assert int(res_p.traced_rays) == int(res_w.traced_rays)


def test_instanced_frame_stack_matches_linear(force_packet):
    """Frame-stack control with the TLAS machinery: instance entries
    push a 1-slot RESTORE frame and the pop is gated so entering rows
    keep it intact -- hits/t/obj/iid must be bit-exact vs the linear
    stack (ops/traverse_packet_slim.py FSTACK scheme)."""
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps

    scene = _instanced_scene()
    dev = scene.device()
    o, d = _rays(4096)
    n = o.shape[0]
    tmax = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.ones((n,), jnp.int32)
    outs = []
    for fs, cp in ((False, False), (True, False), (True, True)):
        res = tps.traverse_packet_slim(
            o, d, tmax, dev.pnodes, dev.pltris, dev.proots, active=act,
            interpret=True, frame_stack=fs, cond_push=cp,
            inst_inv=dev.inst_inv, inst_root=dev.inst_blas_root_packet,
        )
        outs.append(res)
    lin, frm, frm_cp = outs
    # CPUGPU_CONDPUSH: gating the frame stores on the pass mask must be
    # a pure no-op on results, RESTORE frames included
    for i in (0, 1, 2, 5):
        np.testing.assert_array_equal(np.asarray(frm_cp[i]),
                                      np.asarray(frm[i]))
    np.testing.assert_array_equal(np.asarray(frm[0]), np.asarray(lin[0]))  # t
    np.testing.assert_array_equal(np.asarray(frm[1]), np.asarray(lin[1]))  # tri
    np.testing.assert_array_equal(np.asarray(frm[2]), np.asarray(lin[2]))  # obj
    np.testing.assert_array_equal(np.asarray(frm[5]), np.asarray(lin[5]))  # iid
    # the scene must actually exercise the instance machinery
    assert int((np.asarray(lin[5]) >= 0).sum()) > 50


def test_refit_matches_full_rebuild(force_packet):
    """set_instance_transform refits the TLAS in O(instances): the
    refitted snapshot must intersect identically to a from-scratch
    rebuild with the same transforms, reuse every BLAS array by
    identity, and keep static metadata (no jit recompiles)."""
    moved = _transforms()
    moved[:, 0, 3] += 1.5  # translate all instances in x
    moved[1, 1, 3] -= 0.7

    scene = _instanced_scene()
    dev0 = scene.device()
    for i in range(3):
        scene.set_instance_transform(0, i, moved[i])
    dev_refit = scene.device()

    fresh = _instanced_scene()
    for i in range(3):
        fresh.objects[0].instances[i] = moved[i]
    dev_full = fresh.device()

    # arrays the refit must NOT touch are reused by object identity
    assert dev_refit.pltris is dev0.pltris
    assert dev_refit.wtris9 is dev0.wtris9
    assert dev_refit.tris9 is dev0.tris9
    # static metadata unchanged -> cached jits stay valid
    assert dev_refit.proots == dev0.proots
    assert dev_refit.wroots == dev0.wroots
    assert dev_refit.wstack_depth == dev0.wstack_depth

    np.testing.assert_array_equal(
        np.asarray(dev_refit.inst_inv), np.asarray(dev_full.inst_inv)
    )
    np.testing.assert_array_equal(
        np.asarray(dev_refit.pnodes), np.asarray(dev_full.pnodes)
    )
    np.testing.assert_array_equal(
        np.asarray(dev_refit.wnodes), np.asarray(dev_full.wnodes)
    )
    np.testing.assert_array_equal(
        np.asarray(dev_refit.snodes12), np.asarray(dev_full.snodes12)
    )

    o, d = _rays(2048)
    tmax = jnp.full((o.shape[0],), RAY_TMAX, jnp.float32)
    hr = intersect_scene(dev_refit, o, d, tmax)
    hf = intersect_scene(dev_full, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hr.prim), np.asarray(hf.prim))
    np.testing.assert_array_equal(np.asarray(hr.inst), np.asarray(hf.inst))
    np.testing.assert_array_equal(np.asarray(hr.t), np.asarray(hf.t))


def test_w16_instanced_falls_back_to_w8(force_packet, monkeypatch):
    """CPUGPU_PACKET_TREE=w16 on an instanced scene pinned to the
    object-space machinery path (CPUGPU_NO_FLATTEN) must fall back to
    8-wide sweep_dp tables (the kernel's register-swap/RESTORE
    instance path is 8-wide) and still intersect correctly; FLATTENED
    instanced scenes keep width 16 (tests/test_flatten.py)."""
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_TREE", "w16")
    dev = _instanced_scene().device()
    assert dev.packet_width == 8
    assert dev.traversal == "packet"
    assert dev.pnodes.shape[1] == 64
    o, d = _rays(2048)
    tmax = jnp.full((2048,), RAY_TMAX, jnp.float32)
    h = intersect_scene(dev, o, d, tmax)
    assert int((np.asarray(h.inst) >= 0).sum()) > 0
