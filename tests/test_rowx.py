"""Wider packet rows (CPUGPU_ROWX / rowx=): each of the 8 per-tile
stacks drives 2 or 4 sublanes (256 / 512 rays) instead of 1 (128).

Iterations per lane drop with the shared node-walk union
(tools/widerow_lab.py: frame-weighted 0.66x at 2x, 0.52x at 4x on the
benchmark fans) while the scalar pop/push/load chain -- the measured
bulk of the ~1.1 us iteration -- is paid once per stack regardless of
width.  Hits must stay BIT-EXACT: strict-< Moller-Trumbore accepts are
visit-order independent, so only iteration counts and the bvh_depth
AOV may shift (the documented t-evolution-timing envelope, same
contract as the packet-tree variants).
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # nightly tier: see tests/conftest.py

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
def tables():
    m = meshlib.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_PRIMITIVES, max_leaf_size=8)
    s = bvh8.to_slim(bvh8.collapse_sah(b, leaf_max=8), b.tri_normal)
    return jnp.asarray(s.nodes), jnp.asarray(s.ltris)


def _rays(rng_np, n):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 4
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("frame_stack", [False, True])
@pytest.mark.parametrize("rowx", [2, 4])
def test_rowx_hits_bitwise(tables, rng_np, frame_stack, rowx):
    """Closest-hit payloads (t/id/obj/normal) bit-equal to rowx=1 on
    every active lane; iterations drop."""
    nodes, ltris = tables
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.asarray((rng_np.random(n) > 0.25).astype(np.int32))
    kw = dict(active=act, interpret=True, frame_stack=frame_stack,
              count_iters=True)
    r1 = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,), rowx=1, **kw)
    r2 = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,), rowx=rowx,
                                  **kw)
    am = np.asarray(act) > 0
    for i in (0, 1, 2):
        np.testing.assert_array_equal(np.asarray(r1[i])[am],
                                      np.asarray(r2[i])[am])
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(r1[3][c])[am],
                                      np.asarray(r2[3][c])[am])
    it1 = int(np.asarray(r1[-1]).sum())
    it2 = int(np.asarray(r2[-1]).sum())
    assert it2 < it1, (it1, it2)


@pytest.mark.parametrize("rowx", [2, 4])
def test_rowx_any_hit_bitwise(tables, rng_np, rowx):
    nodes, ltris = tables
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.asarray(
        np.where(rng_np.random(n) < 0.5, 3.0, RAY_TMAX).astype(np.float32)
    )
    a1 = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), any_hit=True, interpret=True, rowx=1)
    a2 = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), any_hit=True, interpret=True,
        rowx=rowx, pipelined=True, frame_stack=True)
    np.testing.assert_array_equal(
        np.asarray(a1[1]) >= 0, np.asarray(a2[1]) >= 0)


def test_rowx_validation(tables):
    nodes, ltris = tables
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))
    t0 = jnp.full((8,), RAY_TMAX, jnp.float32)
    with pytest.raises(ValueError, match="rowx"):
        tps.traverse_packet_slim(
            o, d, t0, nodes, ltris, (0,), interpret=True, rowx=3)
    with pytest.raises(ValueError, match="rowx"):
        tps.traverse_packet_slim(
            o, d, t0, nodes, ltris, (0,), interpret=True, rowx=2,
            inst_inv=jnp.zeros((1, 12), jnp.float32),
            inst_root=jnp.zeros((1,), jnp.int32))


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


@pytest.mark.parametrize("rowx", [2, 4])
def test_rowx_scene_energy_bitwise(monkeypatch, rowx):
    """Full advanced frame through the megakernels: rowx on vs off is
    bitwise invisible (identical hits -> identical shading and RNG)."""
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    settings = RenderSettings(max_ray_depth=4)
    dev = _scene().device()

    def _trace(rx):
        # off the icosphere's symmetry planes: a dead-center camera
        # samples equal-t shared-edge ties that legitimately flip with
        # visit order (one lane at rowx=4; same class as the leaf-14
        # and packet-tree variants)
        w, h = 64, 32
        cam = camlib.to_arrays(CameraConfig(pos=(0.37, 0.11, 6.0),
                                            aspect=2.0))
        lane = jnp.arange(w * h, dtype=jnp.uint32)
        o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 16)
        state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=0x2468)
        _, res = integrators.trace_advanced_mega(
            dev, settings, o, d, state, rowx=rx)
        return res

    ref = _trace(None)
    got = _trace(rowx)
    assert int(ref.traced_rays) == int(got.traced_rays)
    np.testing.assert_array_equal(
        np.asarray(ref.energy), np.asarray(got.energy)
    )
