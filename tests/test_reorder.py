"""Ray-reordering equivalence: sorting the wavefront by the coherence
key (active | octant | morton) before the packet kernel and scattering
results back must be invisible in the output -- bitwise identical
energies -- because hits are exact and the RNG is per-lane.

Runs the packet path in interpret mode on CPU (CPUGPU_TPU_FORCE_PACKET
plumbing via intersect_scene's on_tpu/force gate)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import RenderSettings
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene
from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.utils import rng as rnglib


@pytest.fixture()
def force_packet(monkeypatch):
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")


def _mini_scene() -> Scene:
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8, (0.1, 0.2, 0.2), 1.5)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    s.add_mesh("ball", meshlib.icosphere(subdivisions=1), glass)
    s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
    li = s.add_sphere("light0", (6.0, 6.0, 6.0), 2.0, light)
    s.mark_light(li)
    li2 = s.add_sphere("light1", (-6.0, 6.0, -4.0), 2.0, light)
    s.mark_light(li2)
    return s


def _trace(dev, idx, track_aovs=True, fn=None):
    w, h = 64, 32
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 6.0), aspect=2.0))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=0x1234)
    settings = RenderSettings(max_ray_depth=3, track_aovs=track_aovs)
    fn = fn or integrators.trace_advanced
    _, res = fn(dev, settings, o, d, state, idx=idx)
    return res


def test_reorder_bitwise_invisible(force_packet):
    dev = _mini_scene().device()
    n = 64 * 32
    res_plain = _trace(dev, None)
    res_sorted = _trace(dev, jnp.arange(n, dtype=jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(res_plain.energy), np.asarray(res_sorted.energy)
    )
    np.testing.assert_array_equal(
        np.asarray(res_plain.ray_depth), np.asarray(res_sorted.ray_depth)
    )
    # bvh_depth is documented to match only "up to t-evolution timing"
    # (sub-packet composition changes which descents tmin<t prunes), so
    # the AOV assert is a sanity bound, not bitwise equality (ADVICE r2)
    assert np.asarray(res_sorted.bvh_depth).min() >= 0
    assert int(res_plain.traced_rays) == int(res_sorted.traced_rays)


def test_aov_free_sort_path_bitwise_identical(force_packet):
    """The AOV-free carry (no final_depth/bvh_depth0 payloads, flags
    folded into the sort key) must not change the image by a single bit:
    shading, RNG streams, and hit results are untouched, only the sort's
    payload set shrinks."""
    dev = _mini_scene().device()
    n = 64 * 32
    idx = jnp.arange(n, dtype=jnp.int32)
    for fn in (integrators.trace_advanced, integrators.trace_brute):
        res_aov = _trace(dev, idx, track_aovs=True, fn=fn)
        res_lean = _trace(dev, idx, track_aovs=False, fn=fn)
        np.testing.assert_array_equal(
            np.asarray(res_aov.energy), np.asarray(res_lean.energy)
        )
        assert int(res_aov.traced_rays) == int(res_lean.traced_rays)
        # lean mode documents zero AOVs
        assert np.asarray(res_lean.ray_depth).max() == 0
        assert np.asarray(res_lean.bvh_depth).max() == 0


def test_packet_path_matches_wide_path(force_packet):
    """The forced packet path and the default (wide) CPU path agree:
    identical RNG streams + oracle-exact hit ids mean the same shading
    branches everywhere; t differs by <= a few ulp, so energies match to
    float tolerance."""
    scene = _mini_scene()
    dev_packet = scene.device()
    res_packet = _trace(dev_packet, None)
    os.environ.pop("CPUGPU_TPU_FORCE_PACKET", None)
    res_wide = _trace(dev_packet, None)
    np.testing.assert_allclose(
        np.asarray(res_packet.energy), np.asarray(res_wide.energy),
        rtol=2e-4, atol=2e-4,
    )
    assert int(res_packet.traced_rays) == int(res_wide.traced_rays)
