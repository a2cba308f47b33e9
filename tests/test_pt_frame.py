"""Whole-frame PT kernel parity (ops/pt_frame_kernel.py).

The kernel emits the SAME traversal (_emit_traversal) and shading body
(_shade_surface) as the per-depth megakernels, chained across depths
in-register with a per-1024-tile early-exit while loop -- exactly the
megakernel pipeline's all-dead sub-tile skip at the same granularity.
In interpret mode the per-lane energy, RNG state, and traced count must
therefore be BITWISE identical to trace_advanced_mega without wavefront
sorting; against the XLA integrator the megakernel ULP contract applies
(see tests/test_megakernel.py's module docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import RenderConfig, RenderSettings
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import (
    megakernel_active,
    pt_frame_active,
    pt_frame_gate_reason,
)

from tests.test_megakernel import _check, _scene, _scene_instanced, _trace


@pytest.fixture()
def force_packet(monkeypatch):
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")


@pytest.mark.parametrize(
    "settings",
    [
        RenderSettings(max_ray_depth=3),
        pytest.param(
            RenderSettings(max_ray_depth=2, cosine_weighted_diffuse=False),
            marks=pytest.mark.slow),
        pytest.param(
            RenderSettings(max_ray_depth=2, russian_roulette=False),
            marks=pytest.mark.slow),
        RenderSettings(max_ray_depth=2, next_event_estimation=False),
    ],
    ids=["default", "uniform-diffuse", "no-rr", "no-nee"],
)
def test_pt_frame_bitwise_vs_megakernel(force_packet, settings):
    dev = _scene().device()
    assert pt_frame_active(dev, settings)
    _, mega = _trace(dev, settings, integrators.trace_advanced_mega)
    _, frame = _trace(dev, settings, integrators.trace_advanced_frame)
    np.testing.assert_array_equal(
        np.asarray(mega.energy), np.asarray(frame.energy)
    )
    assert int(mega.traced_rays) == int(frame.traced_rays)


def test_pt_frame_vs_integrator(force_packet):
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene().device()
    _, ref = _trace(dev, settings, integrators.trace_advanced)
    _, got = _trace(dev, settings, integrators.trace_advanced_frame)
    _check(ref, got, True)


def test_pt_frame_state_matches(force_packet):
    """RNG state out must match the megakernel's per lane (same draws,
    same per-tile freeze semantics)."""
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene().device()
    st_mega, _ = _trace(dev, settings, integrators.trace_advanced_mega)
    st_frame, _ = _trace(dev, settings, integrators.trace_advanced_frame)
    np.testing.assert_array_equal(np.asarray(st_mega), np.asarray(st_frame))


def test_pt_frame_three_lights(force_packet):
    """Non-power-of-two light count through the whole-frame kernel's
    _umod light pick."""
    from cpugpupathtracing_tpu.models import materials as matlib

    s = _scene(num_lights=2)
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 5.0))
    i = s.add_sphere("light2", (0.0, 8.0, 0.0), 1.0, light)
    s.mark_light(i)
    dev = s.device()
    settings = RenderSettings(max_ray_depth=3)
    assert pt_frame_active(dev, settings)
    _, mega = _trace(dev, settings, integrators.trace_advanced_mega)
    _, frame = _trace(dev, settings, integrators.trace_advanced_frame)
    np.testing.assert_array_equal(
        np.asarray(mega.energy), np.asarray(frame.energy)
    )
    assert int(mega.traced_rays) == int(frame.traced_rays)


class TestGate:
    def test_active_on_small_scene(self, force_packet):
        dev = _scene().device()
        assert pt_frame_gate_reason(dev, RenderSettings()) is None

    def test_tree_size_budget(self, force_packet, monkeypatch):
        monkeypatch.setenv("CPUGPU_PTFRAME_MAX_NODES", "1")
        dev = _scene().device()
        reason = pt_frame_gate_reason(dev, RenderSettings())
        assert reason is not None and "budget" in reason
        # the megakernel path stays available
        assert megakernel_active(dev, RenderSettings())

    def test_instance_machinery_rejected(self, force_packet, monkeypatch):
        monkeypatch.setenv("CPUGPU_NO_FLATTEN", "1")
        dev = _scene_instanced().device()
        reason = pt_frame_gate_reason(dev, RenderSettings())
        assert reason is not None and "instance" in reason

    def test_flattened_instances_qualify(self, force_packet):
        dev = _scene_instanced().device()
        assert dev.packet_flattened
        assert pt_frame_gate_reason(dev, RenderSettings()) is None

    def test_opt_out(self, force_packet, monkeypatch):
        monkeypatch.setenv("CPUGPU_NO_PTFRAME", "1")
        dev = _scene().device()
        assert pt_frame_gate_reason(dev, RenderSettings()) is not None


def test_pt_frame_flattened_instances(force_packet):
    """Flattened instanced scenes run the plain tables through the
    whole-frame kernel; bitwise vs the (unsorted) megakernel path."""
    settings = RenderSettings(max_ray_depth=2)
    dev = _scene_instanced().device()
    assert pt_frame_active(dev, settings)
    _, mega = _trace(dev, settings, integrators.trace_advanced_mega)
    _, frame = _trace(dev, settings, integrators.trace_advanced_frame)
    np.testing.assert_array_equal(
        np.asarray(mega.energy), np.asarray(frame.energy)
    )
    assert int(mega.traced_rays) == int(frame.traced_rays)


def test_pt_frame_split_bitwise(force_packet, monkeypatch):
    """CPUGPU_PTFRAME_SPLIT=K (two spans + one mid-frame morton sort):
    per-lane energy and traced must be BITWISE identical to the single
    span -- sorting permutes, the restore returns lane order, and every
    ACTIVE lane's draw sequence is grouping-independent."""
    import jax.numpy as jnp

    settings = RenderSettings(max_ray_depth=3)
    dev = _scene().device()
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    monkeypatch.setenv("CPUGPU_PTFRAME_SPLIT", "0")
    _, full = _trace(dev, settings, integrators.trace_advanced_frame,
                     idx=idx)
    monkeypatch.setenv("CPUGPU_PTFRAME_SPLIT", "2")
    _, split = _trace(dev, settings, integrators.trace_advanced_frame,
                      idx=idx)
    np.testing.assert_array_equal(
        np.asarray(full.energy), np.asarray(split.energy)
    )
    assert int(full.traced_rays) == int(split.traced_rays)


def test_pt_frame_mesh_light(force_packet):
    """Mesh-light NEE through the whole-frame kernel: bitwise vs the
    (unsorted) megakernel path on the mixed-light scene."""
    from tests.test_megakernel import _scene_mesh_light

    settings = RenderSettings(max_ray_depth=3)
    dev = _scene_mesh_light().device()
    assert pt_frame_active(dev, settings)
    _, mega = _trace(dev, settings, integrators.trace_advanced_mega)
    _, frame = _trace(dev, settings, integrators.trace_advanced_frame)
    np.testing.assert_array_equal(
        np.asarray(mega.energy), np.asarray(frame.energy)
    )
    assert int(mega.traced_rays) == int(frame.traced_rays)


def test_renderer_image_invariant(force_packet, monkeypatch):
    """The full renderer frame must be bitwise identical with the
    whole-frame kernel on vs off (the sorted megakernel path): sorting
    only permutes lanes, hits are exact, and RNG streams are per-lane."""
    scene = _scene()
    cfg = RenderConfig(width=64, height=32)
    settings = RenderSettings(max_ray_depth=3)

    r1 = Renderer(scene, config=cfg, settings=settings)
    assert pt_frame_active(scene.device(), settings)
    r1.render_frame()
    img_frame = r1.image_u32().copy()

    monkeypatch.setenv("CPUGPU_NO_PTFRAME", "1")
    r2 = Renderer(scene, config=cfg, settings=settings)
    r2.render_frame()
    np.testing.assert_array_equal(img_frame, r2.image_u32())
    assert r1.stats.traced_rays == r2.stats.traced_rays
