"""Megakernel parity: the fused per-depth kernels (ops/megakernel.py)
must reproduce models/integrators.trace_advanced.

Interpret mode executes the same jnp primitives as the XLA integrator,
so CONTROL FLOW must agree bit-exactly: identical per-lane RNG streams
drive identical RR deaths, lobe selections, and shadow-ray counts --
asserted via exact traced_rays equality.  Energy parity has one
fundamental caveat: XLA's jnp.sum reduce order inside vecmath.dot is
implementation-defined, so the kernel's explicit a*x + b*y + c*z sums
can differ by 1 ulp -- invisible everywhere EXCEPT the NEE occlusion
boundary, where a shadow ray tangent to its own light sphere (nldotl ~
1e-3) can flip occluded on the ulp.  Each flip changes energy by that
single near-tangent contribution (itself proportional to nldotl, hence
small).  The NEE-off configurations therefore assert tight ULP-level
agreement, and the NEE configurations additionally bound the count and
size of boundary flips.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene, megakernel_active
from cpugpupathtracing_tpu.utils import rng as rnglib


@pytest.fixture()
def force_packet(monkeypatch):
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")


def _scene(num_lights=2) -> Scene:
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8, (0.1, 0.2, 0.2), 1.5)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    mirror = s.add_material(matlib.Material.diffuse((0.9, 0.9, 0.9), specular=1.0))
    s.add_mesh("ball", meshlib.icosphere(subdivisions=1), glass)
    s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
    s.add_sphere("mirrorball", (2.5, 0.0, 1.0), 0.8, mirror)
    s.add_plane("backwall", (0.0, 0.0, -12.0), (0.0, 0.0, 1.0), white)
    centers = [(6.0, 6.0, 6.0), (-6.0, 6.0, -4.0)]
    for li in range(num_lights):
        i = s.add_sphere(f"light{li}", centers[li], 2.0, light)
        s.mark_light(i)
    return s


def _trace(dev, settings, fn, idx=None):
    w, h = 64, 32
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 6.0), aspect=2.0))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=0x7777)
    return fn(dev, settings, o, d, state, idx=idx)


def _check(ref, got, nee: bool):
    # identical RNG streams -> identical control flow -> exact ray counts
    assert int(ref.traced_rays) == int(got.traced_rays)
    ea, em = np.asarray(ref.energy), np.asarray(got.energy)
    if not nee:
        np.testing.assert_allclose(ea, em, rtol=3e-5, atol=3e-6)
        return
    diff = np.abs(ea - em)
    flips = (diff > 3e-6 + 3e-5 * np.abs(ea)).any(axis=1)
    assert flips.mean() < 0.03, f"{flips.sum()} lanes beyond boundary flips"
    assert diff.max() < 0.02, f"flip magnitude {diff.max():.4f} not tangent-sized"
    assert np.abs(ea.mean() - em.mean()) < 1e-4


@pytest.mark.parametrize(
    "sort,settings",
    [
        (True, RenderSettings(max_ray_depth=3)),
        pytest.param(False, RenderSettings(max_ray_depth=2),
                     marks=pytest.mark.slow),
        pytest.param(True,
                     RenderSettings(max_ray_depth=2,
                                    cosine_weighted_diffuse=False),
                     marks=pytest.mark.slow),
        pytest.param(True,
                     RenderSettings(max_ray_depth=2, russian_roulette=False),
                     marks=pytest.mark.slow),
        (True, RenderSettings(max_ray_depth=2, next_event_estimation=False)),
    ],
    # settings-toggle arms are nightly: each toggle is a one-line
    # branch of the SHARED _shade_surface body, and the pt-frame suite
    # pins the same arms bitwise
    ids=["default-sort", "default-nosort", "uniform-diffuse", "no-rr", "no-nee"],
)
def test_megakernel_matches_integrator(force_packet, sort, settings):
    dev = _scene().device()
    assert megakernel_active(dev, settings)
    idx = jnp.arange(64 * 32, dtype=jnp.int32) if sort else None
    _, ref = _trace(dev, settings, integrators.trace_advanced, idx=idx)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _check(ref, got, settings.next_event_estimation)


def test_megakernel_single_light(force_packet):
    settings = RenderSettings(max_ray_depth=2)
    dev = _scene(num_lights=1).device()
    assert megakernel_active(dev, settings)
    _, ref = _trace(dev, settings, integrators.trace_advanced)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega)
    _check(ref, got, True)


def test_megakernel_frame_stack_bitwise(force_packet):
    """frame_stack=True flips only the traversal's stack mechanics;
    hits are bit-exact, RNG order is untouched, so the whole megakernel
    image must be BITWISE identical to the linear-stack run."""
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene().device()
    assert megakernel_active(dev, settings)
    idx = jnp.arange(64 * 32, dtype=jnp.int32)

    def mega_fs(d_, s_, o_, dir_, st_, idx=None):
        return integrators.trace_advanced_mega(
            d_, s_, o_, dir_, st_, idx=idx, frame_stack=True
        )

    def mega_fs_cp(d_, s_, o_, dir_, st_, idx=None):
        return integrators.trace_advanced_mega(
            d_, s_, o_, dir_, st_, idx=idx, frame_stack=True, cond_push=True
        )

    _, lin = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _, frm = _trace(dev, settings, mega_fs, idx=idx)
    _, fcp = _trace(dev, settings, mega_fs_cp, idx=idx)
    np.testing.assert_array_equal(
        np.asarray(lin.energy), np.asarray(frm.energy)
    )
    # CPUGPU_CONDPUSH gates only never-observed stores: bitwise too
    np.testing.assert_array_equal(
        np.asarray(lin.energy), np.asarray(fcp.energy)
    )
    assert int(lin.traced_rays) == int(frm.traced_rays)
    assert int(lin.traced_rays) == int(fcp.traced_rays)


def test_gate_rejects_unsupported(force_packet):
    s = _scene(num_lights=2)
    dev = s.device()
    # AOV tracking keeps the reference-shaped path
    assert not megakernel_active(dev, RenderSettings(track_aovs=True))
    assert megakernel_active(dev, RenderSettings())


@pytest.mark.slow  # _umod covered fast by test_pt_frame_three_lights (shared body)
def test_megakernel_three_lights(force_packet):
    """Non-power-of-two light count (round-4 gate lift): the megakernel's
    restoring-division light pick (_umod) must be bit-identical to the
    XLA integrator's u32 modulo (Main.cpp:441 rand % num_lights)."""
    s = _scene(num_lights=2)
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 5.0))
    i = s.add_sphere("light2", (0.0, 8.0, 0.0), 1.0, light)
    s.mark_light(i)
    dev = s.device()
    settings = RenderSettings(max_ray_depth=3)
    assert megakernel_active(dev, settings)
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    _, ref = _trace(dev, settings, integrators.trace_advanced, idx=idx)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _check(ref, got, settings.next_event_estimation)


def _scene_instanced(num_inst: int = 3) -> Scene:
    """Instanced glass balls (one BLAS, rotated/scaled/translated
    placements) over a floor with two sphere lights: exercises the
    megakernel's TLAS instance machinery + object->world normal
    transform against the XLA integrator's (tests/test_packet_instances
    covers the bare traversal)."""
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.7, (0.1, 0.2, 0.2), 1.5)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    tf = np.zeros((num_inst, 4, 4), np.float32)
    for i in range(num_inst):
        ang = 2.1 * i + 0.4
        c, sn = np.cos(ang), np.sin(ang)
        scale = 0.6 + 0.3 * i  # non-uniform across instances
        tf[i] = [
            [c * scale, 0, sn * scale, -2.5 + 2.5 * i],
            [0, scale * 1.3, 0, 0.2 * i],  # anisotropic y: real inv^T
            [-sn * scale, 0, c * scale, 1.0 - i],
            [0, 0, 0, 1],
        ]
    s.add_instanced_mesh("balls", meshlib.icosphere(subdivisions=1), glass, tf)
    s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
    centers = [(6.0, 6.0, 6.0), (-6.0, 6.0, -4.0)]
    for li in range(2):
        i = s.add_sphere(f"light{li}", centers[li], 2.0, light)
        s.mark_light(i)
    return s


@pytest.mark.parametrize(
    "sort,flatten",
    [(True, True),
     pytest.param(False, True, marks=pytest.mark.slow),
     pytest.param(True, False, marks=pytest.mark.slow)],
    ids=["sort-flattened", "nosort-flattened", "sort-machinery"],
)  # one instanced arm in the fast gate; the others nightly
def test_megakernel_instanced_matches_integrator(
    force_packet, monkeypatch, sort, flatten
):
    if not flatten:
        # object-space machinery variant (over-budget fallback)
        monkeypatch.setenv("CPUGPU_NO_FLATTEN", "1")
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene_instanced().device()
    assert dev.num_instances == 3
    assert dev.packet_flattened == flatten
    assert megakernel_active(dev, settings)
    idx = jnp.arange(64 * 32, dtype=jnp.int32) if sort else None
    _, ref = _trace(dev, settings, integrators.trace_advanced, idx=idx)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _check(ref, got, True)


def test_megakernel_flattened_w16(force_packet, monkeypatch):
    """CPUGPU_PACKET_TREE=w16 on a flattened instanced scene -- the
    config-5 bench combination: width-16 world-space tables (the TLAS
    rows widened on splice) through the megakernel's width-parametrized
    traversal must match the XLA integrator like every other variant."""
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_TREE", "w16")
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene_instanced().device()
    assert dev.packet_flattened and dev.packet_width == 16
    assert megakernel_active(dev, settings)
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    _, ref = _trace(dev, settings, integrators.trace_advanced, idx=idx)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _check(ref, got, True)


def _scene_mesh_light(extra_sphere_light=True) -> Scene:
    """Emissive MESH light (20-tri icosphere) + optional sphere light:
    the round-5 gate lift -- NEE samples a uniform random triangle with
    the area pdf (GetRandomLightSourceForSample's mesh arm,
    Source/Main.cpp:361-394) inside the kernel's select-chain unroll."""
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8, (0.1, 0.2, 0.2), 1.5)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    s.add_mesh("ball", meshlib.icosphere(subdivisions=1), glass)
    s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
    i = s.add_mesh(
        "meshlight",
        meshlib.icosphere(center=(5.0, 6.0, 4.0), radius=1.5, subdivisions=0),
        light,
    )
    s.mark_light(i)
    if extra_sphere_light:
        j = s.add_sphere("slight", (-6.0, 6.0, -4.0), 2.0, light)
        s.mark_light(j)
    return s


@pytest.mark.parametrize(
    "mixed",
    [True, pytest.param(False, marks=pytest.mark.slow)],
    ids=["mixed", "mesh-only"],
)
def test_megakernel_mesh_light(force_packet, mixed):
    settings = RenderSettings(max_ray_depth=3)
    dev = _scene_mesh_light(extra_sphere_light=mixed).device()
    assert dev.has_mesh_lights
    assert megakernel_active(dev, settings), "mesh-light gate not lifted"
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    _, ref = _trace(dev, settings, integrators.trace_advanced, idx=idx)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega, idx=idx)
    _check(ref, got, True)


def test_mesh_light_over_budget_falls_back(force_packet, monkeypatch):
    """A light mesh beyond the select-chain unroll budget keeps the XLA
    integrator (gate reason, not an error)."""
    from cpugpupathtracing_tpu.models.scene import megakernel_gate_reason

    monkeypatch.setenv("CPUGPU_MESH_LIGHT_MAX", "4")
    import cpugpupathtracing_tpu.models.scene as scenelib

    monkeypatch.setattr(scenelib, "MESH_LIGHT_UNROLL_MAX", 4)
    dev = _scene_mesh_light().device()
    reason = megakernel_gate_reason(dev, RenderSettings())
    assert reason is not None and "unroll budget" in reason


def test_megakernel_instanced_no_nee(force_packet):
    # NEE off removes the occlusion-boundary caveat: tight agreement
    settings = RenderSettings(max_ray_depth=2, next_event_estimation=False)
    dev = _scene_instanced().device()
    assert megakernel_active(dev, settings)
    _, ref = _trace(dev, settings, integrators.trace_advanced)
    _, got = _trace(dev, settings, integrators.trace_advanced_mega)
    _check(ref, got, False)
