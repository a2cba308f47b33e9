"""Golden-image regression at fixed seed (SURVEY.md section 4).

Deterministic renders (fixed RNG streams, CPU backend) are pinned to
stored golden framebuffers.  Any change to sampling, traversal order
decisions that affect RNG consumption, or shading math shows up as a
diff here; intentional changes regenerate via
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    RenderConfig,
    RenderMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib, mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene
from cpugpupathtracing_tpu.models.whitted import make_whitted_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _scene():
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.9, 0.9, 0.9)))
    blue = s.add_material(matlib.Material.diffuse((0.2, 0.2, 0.8)))
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    glass = s.add_material(
        matlib.Material.dielectric((1.0, 1.0, 1.0), 0.0, 1.0, (0.2, 0.8, 0.8), 1.517)
    )
    s.add_mesh("ico", meshlib.icosphere(radius=1.5, subdivisions=2), glass)
    s.add_mesh("cube", meshlib.cube(center=(2.8, -0.5, -1.0), half=0.9), blue)
    s.add_plane("floor", (0.0, -2.0, 0.0), (0.0, 1.0, 0.0), white)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s


CASES = {
    "advanced": RenderSettings(render_mode=RenderMode.ADVANCED),
    "bruteforce": RenderSettings(render_mode=RenderMode.BRUTE_FORCE),
    "comparison": RenderSettings(render_mode=RenderMode.COMPARISON),
    "advanced_nonee_uniform": RenderSettings(
        render_mode=RenderMode.ADVANCED,
        next_event_estimation=False,
        cosine_weighted_diffuse=False,
    ),
}


def _render(name):
    settings = CASES[name]
    r = Renderer(
        _scene(),
        camera=CameraConfig(pos=(0.0, 0.5, 7.0)),
        config=RenderConfig(width=96, height=54, seed=0x12345678),
        settings=settings,
    )
    r.render(3)
    return r.image_u32()


def _whitted_render():
    r = Renderer(
        make_whitted_scene(),
        camera=CameraConfig(pos=(0.0, 0.5, 8.0)),
        config=RenderConfig(width=96, height=54),
        settings=RenderSettings(render_mode=RenderMode.WHITTED, max_ray_depth=4),
    )
    r.render(2)
    return r.image_u32()


def _instanced_scene():
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.9, 0.9, 0.9)))
    glass = s.add_material(
        matlib.Material.dielectric((1.0, 1.0, 1.0), 0.0, 1.0, (0.2, 0.8, 0.8), 1.517)
    )
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    tf = np.zeros((3, 4, 4), np.float32)
    for i in range(3):
        ang = 2.1 * i
        c, sn = np.cos(ang), np.sin(ang)
        sc = 0.8 + 0.2 * i
        tf[i] = [
            [c * sc, 0, sn * sc, -2.5 + 2.5 * i],
            [0, sc, 0, 0.0],
            [-sn * sc, 0, c * sc, 0.0],
            [0, 0, 0, 1],
        ]
    s.add_instanced_mesh("icos", meshlib.icosphere(radius=1.0, subdivisions=2), glass, tf)
    s.add_plane("floor", (0.0, -2.0, 0.0), (0.0, 1.0, 0.0), white)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s


def _instanced_render():
    """Flattened-instancing semantics lock: world-space tables feed the
    same advanced integrator; this golden pins the image against any
    drift in the flatten arithmetic (tests/test_flatten.py pins hits)."""
    r = Renderer(
        _instanced_scene(),
        camera=CameraConfig(pos=(0.0, 0.5, 8.0)),
        config=RenderConfig(width=96, height=54, seed=0x9E3779B9),
        settings=RenderSettings(render_mode=RenderMode.ADVANCED),
    )
    r.render(2)
    return r.image_u32()


def _all():
    out = {name: _render(name) for name in CASES}
    out["whitted"] = _whitted_render()
    out["instanced_flattened"] = _instanced_render()
    return out


def test_goldens():
    import pytest

    path = os.path.join(GOLDEN_DIR, "frames.npz")
    if not os.path.exists(path):
        pytest.skip("no goldens recorded; run: python tests/test_golden.py regen")
    stored = np.load(path)
    for name, img in _all().items():
        assert name in stored, f"golden for '{name}' missing; regenerate"
        np.testing.assert_array_equal(
            img, stored[name],
            err_msg=f"golden mismatch for '{name}' -- sampling/shading changed",
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(os.path.join(GOLDEN_DIR, "frames.npz"), **_all())
        print("goldens regenerated")
    else:
        print("usage: python tests/test_golden.py regen")


@pytest.mark.slow  # tree-variant sweep: nightly; test_goldens guards the image
def test_golden_bitwise_under_tree_variants(monkeypatch):
    """CPUGPU_PACKET_TREE reshapes only the device-side slim tree; hits
    are exact and per-lane RNG order is untouched, so the rendered
    image must be BITWISE identical across every variant -- including
    the width-16 tables.  The packet path must be FORCED on (interpret
    mode): without it the CPU render falls back to the wide traversal
    and never touches the variant tables (the original version of this
    test compared wide-path renders and was vacuous).  The baseline is
    a same-process default-tree render through the same forced path, so
    the assert isolates exactly the tree reshape.  Advanced case:
    glass + mesh + plane + NEE exercises closest-hit and shadow
    traversals through the variant tables."""
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")

    def render():
        r = Renderer(
            _scene(),
            camera=CameraConfig(pos=(0.0, 0.5, 7.0)),
            config=RenderConfig(width=64, height=36, seed=0x12345678),
            settings=CASES["advanced"],
        )
        r.render(2)
        return r.image_u32(), r.scene.device().packet_width

    base, w0 = render()
    assert w0 == 8
    for mode, want_w in (("dp", 8), ("sweep_dp", 8), ("w16", 16)):
        monkeypatch.setattr(scenelib, "PACKET_TREE", mode)
        img, w = render()
        assert w == want_w
        np.testing.assert_array_equal(
            img, base,
            err_msg=f"tree variant '{mode}' changed the image -- the "
                    "hit-exactness contract is broken",
        )
