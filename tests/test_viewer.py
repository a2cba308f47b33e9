"""Live HTTP viewer: frame/stats endpoints + reference fly-camera input
(the Win32/DX12/Input surface stand-in, viewer.py)."""

import json
import urllib.request

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    DebugRenderMode,
    RenderConfig,
    RenderMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene
from cpugpupathtracing_tpu.utils import image as imagelib
from cpugpupathtracing_tpu.viewer import CAMERA_SPEED, LiveViewer


def _renderer() -> Renderer:
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.6, 0.6, 0.6)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("cube", meshlib.cube(half=1.0), grey)
    li = s.add_sphere("light", (6.0, 8.0, 6.0), 3.0, light)
    s.mark_light(li)
    return Renderer(
        s,
        camera=CameraConfig(pos=(0.0, 0.0, 6.0), aspect=2.0),
        config=RenderConfig(width=64, height=32, samples_per_frame=1),
        settings=RenderSettings(max_ray_depth=2),
    )


@pytest.fixture()
def viewer():
    r = _renderer()
    v = LiveViewer(r, port=0)  # ephemeral port
    v.start()
    yield v
    v.close()


def _get(v, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{v.port}{path}", timeout=10) as resp:
        return resp.status, resp.headers.get_content_type(), resp.read()


def _post(v, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{v.port}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_frame_and_stats_roundtrip(viewer, tmp_path):
    viewer.renderer.render_frame()
    viewer.publish()
    code, ctype, body = _get(viewer, "/frame.png")
    assert code == 200 and ctype == "image/png"
    p = tmp_path / "f.png"
    p.write_bytes(body)
    img = imagelib.read_png(str(p))
    assert img.shape == (32, 64, 4)
    assert img[..., :3].max() > 0  # the light is in frame

    code, ctype, body = _get(viewer, "/stats.json")
    stats = json.loads(body)
    assert stats["accumulated_frames"] == 1
    assert stats["traced_rays"] > 0

    code, ctype, body = _get(viewer, "/")
    assert code == 200 and b"frame.png" in body


def test_input_moves_reference_fly_camera(viewer):
    r = viewer.renderer
    r.render_frame()
    assert r.num_accumulated == 1
    p0 = r.camera.pos
    code, body = _post(viewer, "/input", {"key": "w", "dt": 0.5})
    assert code == 200 and body["ok"]
    # W: pos.z -= speed * dt (Main.cpp:114-118)
    assert r.camera.pos[2] == pytest.approx(p0[2] - CAMERA_SPEED * 0.5)
    # movement resets accumulation (Main.cpp:292-296)
    assert r.num_accumulated == 0
    _post(viewer, "/input", {"key": "shift", "dt": 0.25})
    assert r.camera.pos[1] == pytest.approx(p0[1] - CAMERA_SPEED * 0.25)
    code, body = _post(viewer, "/input", {"key": "q", "dt": 0.1})
    assert not body["ok"]


def test_control_panel_knobs(viewer):
    r = viewer.renderer
    code, body = _post(viewer, "/control", {"pause": True})
    assert body["ok"] and r.pause_rendering
    _post(viewer, "/control", {"toggle_pause": True})
    assert not r.pause_rendering
    _post(viewer, "/control", {"render_mode": "whitted"})
    assert r.settings.render_mode == RenderMode.WHITTED
    _post(viewer, "/control", {"debug_mode": "bvh_depth"})
    assert r.settings.debug_render_mode == DebugRenderMode.BVH_DEPTH
    _post(viewer, "/control", {"max_ray_depth": 7, "russian_roulette": False})
    assert r.settings.max_ray_depth == 7
    assert r.settings.russian_roulette is False
    code, body = _post(viewer, "/control", {"render_mode": "nope"})
    assert not body["ok"]


def test_serve_frames_bounded(viewer):
    viewer.serve_frames(2)
    assert viewer.renderer.num_accumulated == 2
    code, _, body = _get(viewer, "/frame.png")
    assert code == 200 and len(body) > 100
