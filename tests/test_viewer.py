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


def test_scene_tree_editors(viewer):
    """Round-4 control-surface closure: the scene-tree editors
    (Main.cpp:859-933) over /control -- material, sphere, plane (via a
    renderer with one), and BVH rebuild with a heuristic choice."""
    r = viewer.renderer
    # material editor: partial update merges over the current material
    code, body = _post(viewer, "/control", {
        "set_material": {"index": 0, "albedo": [0.9, 0.1, 0.2],
                         "specular": 0.5}})
    assert body["ok"]
    m = r.scene.materials[0]
    assert m.albedo == (0.9, 0.1, 0.2) and m.specular == 0.5
    assert r.num_accumulated == 0  # material edit resets (Main.cpp:263-265)

    # sphere editor (object 1 is the light sphere)
    code, body = _post(viewer, "/control", {
        "set_sphere": {"index": 1, "center": [5.0, 7.0, 5.0],
                       "radius": 2.5}})
    assert body["ok"]
    assert r.scene.objects[1].sphere == ((5.0, 7.0, 5.0), 2.5)

    # BVH rebuild with a heuristic combo choice (Source/BVH.cpp:149-186)
    before = r.scene.objects[0].build_option
    code, body = _post(viewer, "/control", {
        "rebuild_bvh": {"index": 0, "build_option": "naive_split"}})
    assert body["ok"]
    from cpugpupathtracing_tpu.config import BuildOption
    assert r.scene.objects[0].build_option == BuildOption.NAIVE_SPLIT
    assert r.scene.objects[0].build_option != before or \
        before == BuildOption.NAIVE_SPLIT

    # malformed requests reject without crashing the server thread
    for bad in (
        {"set_material": {"index": 99, "albedo": [1, 1, 1]}},
        {"set_sphere": {"index": 0, "center": [0, 0, 0], "radius": 1.0}},
        {"rebuild_bvh": {"index": 0, "build_option": "nope"}},
        {"set_material": {"index": 0, "not_a_field": 1.0}},
    ):
        code, body = _post(viewer, "/control", bad)
        assert not body["ok"], bad
    # the server is still alive and serving
    code, _, _ = _get(viewer, "/stats.json")
    assert code == 200


def test_stats_include_per_object_bvh(viewer):
    """Per-object BVH stats in /stats.json (Source/BVH.cpp:149-186)."""
    viewer.renderer.render_frame()
    viewer.publish()
    _, _, body = _get(viewer, "/stats.json")
    stats = json.loads(body)
    objs = stats["objects"]
    assert objs[0]["kind"] == "mesh"
    bvh = objs[0]["bvh"]
    assert bvh["node_count"] >= 1 and bvh["max_depth"] >= 1
    assert bvh["triangles"] == 12  # the cube
    assert bvh["total_node_area"] > 0
    assert objs[1]["kind"] == "sphere" and objs[1]["is_light"]
    assert objs[1]["radius"] == 3.0


def test_mouse_input_and_capture(viewer):
    """The reference's mouse machinery (Input.cpp:64-84, Window.cpp:
    183-194, Main.cpp:279-290): deltas + capture are forwarded and
    surfaced in stats -- and, faithful to the reference, the camera
    IGNORES the deltas (Main.cpp:109 fetches mouse_move and never
    reads it)."""
    r = viewer.renderer
    cam_before = r.camera.pos
    code, body = _post(viewer, "/control", {"mouse_capture": True})
    assert body["ok"] and viewer.mouse_captured
    code, body = _post(viewer, "/input", {"mouse_dx": 12.0, "mouse_dy": -3.0})
    assert body["ok"]
    assert viewer.mouse_move_rel == (12.0, -3.0)
    assert r.camera.pos == cam_before  # the cannot-rotate quirk
    r.render_frame()
    viewer.publish()
    _, _, bstats = _get(viewer, "/stats.json")
    stats = json.loads(bstats)
    assert stats["input"]["mouse_move_rel"] == [12.0, -3.0]
    assert stats["input"]["mouse_captured"] is True
    # per-frame relative semantics: consumed by the snapshot
    assert viewer.mouse_move_rel == (0.0, 0.0)
    _post(viewer, "/control", {"mouse_capture": False})
    assert not viewer.mouse_captured


def test_serve_frames_bounded(viewer):
    viewer.serve_frames(2)
    assert viewer.renderer.num_accumulated == 2
    code, _, body = _get(viewer, "/frame.png")
    assert code == 200 and len(body) > 100
