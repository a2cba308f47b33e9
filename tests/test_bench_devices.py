"""bench.py --devices N smoke test: the sharded bench body must be
bitwise identical to the single-device bench path (Renderer frames) at
tiny resolution on the 8-virtual-device CPU mesh, so a pod run needs no
new code when multi-chip hardware appears (round-4 task 10)."""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")  # repo root: bench.py is not a package member

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    RenderConfig,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene

import bench

W, H = 64, 32
FRAMES = 3


def _scene() -> Scene:
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("cube", meshlib.cube(half=1.5), grey)
    s.add_plane("floor", (0.0, -3.0, 0.0), (0.0, 1.0, 0.0), grey)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s


def test_bench_devices_bitwise_matches_single_device():
    cam = CameraConfig(aspect=W / H)
    settings = RenderSettings()
    cfg = RenderConfig(width=W, height=H, samples_per_frame=1)

    r = Renderer(_scene(), camera=cam,
                 config=RenderConfig(width=W, height=H, samples_per_frame=1))
    single_traced = 0
    for _ in range(FRAMES + 1):  # run_sharded renders frames+1 total
        r.render_frame()
        single_traced += int(r.stats.traced_rays)
    single = np.asarray(r._pixels)

    pixels, traced, _wall = bench.run_sharded(
        _scene(), cam, settings, W, H, FRAMES, 1, cfg.seed, devices=8,
    )
    np.testing.assert_array_equal(single, np.asarray(pixels))
    assert traced == single_traced


def _scene_instanced():
    import numpy as _np

    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    tf = _np.zeros((2, 4, 4), _np.float32)
    for i in range(2):
        tf[i] = _np.eye(4)
        tf[i, 0, 3] = -1.5 + 3.0 * i
    obj = s.add_instanced_mesh("cubes", meshlib.cube(half=0.8), grey, tf)
    s.add_plane("floor", (0.0, -3.0, 0.0), (0.0, 1.0, 0.0), grey)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s, obj


def _hook_for(scene, obj):
    import numpy as _np

    def hook(frame, renderer):
        # animate: translate both instances, refit, reset (config 5's
        # shape -- scene.set_instance_transform + renderer.reset())
        for i in range(2):
            m = _np.eye(4, dtype=_np.float32)
            m[0, 3] = -1.5 + 3.0 * i + 0.2 * frame
            scene.set_instance_transform(obj, i, m)
        renderer.reset()

    return hook


def test_bench_devices_hooked_config_matches_single_device():
    """Round-5 task: config-5-style animated-refit configs run under
    --devices too; the hooked sharded loop must be bitwise identical to
    the hooked single-device Renderer loop."""
    cam = CameraConfig(aspect=W / H)
    settings = RenderSettings()

    s1, o1 = _scene_instanced()
    r = Renderer(s1, camera=cam,
                 config=RenderConfig(width=W, height=H, samples_per_frame=1))
    hook1 = _hook_for(s1, o1)
    single_traced = 0
    hook1(0, r)
    for f in range(FRAMES + 1):
        if f:
            hook1(f, r)
        r.render_frame()
        single_traced += int(r.stats.traced_rays)
    single = np.asarray(r._pixels)

    s2, o2 = _scene_instanced()
    pixels, traced, _wall = bench.run_sharded(
        s2, cam, settings, W, H, FRAMES, 1,
        RenderConfig().seed, devices=8, hook=_hook_for(s2, o2),
    )
    np.testing.assert_array_equal(single, np.asarray(pixels))
    assert traced == single_traced


def test_bench_devices_samples_mode():
    """Samples sharding: 8 chips x 1 spp accumulate 8 samples/frame;
    the accumulator weight and traced count must reflect it and the
    image must be a valid render (finite, lit)."""
    cam = CameraConfig(aspect=W / H)
    settings = RenderSettings()
    pixels, traced, _wall = bench.run_sharded(
        _scene(), cam, settings, W, H, FRAMES, 1,
        RenderConfig().seed, devices=8, shard_mode="samples",
    )
    img = np.asarray(pixels)
    assert img.shape == (W * H,)
    # every frame traced >= one primary ray per pixel per device
    assert traced >= (FRAMES + 1) * 8 * W * H
    assert (img != 0).any()
