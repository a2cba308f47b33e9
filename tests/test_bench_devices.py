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
