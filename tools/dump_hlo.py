"""Dump the optimized HLO of the frame function (tiny scene) and locate
the expensive relayout fusions by their source metadata."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.config import CameraConfig, RenderConfig, RenderSettings
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import render_frame_kernel
from cpugpupathtracing_tpu.models.scene import Scene


def main():
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("oct", meshlib.icosphere(subdivisions=0), white)
    li = s.add_sphere("light", (10.0, 10.0, 10.0), 5.0, light)
    s.mark_light(li)
    w, h = 1920, 1080
    n = w * h
    dev = s.device()
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    acc = jnp.zeros((n, 4), jnp.float32)
    lane = jnp.arange(n, dtype=jnp.uint32)
    lowered = render_frame_kernel.lower(
        dev, cam, acc, jnp.int32(0), lane, RenderSettings(), w, h, 1, 7
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    open("/tmp/frame_hlo.txt", "w").write(txt)
    print("HLO dumped:", len(txt), "chars", flush=True)
    # find fusions that output f32[N]{...S(1)} from (N,1) operands
    for m in re.finditer(r"^\s*%?fusion[^\n]*f32\[2073600\][^\n]*\n", txt, re.M):
        line = m.group(0)
        if "2073600,1" in line:
            print(line.strip()[:400])
            print("---")


if __name__ == "__main__":
    main()
