"""Benchmark: Mrays/sec/chip on the glass-dragon scene.

Workload = BASELINE.md: the reference default scene (glass dragon + ground
quad + two emissive spheres, Source/Main.cpp:777-819) at 1080p, advanced
integrator (NEE + cosine + RR), max depth 5, 1 spp/frame progressive.
DragonAttenuation.bin is absent from the mounted reference assets, so the
dragon is the ~92k-triangle procedural stand-in at matching scale.

Rays are counted exactly like the reference's traced_rays counter: one
per scene traversal actually performed per lane, shadow rays included
(Source/Main.cpp:301).  Prints ONE JSON line with Mrays/s and
vs_baseline against the 100 Mrays/s/chip target.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# amortize the (long) remote TPU compiles across bench invocations
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    width, height = map(int, sys.argv[1:3]) if len(sys.argv) >= 3 else (1920, 1080)
    frames = int(sys.argv[3]) if len(sys.argv) >= 4 else 8

    from cpugpupathtracing_tpu.config import RenderConfig, RenderSettings, RenderMode
    from cpugpupathtracing_tpu.models.renderer import Renderer
    from cpugpupathtracing_tpu.models.scene import make_reference_scene

    t0 = time.time()
    scene = make_reference_scene()
    build_s = time.time() - t0

    r = Renderer(
        scene,
        config=RenderConfig(width=width, height=height),
        settings=RenderSettings(render_mode=RenderMode.ADVANCED),
    )

    t0 = time.time()
    r.render_frame()  # compile + first frame
    compile_s = time.time() - t0

    rays = 0
    t0 = time.time()
    for _ in range(frames):
        r.render_frame()
        rays += r.stats.traced_rays
    wall = time.time() - t0

    mrays = rays / wall / 1e6
    frame_ms = wall / frames * 1000.0
    result = {
        "metric": "Mrays/sec/chip glass-dragon 1080p advanced (NEE+cos+RR, depth 5)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "extra": {
            "frame_ms": round(frame_ms, 2),
            "rays_per_frame": rays // frames,
            "resolution": f"{width}x{height}",
            "frames_timed": frames,
            "bvh_build_s": round(build_s, 1),
            "first_frame_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
