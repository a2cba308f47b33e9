"""Round-3 frame A/B on the real chip: config 3 with the megakernel
path (default) vs the XLA integrator path (CPUGPU_NO_MEGAKERNEL=1), and
optionally other configs.  Usage:

    python tools/profile_frame3.py [config] [frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.benchscenes import CONFIGS
from cpugpupathtracing_tpu.config import RenderConfig
from cpugpupathtracing_tpu.models.renderer import Renderer


def run(config: int, frames: int, label: str):
    name, fn = CONFIGS[config]
    scene, cam, settings, w, h, hook = fn()
    r = Renderer(
        scene, camera=cam,
        config=RenderConfig(width=w, height=h, samples_per_frame=1, seed=7),
        settings=settings,
    )
    t0 = time.perf_counter()
    if hook:
        hook(0, r)
    r.render_frame()
    jax.block_until_ready(r._accumulator)
    compile_s = time.perf_counter() - t0
    rays = 0
    t0 = time.perf_counter()
    for f in range(frames):
        if hook:
            hook(f + 1, r)
        r.render_frame()
        rays += r.stats.traced_rays
    jax.block_until_ready(r._accumulator)
    dt = (time.perf_counter() - t0) / frames
    print(
        f"config {config} [{label}]: {dt * 1000:8.1f} ms/frame  "
        f"{rays / frames / dt / 1e6:6.2f} Mrays/s  "
        f"mean_energy {r.mean_energy:10.4f}  (compile {compile_s:.0f}s)",
        flush=True,
    )
    return dt


def main():
    config = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    print("backend:", jax.default_backend(), flush=True)
    run(config, frames, "megakernel" if os.environ.get("CPUGPU_NO_MEGAKERNEL") != "1" else "xla-body")


if __name__ == "__main__":
    main()
