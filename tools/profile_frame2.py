"""Frame-composition profile of benchmark config 3 on the real chip:
times full frames across settings variants (depth / NEE on-off) to
attribute the frame to primary, shadow-fan, and bounce-tail phases.
Run with the default (TPU) env; each variant compiles once (~minutes,
persistent cache helps across runs)."""

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


def run_variant(scene, cam, settings, w, h, label, frames=3):
    r = Renderer(
        scene, camera=cam,
        config=RenderConfig(width=w, height=h, samples_per_frame=1, seed=7),
        settings=settings,
    )
    t0 = time.perf_counter()
    r.render_frame()
    jax.block_until_ready(r._accumulator)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rays = 0
    for _ in range(frames):
        r.render_frame()
        rays += r.stats.traced_rays
    jax.block_until_ready(r._accumulator)
    dt = (time.perf_counter() - t0) / frames
    print(
        f"{label:46s} {dt * 1000:9.1f} ms/frame "
        f"{rays / frames / 1e6:6.2f} Mrays "
        f"{rays / frames / dt / 1e6:6.2f} Mrays/s "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )
    return dt


def main():
    name, fn = CONFIGS[3]
    scene, cam, settings, w, h, _ = fn()
    print(f"config 3 ({name}) {w}x{h}, backend {jax.default_backend()}", flush=True)

    variants = [
        ("full (depth 5, NEE, RR)", settings),
        ("depth 0 (primary+shade only)", settings.replace(max_ray_depth=0)),
        ("depth 0, NEE off", settings.replace(max_ray_depth=0, next_event_estimation=False)),
        ("depth 1", settings.replace(max_ray_depth=1)),
        ("depth 2", settings.replace(max_ray_depth=2)),
        ("depth 5, NEE off", settings.replace(next_event_estimation=False)),
    ]
    for label, s in variants:
        run_variant(scene, cam, s, w, h, label)


if __name__ == "__main__" and os.environ.get("SKEL") != "1":
    main()


def skeleton():
    """Same frame shapes on a ~10-tri scene: traversal ~free, so the
    frame time IS the XLA shading + sort + RNG skeleton cost at 2M
    lanes x 6 depths."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import Scene
    from cpugpupathtracing_tpu.config import CameraConfig, RenderSettings

    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("oct", meshlib.icosphere(subdivisions=0), white)
    li = s.add_sphere("light", (10.0, 10.0, 10.0), 5.0, light)
    s.mark_light(li)
    cam = CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9)
    which = os.environ.get("SKEL_VARIANTS", "base")
    if which == "base":
        run_variant(s, cam, RenderSettings(), 1920, 1080, "tiny-scene skeleton (full settings)")
        run_variant(
            s, cam, RenderSettings(max_ray_depth=0),
            1920, 1080, "tiny-scene skeleton depth 0",
        )
    elif which == "split":
        run_variant(
            s, cam, RenderSettings(next_event_estimation=False),
            1920, 1080, "skel depth5 NEE off",
        )
        os.environ["CPUGPU_NO_SORT"] = "1"
        run_variant(s, cam, RenderSettings(), 1920, 1080, "skel depth5 SORT off")
        run_variant(
            s, cam, RenderSettings(next_event_estimation=False),
            1920, 1080, "skel depth5 NEE off SORT off",
        )
        run_variant(
            s, cam,
            RenderSettings(next_event_estimation=False, russian_roulette=False,
                           cosine_weighted_diffuse=False),
            1920, 1080, "skel depth5 NEE/RR/cos off SORT off",
        )


if __name__ == "__main__" and os.environ.get("SKEL") == "1":
    skeleton()
