"""Op-level profile of one frame: jax.profiler trace -> xplane parse ->
top HLO ops by self time.  Answers where the per-depth XLA skeleton cost
actually goes (fusion misses, scan carry copies, sort internals)."""

from __future__ import annotations

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from cpugpupathtracing_tpu.config import CameraConfig, RenderConfig, RenderSettings
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.renderer import Renderer
    from cpugpupathtracing_tpu.models.scene import Scene

    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("oct", meshlib.icosphere(subdivisions=0), white)
    li = s.add_sphere("light", (10.0, 10.0, 10.0), 5.0, light)
    s.mark_light(li)
    use_real = os.environ.get("PROF_REAL") == "1"
    if use_real:
        from cpugpupathtracing_tpu.models.scene import make_reference_scene

        s = make_reference_scene()
    cam = CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9)
    r = Renderer(
        s, camera=cam,
        config=RenderConfig(width=1920, height=1080, samples_per_frame=1, seed=7),
        settings=RenderSettings(),
    )
    r.render_frame()  # compile
    jax.block_until_ready(r._accumulator)

    logdir = "/tmp/xprof_frame"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        r.render_frame()
        jax.block_until_ready(r._accumulator)

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
    # parse via the plugin's xplane -> op profile converter
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(files, "framework_op_stats", {})
    out = "/tmp/op_stats.txt"
    if isinstance(data, bytes):
        open(out, "wb").write(data)
    else:
        open(out, "w").write(str(data))
    print("wrote", out, "bytes:", os.path.getsize(out), flush=True)


if __name__ == "__main__":
    main()
