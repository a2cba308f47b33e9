"""xplane decomposition of one config-3 frame (megakernel path): where
do the ~1000 ms go -- shade_extend, shadow_resolve, sorts, glue?

PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profile_mega_frame.py
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.benchscenes import CONFIGS
from cpugpupathtracing_tpu.config import RenderConfig
from cpugpupathtracing_tpu.models.renderer import Renderer


def main():
    name, fn = CONFIGS[int(os.environ.get("CFG", "3"))]
    scene, cam, settings, w, h, hook = fn()
    r = Renderer(
        scene, camera=cam,
        config=RenderConfig(width=w, height=h, samples_per_frame=1, seed=7),
        settings=settings,
    )
    r.render_frame()
    jax.block_until_ready(r._accumulator)

    logdir = "/tmp/xprof_megaframe"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(2):
            r.render_frame()
        jax.block_until_ready(r._accumulator)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fpath = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(fpath, "rb").read())
    plane = [p for p in space.planes if "TPU" in p.name][0]
    emeta = plane.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        for ev in line.events:
            nm = emeta[ev.metadata_id].name
            if nm.endswith("-start"):  # async copy-start spans overlap
                continue
            agg[nm] += ev.duration_ps / 1e9  # ms
            cnt[nm] += 1
    total = sum(agg.values())
    print(f"2 frames, total device op time {total:.1f} ms ({total/2:.1f}/frame)")

    def bucket(nm: str) -> str:
        l = nm.lower()
        if "shade_extend" in l or "_shade_extend" in l:
            return "kernel1 shade_extend"
        if "shadow_resolve" in l:
            return "kernel2 shadow_resolve"
        if "traverse" in l:
            return "traversal kernel (non-mega)"
        if "sort" in l:
            return "lax.sort"
        if "fusion" in l:
            return "xla fusion glue"
        if "copy" in l or "transpose" in l or "reshape" in l:
            return "copies/layout"
        return "other"

    bagg = collections.Counter()
    for nm, ms in agg.items():
        bagg[bucket(nm)] += ms
    for b, ms in bagg.most_common():
        print(f"  {b:28s} {ms/2:8.1f} ms/frame")
    print("top ops:")
    for nm, ms in agg.most_common(14):
        print(f"  {ms/2:8.1f} ms  x{cnt[nm]:3d}  {nm[:90]}")


if __name__ == "__main__":
    main()
