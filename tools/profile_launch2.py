"""xplane capture of ONE packet-kernel launch on the real dragon scene
(shadow-fan population: low iteration count, so the ~22 ms fixed launch
cost dominates) -- attribute the fixed cost to actual ops."""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import make_reference_scene
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX


def main():
    dev = make_reference_scene().device()
    w, h = 1920, 1080
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, w, h, 8, 128)
    t0v = jnp.full((n,), RAY_TMAX, jnp.float32)

    f = jax.jit(
        lambda o, d: pk.traverse_packet_slim(
            o, d, t0v, dev.pnodes, dev.pltris, dev.proots, any_hit=True
        )
    )
    res = f(o, d)
    jax.block_until_ready(res)

    logdir = "/tmp/xprof_launch"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(4):
            res = f(o, d)
            jax.block_until_ready(res)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fpath = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(fpath, "rb").read())
    plane = [p for p in space.planes if p.name == "/device:TPU:0"][0]
    emeta = plane.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            if "copy-done" in name or "slice-done" in name or "-start" in name:
                continue
            agg[name] += ev.duration_ps
            cnt[name] += 1
    print("sync-op total:", sum(agg.values()) / 1e9, "ms over 4 launches", flush=True)
    for name, ps in agg.most_common(14):
        print(f"{ps / 1e9:9.3f} ms x{cnt[name]:<4d} {name[:120]}")


if __name__ == "__main__":
    main()
