"""Compile-probe the megakernel pair on the real chip with a tiny
wavefront: surfaces Mosaic lowering errors in ~1 compile without paying
for the full frame graph.  Usage: python tools/mk_probe.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import make_reference_scene, packet_tables
from cpugpupathtracing_tpu.ops import megakernel as mk
from cpugpupathtracing_tpu.utils import rng as rnglib


def main():
    print("backend:", jax.default_backend(), flush=True)
    dev = make_reference_scene().device()
    # honor the CPUGPU_FUSED / _PIPELINED / _FRAMESTACK env flags exactly
    # like the integrator: the probe's whole point is reproducing the
    # flagged kernels' on-chip behavior in one small compile each
    nodes, ltris, fused_nn, ents = packet_tables(dev)
    print("tables:", nodes.shape, ltris.shape, "fused_nn", fused_nn,
          flush=True)
    n = 8192
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    # center-of-frame lanes so the probe rays actually traverse the
    # dragon (the first rows of a 1080p frame are all background)
    lane = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(1920 * 760)
    o, d, pix = camlib.blocked_lane_rays(cam, lane, 1920, 1080, 8, 128)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=3)
    flags = jnp.ones((n,), jnp.int32)
    static = dict(
        roots=dev.proots, num_mats=int(dev.mk_mats.shape[0]),
        num_lights=dev.num_lights, num_sph=int(dev.sph_center.shape[0]),
        num_pln=int(dev.pln_point.shape[0]),
        num_objs=int(dev.mk_objmat.shape[0]),
        nee=True, rr=True, cosine=True, ref_pdf=True,
        interpret=os.environ.get("CPUGPU_PROBE_INTERP") == "1",
        fused_nn=fused_nn,
    )
    t0 = time.time()
    rays, st2, tp, en, fl2, so, sd, stm, contrib = jax.block_until_ready(
        mk.shade_extend(
            nodes, ltris, dev.mk_mats, dev.mk_lights, dev.mk_light_tris,
            dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
            dev.mk_objmat, jnp.zeros((1,), jnp.int32),
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]),
            state, (jnp.ones((n,)),) * 3, (jnp.zeros((n,)),) * 3, flags,
            **static,
        )
    )
    print(f"shade_extend compiled+ran in {time.time()-t0:.0f}s; "
          f"active {int(np.asarray(fl2 & 1).sum())}, "
          f"sneed {int(np.asarray((fl2 >> 2) & 1).sum())}, "
          f"energy sum {float(np.asarray(en[0]).sum()):.3f}", flush=True)
    t0 = time.time()
    en2 = jax.block_until_ready(
        mk.shadow_resolve(
            nodes, ltris, dev.mk_sph, dev.mk_pln,
            so, sd, stm, fl2, en, contrib,
            roots=dev.proots, num_sph=int(dev.sph_center.shape[0]),
            num_pln=int(dev.pln_point.shape[0]),
            interpret=os.environ.get("CPUGPU_PROBE_INTERP") == "1",
            fused_nn=fused_nn,
        )
    )
    print(f"shadow_resolve compiled+ran in {time.time()-t0:.0f}s; "
          f"energy sum {float(np.asarray(en2[0]).sum()):.3f}", flush=True)


if __name__ == "__main__":
    main()
