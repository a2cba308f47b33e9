"""Whole-frame PT kernel lab: iteration census + wall-clock of
ops/pt_frame_kernel.py on a benchmark config (default 2).

Reports the per-frame closest-hit and shadow iteration totals of the
whole-frame kernel (exact count_iters) next to its steady-state frame
time, so the frame decomposes as iters x ns/iter + epilogue.  Compare
with `python tools/profile_mega_census.py 2` (the per-depth megakernel
pipeline's census under the production sort schedule) to see what the
missing wavefront sort costs in iterations and what the missing
skeleton saves in milliseconds.

    python tools/ptframe_lab.py [config]
"""

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

from cpugpupathtracing_tpu.benchscenes import CONFIGS
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import (
    occl_tables,
    packet_tables,
    pt_frame_gate_reason,
)
from cpugpupathtracing_tpu.ops import pt_frame_kernel as pfk
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.config import DiffusePdfMode


def main():
    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    name, fn = CONFIGS[cfg]
    scene, cam, settings, w, h, hook = fn()
    if len(sys.argv) > 2:  # depth-limited census (hybrid sizing)
        settings = settings.replace(max_ray_depth=int(sys.argv[2]))
    dev = scene.device()
    reason = pt_frame_gate_reason(dev, settings)
    print(f"config {cfg} ({name}) {w}x{h} gate={reason or 'ACTIVE'}",
          flush=True)
    print(f"tables: {dev.pnodes.shape[0]} node rows, "
          f"{dev.pltris.shape[0]} leaf rows", flush=True)

    n = w * h
    lane = jnp.arange(n, dtype=jnp.uint32)
    bh, bw = camlib.block_shape(w, h)
    carr = camlib.to_arrays(cam)
    origin, direction, pix = camlib.blocked_lane_rays(
        carr, lane, w, h, bh, bw)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=7)

    nee = settings.next_event_estimation and dev.num_lights > 0
    mk_nodes, mk_ltris, fused_nn, mk_ents = packet_tables(dev, whole_frame=True)
    occ = occl_tables(dev, whole_frame=True)
    kw = {}
    if occ is not None:
        sh_nodes, sh_ltris, sh_roots, sh_ents = occ
        from cpugpupathtracing_tpu.models.scene import PACKET_OCCL2

        kw = dict(sh_nodes=sh_nodes, sh_ltris=sh_ltris,
                  sh_roots=sh_roots, sh_ents=sh_ents, occl=True,
                  occl_rows=2 if PACKET_OCCL2 else 1)
        print(f"occl tables: {sh_nodes.shape[0]} node rows", flush=True)
    static = dict(
        roots=dev.proots,
        num_mats=int(dev.mk_mats.shape[0]),
        num_lights=dev.num_lights,
        num_sph=int(dev.sph_center.shape[0]),
        num_pln=int(dev.pln_point.shape[0]),
        num_objs=int(dev.mk_objmat.shape[0]),
        nee=nee,
        rr=settings.russian_roulette,
        cosine=settings.cosine_weighted_diffuse,
        ref_pdf=settings.diffuse_pdf_mode == DiffusePdfMode.REFERENCE,
        depths=settings.max_ray_depth + 1,
        interpret=jax.default_backend() != "tpu",
        fused_nn=fused_nn,
        width=dev.packet_width,
        ents=mk_ents,
        **kw,
    )
    rays = (origin[:, 0], origin[:, 1], origin[:, 2],
            direction[:, 0], direction[:, 1], direction[:, 2])

    # ---- census run (count_iters executable) ----
    energy, st2, traced, iters = pfk.pt_frame(
        mk_nodes, mk_ltris, dev.mk_mats, dev.mk_lights,
        dev.mk_light_tris,
        dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
        dev.mk_objmat, rays, state, count_iters=True,
        light_tri_meta=dev.light_tri_meta, **static)
    jax.block_until_ready(energy)
    it = np.asarray(iters)
    it_c, it_s = int(it[0::2].sum()), int(it[1::2].sum())
    print(f"traced {int(traced)} rays; iterations: closest {it_c}, "
          f"shadow {it_s}, total {it_c + it_s} "
          f"({(it_c + it_s) / (n / 1024):.1f}/sub-tile)", flush=True)

    # ---- steady-state wall clock (plain executable, chained) ----
    f = jax.jit(lambda r, s: pfk.pt_frame(
        mk_nodes, mk_ltris, dev.mk_mats, dev.mk_lights,
        dev.mk_light_tris,
        dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
        dev.mk_objmat, r, s, light_tri_meta=dev.light_tri_meta,
        **static))
    e, s2, tr = f(rays, state)
    jax.block_until_ready(e)
    reps = 16
    t0 = time.perf_counter()
    s_c = state
    for _ in range(reps):
        e, s_c, tr = f(rays, s_c)  # state-chained: no dead-code reuse
    jax.block_until_ready(e)
    dt = (time.perf_counter() - t0) / reps
    ns_it = dt * 1e9 / max(it_c + it_s, 1)
    print(f"frame {dt * 1e3:.1f} ms  {int(traced) / dt / 1e6:.1f} Mrays/s  "
          f"~{ns_it:.0f} ns/iteration", flush=True)


if __name__ == "__main__":
    main()
