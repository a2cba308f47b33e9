"""Per-depth iteration census of the config-3 megakernel frame: for
every integrator depth, how many while-loop iterations do the
closest-hit (shade_extend) and any-hit (shadow_resolve) traversals
cost, how many lanes/sub-tiles are live, and what are the eager
per-launch times?  Pinpoints which depth's fan dominates the frame.

    python tools/profile_mega_census.py [config]
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
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models.integrators import sort_wavefront
from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.models.scene import megakernel_active
from cpugpupathtracing_tpu.ops import megakernel as mk
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.config import DiffusePdfMode


def main():
    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    name, fn = CONFIGS[cfg]
    scene, cam, settings, w, h, hook = fn()
    dev = scene.device()
    assert megakernel_active(dev, settings), "config not on the megakernel path"
    print(f"config {cfg} ({name}) {w}x{h}", flush=True)

    n = w * h
    lane = jnp.arange(n, dtype=jnp.uint32)
    bh, bw = camlib.block_shape(w, h)
    carr = camlib.to_arrays(cam)
    origin, direction, pix = camlib.blocked_lane_rays(carr, lane, w, h, bh, bw)
    state = rnglib.seed_lanes(pix, jnp.uint32(0), salt=7)
    idx = lane.astype(jnp.int32)

    f32 = jnp.float32
    nee = settings.next_event_estimation and dev.num_lights > 0
    num_sph = int(dev.sph_center.shape[0])
    num_pln = int(dev.pln_point.shape[0])
    # mirror trace_advanced_mega's table selection: under
    # CPUGPU_LEAF14 the closest-hit traversal rides the leaf-14
    # tables with the parallel payload rows
    mk_nodes, mk_ltris, mk_roots = dev.pnodes, dev.pltris, dev.proots
    pay_kw = {}
    if dev.poccl_pay is not None and not (
        dev.num_instances and not dev.packet_flattened
    ):
        mk_nodes, mk_ltris = dev.poccl_nodes, dev.poccl_ltris
        mk_roots = dev.poccl_roots
        pay_kw = dict(pay=dev.poccl_pay)
    static = dict(
        roots=mk_roots,
        num_mats=int(dev.mk_mats.shape[0]),
        num_lights=dev.num_lights,
        num_sph=num_sph,
        num_pln=num_pln,
        num_objs=int(dev.mk_objmat.shape[0]),
        nee=nee,
        rr=settings.russian_roulette,
        cosine=settings.cosine_weighted_diffuse,
        ref_pdf=settings.diffuse_pdf_mode == DiffusePdfMode.REFERENCE,
        interpret=jax.default_backend() != "tpu",
        count_iters=True,
        **pay_kw,
    )
    shadow_extra = {}
    if dev.num_instances and not dev.packet_flattened:
        static.update(
            inst_inv=dev.inst_inv, inst_nrm=dev.inst_nrm,
            inst_root=dev.inst_blas_root_packet,
        )
        shadow_extra = dict(
            inst_inv=dev.inst_inv, inst_root=dev.inst_blas_root_packet,
        )
    c = dict(
        throughput=jnp.ones((n, 3), f32),
        energy=jnp.zeros((n, 3), f32),
        active=jnp.ones((n,), jnp.int32),
        is_specular=jnp.zeros((n,), jnp.int32),
        ray_ox=origin[:, 0], ray_oy=origin[:, 1], ray_oz=origin[:, 2],
        ray_dx=direction[:, 0], ray_dy=direction[:, 1], ray_dz=direction[:, 2],
        state=state,
        lane=idx,
    )

    tot_shade_it = tot_shadow_it = 0
    for d in range(settings.max_ray_depth + 1):
        flags = c["active"] | (c["is_specular"] << 1)
        nact = int(np.asarray(jnp.sum(c["active"])))
        t0 = time.perf_counter()
        res = mk.shade_extend(
            mk_nodes, mk_ltris, dev.mk_mats, dev.mk_lights,
            dev.mk_light_tris,
            dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
            dev.mk_objmat,
            jnp.int32(d)[None],
            (c["ray_ox"], c["ray_oy"], c["ray_oz"],
             c["ray_dx"], c["ray_dy"], c["ray_dz"]),
            c["state"],
            (c["throughput"][:, 0], c["throughput"][:, 1], c["throughput"][:, 2]),
            (c["energy"][:, 0], c["energy"][:, 1], c["energy"][:, 2]),
            flags,
            **static,
        )
        jax.block_until_ready(res)
        dt1 = time.perf_counter() - t0
        rays, state2, tp, en, flags2, so, sd, stmax, contrib, sh_iters = res
        sh_iters = np.asarray(sh_iters)
        live_tiles = int((sh_iters > 0).sum())
        tot_shade_it += int(sh_iters.sum())

        line = (
            f"d{d}: act {nact / 1e6:5.2f}M  shade {sh_iters.sum():8d} it "
            f"(max {sh_iters.max():4d}, live tiles {live_tiles:4d}/{sh_iters.size})"
            f" {dt1 * 1e3:7.1f} ms"
        )
        if nee:
            sneed = (flags2 >> 2) & 1
            nsh = int(np.asarray(jnp.sum(sneed)))
            t0 = time.perf_counter()
            occ = scenelib.occl_tables(dev)
            if occ is not None:  # CPUGPU_OCCL=1: occl any-hit tables
                sh_nodes, sh_ltris, sh_roots, sh_ents = occ
                sh_kw = dict(roots=sh_roots, occl=True)
            else:
                sh_nodes, sh_ltris = dev.pnodes, dev.pltris
                sh_kw = dict(roots=dev.proots, **shadow_extra)
            en_res = mk.shadow_resolve(
                sh_nodes, sh_ltris, dev.mk_sph, dev.mk_pln,
                so, sd, stmax, flags2, en, contrib,
                num_sph=num_sph, num_pln=num_pln,
                interpret=static["interpret"], count_iters=True,
                **sh_kw,
            )
            jax.block_until_ready(en_res)
            dt2 = time.perf_counter() - t0
            en = en_res[:3]
            sw_iters = np.asarray(en_res[3])
            tot_shadow_it += int(sw_iters.sum())
            line += (
                f"  | sneed {nsh / 1e6:5.2f}M  shadow {sw_iters.sum():8d} it "
                f"(max {sw_iters.max():4d}, live {int((sw_iters > 0).sum()):4d})"
                f" {dt2 * 1e3:7.1f} ms"
            )
        print(line, flush=True)

        nc = dict(
            throughput=jnp.stack(tp, axis=1),
            energy=jnp.stack(en, axis=1),
            active=flags2 & 1,
            is_specular=(flags2 >> 1) & 1,
            ray_ox=rays[0], ray_oy=rays[1], ray_oz=rays[2],
            ray_dx=rays[3], ray_dy=rays[4], ray_dz=rays[5],
            state=state2,
            lane=c["lane"],
        )
        if d < settings.max_ray_depth:
            # mirror trace_advanced_mega's measured schedule; override
            # per-depth with e.g. CENSUS_MODES=compact,compact,morton8,...
            env = os.environ.get("CENSUS_MODES")
            if env:
                mode = env.split(",")[min(d, len(env.split(",")) - 1)]
            elif d >= min(3, settings.max_ray_depth):
                mode = "none"  # production skips late-boundary sorts
            else:
                mode = "compact" if d == 0 else "morton8"
            if mode != "none":
                nc = sort_wavefront(dev, nc, idx, aovs=False, mode=mode)
        c = nc

    print(
        f"total: shade {tot_shade_it} it, shadow {tot_shadow_it} it "
        f"(at ~1.2 us/it: {(tot_shade_it + tot_shadow_it) * 1.2e-3:.0f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
