"""Monte-Carlo path-tracing integrators as masked wavefront loops.

Both integrators of the reference are reproduced with identical physics
over SoA ray batches:

  * `trace_brute` -- TracePath (Source/Main.cpp:581-689): the recursive
    brute-force tracer.  Its recursion is a straight chain (each level
    spawns at most one secondary ray), so it unrolls to an iterative
    throughput/energy loop bit-identically.
  * `trace_advanced` -- TracePathAdvanced (Source/Main.cpp:396-579): the
    iterative tracer with next-event estimation, Russian roulette, and
    (optionally) cosine-weighted diffuse sampling.

Instead of per-pixel recursion on a thread pool, a fixed `max_ray_depth+1`
Python loop (statically unrolled under jit) advances every lane together;
per-lane `active` masks replace `break`.  All three material lobes are
evaluated each bounce and lane-selected -- lobe math is trivially cheap
next to scene traversal, so masked evaluation wastes nothing that
matters on a lockstep VPU.

Faithfully reproduced reference behaviors (deliberate, see SURVEY.md):
  * NEE double-count guard: light-hit emission only added for primary or
    specular-flagged rays when NEE is on (Main.cpp:424-431).
  * Total internal reflection in the advanced tracer leaves the ray
    unchanged and continues the loop, re-tracing the same segment (the
    k < 0 case falls through with no new ray, Main.cpp:512-546); in the
    brute-force tracer TIR terminates the path with zero contribution
    (Main.cpp:645-674).
  * The swapped diffuse-pdf constants (Main.cpp:553-564) under
    DiffusePdfMode.REFERENCE; DiffusePdfMode.CORRECT uses the right ones.
  * Russian roulette runs after NEE, before lobe selection, at every
    vertex including the first (Main.cpp:468-475).
  * traced_rays counts one per scene/shadow traversal actually performed
    per lane, like data.stats.traced_rays (Main.cpp:301).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cpugpupathtracing_tpu.config import DebugRenderMode, DiffusePdfMode, RenderSettings
from cpugpupathtracing_tpu.models.scene import (
    PACKET_OCCL2,
    DeviceScene,
    active_bit,
    hit_surface,
    intersect_scene,
    occl_tables,
    packet_path_active,
    packet_tables,
    reorder_key,
)
from cpugpupathtracing_tpu.ops import sampling
from cpugpupathtracing_tpu.ops.gathers import select_rows
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import (
    INV_PI,
    PI,
    RAY_NUDGE,
    RAY_TMAX,
    TWO_PI,
    dot,
    length,
    lerp,
)

import numpy as _np

_GREEN = _np.array([0.0, 1.0, 0.0], _np.float32)  # np, not jnp: inlined literal
_RED = _np.array([1.0, 0.0, 0.0], _np.float32)


class TraceResult(NamedTuple):
    energy: jnp.ndarray       # (N, 3) radiance estimate per lane
    traced_rays: jnp.ndarray  # () i32: scene+shadow traversals performed
    ray_depth: jnp.ndarray    # (N,) i32 final path depth (debug AOV)
    bvh_depth: jnp.ndarray    # (N,) i32 primary-ray interior descents


class LightSample(NamedTuple):
    """LightSample (Source/Main.cpp:340-349) over lanes."""

    pos: jnp.ndarray
    to_light: jnp.ndarray
    distance: jnp.ndarray
    normal: jnp.ndarray
    emission: jnp.ndarray
    area: jnp.ndarray


def trace_chunked(
    trace_fn,
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    max_chunk: int = 131072,
    idx=None,
):
    """Run a trace function over the batch in sequential chunks via
    lax.map.

    Replaces the reference's 16x16-tile job decomposition
    (Source/Main.cpp:698-754) on-device: each chunk is a contiguous slab
    of image rows, so its lockstep traversal loop exits as soon as the
    slowest ray *in that slab* finishes (not in the whole frame), and
    peak traversal state (per-lane stacks) is bounded by the chunk size.
    Results are bitwise identical to an unchunked call: RNG streams key
    on global lane index and hits are exact.
    """
    n = origin.shape[0]
    if packet_path_active(dev):
        # the packet kernel's grid programs are already independent
        # fixed-size tiles; XLA-level chunking would only serialize
        # pallas launches
        max_chunk = 1 << 22
    if n <= max_chunk:
        return trace_fn(dev, settings, origin, direction, state, idx=idx)
    # chunked calls drop idx: wavefront sorting only runs on the
    # unchunked packet path (chunk-local identities would be needed)
    # full-size chunks via lax.map plus ONE remainder call: exact ray
    # counts, no divisor search (a prime n used to degrade to chunk
    # size 1), at most two traced trace_fn bodies
    num_full = n // max_chunk
    rem = n % max_chunk
    m = max_chunk
    k = num_full * m

    def f(args):
        o, d, s = args
        return trace_fn(dev, settings, o, d, s)

    states, res = jax.lax.map(
        f,
        (
            origin[:k].reshape(num_full, m, 3),
            direction[:k].reshape(num_full, m, 3),
            state[:k].reshape(num_full, m),
        ),
    )
    states = states.reshape(k)
    energy = res.energy.reshape(k, 3)
    traced = jnp.sum(res.traced_rays, dtype=jnp.int32)
    ray_depth = res.ray_depth.reshape(k)
    bvh_depth = res.bvh_depth.reshape(k)
    if rem:
        st_r, res_r = trace_fn(dev, settings, origin[k:], direction[k:], state[k:])
        states = jnp.concatenate([states, st_r])
        energy = jnp.concatenate([energy, res_r.energy])
        traced = traced + res_r.traced_rays
        ray_depth = jnp.concatenate([ray_depth, res_r.ray_depth])
        bvh_depth = jnp.concatenate([bvh_depth, res_r.bvh_depth])
    return states, TraceResult(
        energy=energy,
        traced_rays=traced,
        ray_depth=ray_depth,
        bvh_depth=bvh_depth,
    )


def sort_wavefront(dev: DeviceScene, c: dict, slots, aovs: bool = True,
                   mode: str = "morton5") -> dict:
    """Permute every per-lane carry column by the ray-coherence key
    (scene.reorder_key) of the carry's next ray.

    The TPU replacement for the reference's early-returning pool threads
    (Source/Main.cpp:704-748): the packet kernel traverses 128-lane
    sub-packets in lockstep, so scattered dead lanes and incoherent
    bounce fans cost the union of every lane's node sequence.  One sort
    per depth (a) drains dead lanes in compact sub-packets and (b)
    regroups survivors by direction octant + origin morton.  Bitwise
    invisible: shading and RNG are strictly per-lane (the state and the
    `lane` identity column ride along), hits are exact, and the only
    cross-lane reduction (`traced`) is an integer sum.

    The permutation is ONE multi-payload lax.sort: on this part a sort
    with k payload operands is far cheaper than sort-then-gather (key +
    6 payloads ~9.6 ms at 1080p vs ~60 ms for a second (N, 8) row
    gather, tools/profile_reorder.py).  The small integer/bool entries
    (active, is_specular, final_depth, bvh_depth0) fold into ONE payload
    -- fd(8 bits) | bvh_depth0 << 8 (22 bits) | active << 30 |
    is_specular << 31 -- to cut the operand count.  `slots` is the fixed
    0..N-1 position iota passed as a DEVICE array (an embedded iota
    breaks multi-device dispatch, see camera.lane_rays); it rides as a
    payload only to keep the sort's operand shapes uniform.

    `mode` picks the coherence key (measured head-to-head on the chip,
    tools/fan_lab.py):
      - "compact": key = 1 - active only.  lax.sort is STABLE, so live
        lanes KEEP their incoming (camera-blocked) order -- measured
        35% fewer bounce-fan iterations than any morton regroup,
        because adjacent pixels' hit points are far closer than any
        key's quantization cell.  The right mode whenever the incoming
        order is already spatially coherent (the depth-0 boundary).
      - "morton5"/"morton8": scene.reorder_key at 5/8 bits per axis.
        Morton regrouping wins once the wavefront has genuinely
        scattered (glass-interior fans: ~2x fewer iterations than
        unsorted); 8 bits resolves positions inside a mesh.
    """
    act_i = c["active"].astype(jnp.int32)
    if mode == "compact":
        key = 1 - act_i
    elif mode == "compact_oct":
        # octant-major, stable pixel order within: separates the mixed
        # Fresnel reflect/refract lobes adjacent pixels draw while
        # keeping each lobe's pixel locality
        octant = (
            (c["ray_dx"] < 0).astype(jnp.int32)
            | ((c["ray_dy"] < 0).astype(jnp.int32) << 1)
            | ((c["ray_dz"] < 0).astype(jnp.int32) << 2)
        )
        key = ((1 - act_i) << 3) | octant
    else:
        key = reorder_key(
            dev,
            jnp.stack([c["ray_ox"], c["ray_oy"], c["ray_oz"]], axis=1),
            jnp.stack([c["ray_dx"], c["ray_dy"], c["ray_dz"]], axis=1),
            act_i,
            bits=5 if mode == "morton5" else 8,
        )

    folded = dict(c)
    folded.pop("active")
    spec = folded.pop("is_specular", None)
    if aovs:
        # mask bvh_depth0 to its 22-bit field: a >= 2^22 descent count
        # must degrade the debug AOV only, never leak into the
        # active/spec bits
        word = folded.pop("final_depth") | (
            (folded.pop("bvh_depth0") & 0x3FFFFF) << 8
        )
        word = word | (act_i << 30)
        if spec is not None:
            word = word | (spec.astype(jnp.int32) << 31)
        folded["_word"] = word
    else:
        # AOV-free fast path: active already rides the key's top field,
        # and is_specular rides bit 30 of the lane payload -- one
        # payload fewer than carrying either separately.  (Folding spec
        # into the key's LSB -- the round-3 first cut -- was measured
        # to cost 13% bounce-fan iterations in "compact" mode: it
        # regroups by lobe type and breaks the pixel-order locality
        # that mode exists to preserve, tools/fan_lab.py.)
        if spec is not None:
            folded["lane"] = folded["lane"] | (spec.astype(jnp.int32) << 30)

    cols, meta = [], {}
    for k in sorted(folded):
        v = folded[k]
        if v.ndim == 0:
            continue
        if v.ndim == 2:
            meta[k] = (len(cols), v.shape[1])
            cols.extend(v[:, j] for j in range(v.shape[1]))
        else:
            meta[k] = (len(cols), 0)
            cols.append(v)
    sorted_all = jax.lax.sort((key, *cols), num_keys=1)
    key_s, cols = sorted_all[0], sorted_all[1:]

    out = {}
    for k, v in folded.items():
        if v.ndim == 0:
            out[k] = v
            continue
        start, width = meta[k]
        if width:
            out[k] = jnp.stack(cols[start : start + width], axis=1)
        else:
            out[k] = cols[start]
    if aovs:
        word = out.pop("_word")
        out["final_depth"] = word & 0xFF
        out["bvh_depth0"] = (word >> 8) & 0x3FFFFF
        out["active"] = (word >> 30) & 1
        if spec is not None:
            out["is_specular"] = jax.lax.shift_right_logical(word, 31)  # bit 31
    else:
        # reconstruct the folded flags: (1 - active) sits at the key's
        # mode-dependent top field, is_specular at bit 30 of lane
        out["active"] = 1 - ((key_s >> active_bit(mode)) & 1)
        if spec is not None:
            out["is_specular"] = out["lane"] >> 30
            out["lane"] = out["lane"] & 0x3FFFFFFF
    return out


def sorted_shadow_resolve(dev, mk, so, sd, stmax, flags, en, contrib,
                          slots, *, static, tables=None):
    """Run the NEE shadow any-hit over a coherence-SORTED fan.

    The depth-0 shadow fan is the frame's single hottest launch on the
    benchmark scene (~210k packet iterations of a 767k-iteration frame,
    tools/profile_mega_census.py): the wavefront enters depth 0 in
    camera-blocked order, so adjacent lanes aim at *different* randomly
    chosen lights (Main.cpp:441 rand % num_lights) and every 1024-lane
    sub-tile's shared-stack union covers both light paths.  One extra
    multi-payload sort by the occlusion ray's coherence key
    (scene.reorder_key: sneed-first | direction octant | origin morton)
    regroups the fan by light direction and packs shadow-less lanes
    into sub-tiles the kernel skips.

    Bitwise invisible: the kernel runs with ZERO energy input so its
    output is the pure per-lane NEE delta (visible * contrib, the same
    single f32 values as the unsorted kernel computes), which one
    restore sort returns to lane order before the identical en + delta
    add.  Cost: sort (key + 11 payloads) + restore (key + 3) ~ 16 ms at
    1080p vs the ~100 ms fan-iteration saving measured on the chip."""
    sneed = (flags >> 2) & 1
    key = reorder_key(
        dev,
        jnp.stack(so, axis=1),
        jnp.stack(sd, axis=1),
        sneed,
    )
    sorted_all = jax.lax.sort(
        (key, *so, *sd, stmax, *contrib, slots), num_keys=1
    )
    key_s = sorted_all[0]
    so_s, sd_s = sorted_all[1:4], sorted_all[4:7]
    stm_s, contrib_s, slots_s = sorted_all[7], sorted_all[8:11], sorted_all[11]
    sneed_s = 1 - ((key_s >> 18) & 1)
    zero = jnp.zeros_like(en[0])
    if tables is not None:
        s_nodes, s_ltris = tables  # occl or fused, per `static`
    else:
        s_nodes, s_ltris, _, _ = packet_tables(dev)
    delta = mk.shadow_resolve(
        s_nodes, s_ltris, dev.mk_sph, dev.mk_pln,
        so_s, sd_s, stm_s, sneed_s << 2, (zero, zero, zero), contrib_s,
        **static,
    )
    d0, d1, d2 = jax.lax.sort((slots_s, *delta), num_keys=1)[1:]
    return (en[0] + d0, en[1] + d1, en[2] + d2)


def restore_lane_order(lane, slots, cols):
    """Undo wavefront sorting: one multi-payload sort keyed on the
    original lane id returns the given per-lane columns to caller
    order.  `slots` is unused (kept for signature parity with
    sort_wavefront's iota-free contract)."""
    del slots
    return jax.lax.sort((lane, *cols), num_keys=1)[1:]


def _gather_material(dev: DeviceScene, mat_idx):
    """Material lookup (GetRayHitResult's data.materials[mat_index],
    Source/Main.cpp:336) as select chains: a handful of materials make a
    small table, and per-lane XLA gathers cost ~15 ms each at wavefront
    width on TPU (ops/gathers.py)."""
    m = dev.mat
    return dict(
        albedo=select_rows(m.albedo, mat_idx),
        specular=select_rows(m.specular, mat_idx),
        refractivity=select_rows(m.refractivity, mat_idx),
        absorption=select_rows(m.absorption, mat_idx),
        ior=select_rows(m.ior, mat_idx),
        emissive=select_rows(m.emissive, mat_idx),
        intensity=select_rows(m.intensity, mat_idx),
        is_light=select_rows(m.is_light, mat_idx),
    )


def sample_light(dev: DeviceScene, state, pos):
    """GetRandomLightSourceForSample (Source/Main.cpp:351-394): pick one
    of the K lights uniformly, sample a point on it (visible hemisphere
    for spheres, uniform random triangle for meshes), return the
    solid-angle ingredients.  Both branches are evaluated and
    lane-selected."""
    nl = dev.num_lights
    state, li = rnglib.next_u32_range(state, 0, nl - 1)
    li = li.astype(jnp.int32)
    is_sph = select_rows(dev.light_is_sphere, li)

    # sphere light: visible-hemisphere point, half-sphere area
    center = select_rows(dev.light_sph_center, li)
    radius = select_rows(dev.light_sph_radius, li)
    state, p_sph = sampling.random_point_sphere_facing(state, center, radius, pos)
    n_sph = (p_sph - center) / jnp.maximum(radius[:, None], 1e-20)
    area_sph = TWO_PI * select_rows(dev.light_sph_radius_sq, li)

    # mesh light: uniform triangle, fold-sample, half total area.
    # statically skipped when every light is a sphere (the triangle-row
    # gathers are expensive at wavefront width).
    if dev.has_mesh_lights and dev.num_triangles > 0:
        start = select_rows(dev.light_tri_start, li).astype(jnp.uint32)
        count = select_rows(dev.light_tri_count, li).astype(jnp.uint32)
        state, ti = rnglib.next_u32_range(state, start, start + count - jnp.uint32(1))
        tmax = max(dev.num_triangles - 1, 0)
        ti = jnp.clip(ti.astype(jnp.int32), 0, tmax)
        row = dev.tris9[ti]
        v0 = row[:, 0:3]
        v1 = v0 + row[:, 3:6]
        v2 = v0 + row[:, 6:9]
        state, p_tri = sampling.random_point_triangle(state, v0, v1, v2)
        n_tri = dev.tri_normal[ti]
        area_tri = select_rows(dev.light_half_area, li)
        lpos = jnp.where(is_sph[:, None], p_sph, p_tri)
        lnormal = jnp.where(is_sph[:, None], n_sph, n_tri)
        area = jnp.where(is_sph, area_sph, area_tri)
    else:
        # keep the RNG stream layout identical (3 draws) regardless
        state, _ = rnglib.next_u32(state)
        state, _ = rnglib.next_f32(state)
        state, _ = rnglib.next_f32(state)
        lpos, lnormal, area = p_sph, n_sph, area_sph

    lmat = _gather_material(
        dev, select_rows(dev.obj_mat, select_rows(dev.light_obj, li))
    )
    emission = lmat["emissive"] * lmat["intensity"][:, None]

    to_light = lpos - pos
    distance = length(to_light)
    to_light = to_light / jnp.maximum(distance[:, None], 1e-20)
    return state, LightSample(lpos, to_light, distance, lnormal, emission, area)


def _dielectric(ray_d, normal, mat):
    """Shared dielectric ingredients (Source/Main.cpp:488-519 and
    :621-653 are identical code): returns (tir, inside, refract_dir,
    fresnel reflectance)."""
    cosi_raw = jnp.clip(dot(normal, ray_d), -1.0, 1.0)
    outside = cosi_raw < 0.0          # reference: inside=false when cosi<0
    inside = ~outside
    cosi = jnp.abs(cosi_raw)
    etai = jnp.where(outside, 1.0, mat["ior"])
    etat = jnp.where(outside, mat["ior"], 1.0)
    n_ref = jnp.where(outside[:, None], normal, -normal)
    eta = etai / etat
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    refract_dir = sampling.refract(ray_d, n_ref, eta, cosi, jnp.maximum(k, 0.0))
    angle_in = dot(ray_d, normal)
    angle_out = dot(refract_dir, normal)
    fr = sampling.fresnel(angle_in, angle_out, etai, etat)
    fr = jnp.where(tir, 1.0, fr)
    return tir, inside, refract_dir, fr


def _diffuse_bounce(state, normal, settings: RenderSettings):
    """Diffuse direction + (NdotR / pdf) weight, both sampling modes
    (Source/Main.cpp:548-568)."""
    if settings.cosine_weighted_diffuse:
        state, d = sampling.cosine_weighted(state, normal)
        ndotr = dot(d, normal)
        if settings.diffuse_pdf_mode == DiffusePdfMode.REFERENCE:
            pdf = 1.0 / TWO_PI          # reference's swapped constant
        else:
            pdf = jnp.maximum(ndotr, 1e-6) / PI
    else:
        state, d = sampling.uniform_hemisphere(state, normal)
        ndotr = dot(d, normal)
        if settings.diffuse_pdf_mode == DiffusePdfMode.REFERENCE:
            pdf = jnp.maximum(ndotr, 1e-6) / PI  # reference's swapped constant
        else:
            pdf = 1.0 / TWO_PI
    return state, d, ndotr, ndotr / pdf


def _debug_bvh_result(dev, origin, direction, state, n):
    """DEBUG_RENDER_MODE_BVH_DEPTH short-circuit: one primary traversal,
    heatmap energy (Main.cpp:408-412)."""
    hit = intersect_scene(
        dev, origin, direction, jnp.full((n,), RAY_TMAX, jnp.float32)
    )
    energy = lerp(_GREEN, _RED, (hit.bvh_depth.astype(jnp.float32) / 30.0)[:, None])
    return state, TraceResult(
        energy, jnp.asarray(n, jnp.int32), jnp.zeros((n,), jnp.int32), hit.bvh_depth
    )


def trace_advanced(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
) -> tuple[jnp.ndarray, TraceResult]:
    """TracePathAdvanced (Source/Main.cpp:396-579) over a lane batch.
    The depth loop is a lax.scan (one traced body, fast compiles).
    `idx` (optional (N,) 0..N-1 device array) enables once-per-depth
    wavefront sorting on the packet path (sort_wavefront) -- bitwise
    identical images, coherent sub-packets, dead-lane compaction.
    Returns (rng_state, TraceResult)."""
    n = origin.shape[0]
    f32 = jnp.float32
    debug_bvh = settings.debug_render_mode == DebugRenderMode.BVH_DEPTH
    if debug_bvh:
        return _debug_bvh_result(dev, origin, direction, state, n)
    nee = settings.next_event_estimation and dev.num_lights > 0
    aovs = settings.aovs_active
    do_sort = (
        idx is not None
        and settings.max_ray_depth + 1 <= 0xFF  # fits sort_wavefront's fold
        and packet_path_active(dev)
    )

    carry = dict(
        throughput=jnp.ones((n, 3), f32),
        energy=jnp.zeros((n, 3), f32),
        # flags carried as i32, not bool: packed-pred carries force
        # per-depth layout-conversion copies on TPU
        active=jnp.ones((n,), jnp.int32),
        is_specular=jnp.zeros((n,), jnp.int32),
        # rays carried COMPONENTWISE: 1-D T(1024)-tiled arrays cross the
        # scan / sort / pallas boundaries without relayout copies
        ray_ox=origin[:, 0], ray_oy=origin[:, 1], ray_oz=origin[:, 2],
        ray_dx=direction[:, 0], ray_dy=direction[:, 1], ray_dz=direction[:, 2],
        state=state,
        traced=jnp.zeros((), jnp.int32),
    )
    if aovs:
        carry["final_depth"] = jnp.zeros((n,), jnp.int32)
        carry["bvh_depth0"] = jnp.zeros((n,), jnp.int32)
    if do_sort:
        carry["lane"] = idx.astype(jnp.int32)

    def body(c, depth):
        state = c["state"]
        active, throughput, energy = c["active"] != 0, c["throughput"], c["energy"]
        is_specular = c["is_specular"] != 0
        final_depth = c["final_depth"] if aovs else None
        ro_c = (c["ray_ox"], c["ray_oy"], c["ray_oz"])
        rd_c = (c["ray_dx"], c["ray_dy"], c["ray_dz"])
        # stacked views for the shading math: fuse into elementwise
        # consumers, never materialized at a boundary
        ray_o = jnp.stack(ro_c, axis=1)
        ray_d = jnp.stack(rd_c, axis=1)

        traced = c["traced"] + jnp.sum(active, dtype=jnp.int32)
        hit = intersect_scene(
            dev, ro_c, rd_c, jnp.full((n,), RAY_TMAX, f32), active=active,
            count_depth=aovs,
        )
        if aovs:
            bvh_depth0 = jnp.where(depth == 0, hit.bvh_depth, c["bvh_depth0"])

        miss = active & (hit.obj < 0)
        if aovs:
            final_depth = jnp.where(miss, depth, final_depth)
        active = active & ~miss

        pos, normal, mat_idx = hit_surface(dev, hit, ray_o, ray_d)
        mat = _gather_material(dev, mat_idx)

        # light hit: add only for primary/specular when NEE on (Main.cpp:424-431)
        hit_light = active & mat["is_light"]
        add_emission = (
            hit_light
            if not settings.next_event_estimation
            else hit_light & ((depth == 0) | is_specular)
        )
        energy = energy + jnp.where(
            add_emission[:, None],
            throughput * mat["emissive"] * mat["intensity"][:, None],
            0.0,
        )
        if aovs:
            final_depth = jnp.where(hit_light, depth, final_depth)
        active = active & ~hit_light

        brdf_diffuse = mat["albedo"] * INV_PI
        diffuse_weight = jnp.maximum(
            0.0, 1.0 - mat["specular"] - mat["refractivity"]
        )

        # ---- next-event estimation (Main.cpp:439-465) ----
        if nee:
            do_nee = active & (diffuse_weight > 0.001)
            state, ls = sample_light(dev, state, pos)
            ndotl = dot(normal, ls.to_light)
            nldotl = dot(ls.normal, -ls.to_light)
            facing = (ndotl > 0.0) & (nldotl > 0.0)
            shadow_needed = do_nee & facing
            traced = traced + jnp.sum(shadow_needed, dtype=jnp.int32)
            sh = intersect_scene(
                dev,
                (
                    pos[:, 0] + ls.to_light[:, 0] * RAY_NUDGE,
                    pos[:, 1] + ls.to_light[:, 1] * RAY_NUDGE,
                    pos[:, 2] + ls.to_light[:, 2] * RAY_NUDGE,
                ),
                (ls.to_light[:, 0], ls.to_light[:, 1], ls.to_light[:, 2]),
                ls.distance - 2.0 * RAY_NUDGE,
                any_hit=True,
                active=shadow_needed,
                count_depth=False,  # occlusion only: no AOV consumer
            )
            occluded = sh.obj >= 0
            solid_angle = (nldotl * ls.area) / jnp.maximum(
                ls.distance * ls.distance, 1e-20
            )
            contrib = (
                throughput
                * (ndotl * solid_angle)[:, None]
                * brdf_diffuse
                * ls.emission
                * f32(dev.num_lights)
                * diffuse_weight[:, None]
            )
            energy = energy + jnp.where(
                (shadow_needed & ~occluded)[:, None], contrib, 0.0
            )

        # ---- Russian roulette (Main.cpp:468-475) ----
        if settings.russian_roulette:
            survival = sampling.survival_probability_rr(mat["albedo"])
            state, r_rr = rnglib.next_f32(state)
            die = active & (survival < r_rr)
            if aovs:
                final_depth = jnp.where(die, depth, final_depth)
            active = active & ~die
            throughput = jnp.where(
                active[:, None], throughput / survival[:, None], throughput
            )

        # ---- lobe selection (Main.cpp:478-570) ----
        state, r_lobe = rnglib.next_f32(state)
        sel_spec = active & (r_lobe < mat["specular"])
        sel_diel = active & ~sel_spec & (
            r_lobe < mat["specular"] + mat["refractivity"]
        )
        sel_diff = active & ~sel_spec & ~sel_diel

        spec_dir = sampling.reflect(ray_d, normal)
        tir, inside, refract_dir, fr = _dielectric(ray_d, normal, mat)
        state, r_fr = rnglib.next_f32(state)
        choose_refract = r_fr > fr
        state, diff_dir, _ndotr, diff_weight = _diffuse_bounce(state, normal, settings)

        # Beer's-law absorption on medium exit (Main.cpp:524-532)
        beer = jnp.exp(-mat["absorption"] * hit.t[:, None])

        diel_bounce = sel_diel & ~tir
        diel_refract = diel_bounce & choose_refract
        diel_reflect = diel_bounce & ~choose_refract

        new_dir = ray_d
        new_dir = jnp.where(sel_spec[:, None] | diel_reflect[:, None], spec_dir, new_dir)
        new_dir = jnp.where(diel_refract[:, None], refract_dir, new_dir)
        new_dir = jnp.where(sel_diff[:, None], diff_dir, new_dir)

        tp_mult = jnp.ones((n, 3), f32)
        tp_mult = jnp.where(
            (sel_spec | diel_reflect | diel_refract)[:, None], mat["albedo"], tp_mult
        )
        tp_mult = jnp.where(
            (diel_refract & inside)[:, None], mat["albedo"] * beer, tp_mult
        )
        # throughput *= (NdotR / pdf) * brdf_diffuse (Main.cpp:568)
        tp_mult = jnp.where(
            sel_diff[:, None], diff_weight[:, None] * brdf_diffuse, tp_mult
        )
        throughput = throughput * tp_mult

        bounced = sel_spec | diel_bounce | sel_diff
        # componentwise ray update keeps the carry 1-D end-to-end
        # TIR lanes (sel_diel & tir) keep the old ray and stay active,
        # re-tracing the same segment -- the reference's exact fallthrough.
        is_specular = jnp.where(sel_spec | diel_bounce, True, is_specular)
        is_specular = jnp.where(sel_diff, False, is_specular)

        nc = dict(
            throughput=throughput,
            energy=energy,
            active=active.astype(jnp.int32),
            is_specular=is_specular.astype(jnp.int32),
            ray_ox=jnp.where(bounced, pos[:, 0] + new_dir[:, 0] * RAY_NUDGE, ro_c[0]),
            ray_oy=jnp.where(bounced, pos[:, 1] + new_dir[:, 1] * RAY_NUDGE, ro_c[1]),
            ray_oz=jnp.where(bounced, pos[:, 2] + new_dir[:, 2] * RAY_NUDGE, ro_c[2]),
            ray_dx=jnp.where(bounced, new_dir[:, 0], rd_c[0]),
            ray_dy=jnp.where(bounced, new_dir[:, 1], rd_c[1]),
            ray_dz=jnp.where(bounced, new_dir[:, 2], rd_c[2]),
            state=state,
            traced=traced,
        )
        if aovs:
            nc["final_depth"] = final_depth
            nc["bvh_depth0"] = bvh_depth0
        if do_sort:
            nc["lane"] = c["lane"]
            nc = sort_wavefront(dev, nc, idx.astype(jnp.int32), aovs=aovs)
        return nc, None

    carry, _ = jax.lax.scan(
        body, carry, jnp.arange(settings.max_ray_depth + 1, dtype=jnp.int32)
    )
    energy, active = carry["energy"], carry["active"] != 0
    state = carry["state"]
    if aovs:
        final_depth = jnp.where(
            active, settings.max_ray_depth + 1, carry["final_depth"]
        )
        bvh_depth0 = carry["bvh_depth0"]
    else:
        final_depth = bvh_depth0 = jnp.zeros((n,), jnp.int32)
    if do_sort:
        cols = [energy[:, 0], energy[:, 1], energy[:, 2], state]
        if aovs:
            cols += [final_depth, bvh_depth0]
        cols = restore_lane_order(carry["lane"], idx.astype(jnp.int32), cols)
        e0, e1, e2, state = cols[:4]
        if aovs:
            final_depth, bvh_depth0 = cols[4], cols[5]
        energy = jnp.stack([e0, e1, e2], axis=1)
    if settings.debug_render_mode == DebugRenderMode.RAY_DEPTH:
        # energy OVERWRITE (Main.cpp:575-576)
        energy = lerp(
            _GREEN,
            _RED,
            (final_depth.astype(f32) / f32(settings.max_ray_depth))[:, None],
        )
    return state, TraceResult(
        energy, carry["traced"], final_depth, bvh_depth0
    )


def trace_advanced_mega(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
    frame_stack=None,
    cond_push=None,
    rowx=None,
) -> tuple[jnp.ndarray, TraceResult]:
    """TracePathAdvanced via the fused per-depth megakernels
    (ops/megakernel.py): per depth, ONE closest-hit+shading launch and
    ONE shadow+resolve launch replace the whole XLA shading body, and
    both launches skip all-dead 1024-lane sub-tiles, so depth cost
    scales with surviving lanes.  Semantics identical to trace_advanced
    (same RNG draws, predicates, and epsilons, asserted bitwise in
    interpret mode by tests/test_megakernel.py); gate via
    scene.megakernel_active.  AOVs are not tracked (returned as zeros).
    """
    from cpugpupathtracing_tpu.ops import megakernel as mk

    n = origin.shape[0]
    f32 = jnp.float32
    nee = settings.next_event_estimation and dev.num_lights > 0
    interpret = jax.default_backend() != "tpu"
    do_sort = idx is not None
    num_sph = int(dev.sph_center.shape[0])
    num_pln = int(dev.pln_point.shape[0])
    # flattened instanced scenes (scene.DeviceScene.packet_flattened)
    # run the PLAIN kernels: tables are world-space already
    instanced = dev.num_instances > 0 and not dev.packet_flattened
    mk_nodes, mk_ltris, fused_nn, mk_ents = packet_tables(dev)
    mk_roots = dev.proots
    mk_width = dev.packet_width
    if instanced:
        mk_ents = None
    pay_kw = {}
    if dev.poccl_pay is not None and not instanced:
        # CPUGPU_LEAF14: the closest-hit traversal runs the leaf-14
        # tables with the parallel payload rows (hits exact; -14%
        # bounce / -22% interior iterations offline)
        mk_nodes, mk_ltris = dev.poccl_nodes, dev.poccl_ltris
        mk_ents = dev.poccl_ents
        if dev.smem_small:
            # small trees keep side tables off per-launch kernels
            # (see packet_tables' whole_frame policy)
            mk_ents = None
        elif dev.poccl_nodes48 is not None:
            mk_nodes = dev.poccl_nodes48
        mk_roots, mk_width, fused_nn = dev.poccl_roots, 8, 0
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
        interpret=interpret,
        frame_stack=frame_stack,
        cond_push=cond_push,
        fused_nn=fused_nn,
        width=mk_width,
        rowx=rowx,
        ents=mk_ents,
        light_tri_meta=dev.light_tri_meta,
        **pay_kw,
    )
    if instanced:
        static.update(
            inst_inv=dev.inst_inv,
            inst_nrm=dev.inst_nrm,
            inst_root=dev.inst_blas_root_packet,
        )

    # throughput/energy ride as six SEPARATE (N,) columns, never a
    # stacked (N, 3): the per-depth stack + column-slice pairs at the
    # pallas/sort boundaries are exactly the (N, k) layout trap
    # (CLAUDE.md round-2 findings) -- the kernels consume and produce
    # columns anyway, and sort_wavefront sorts 1-D entries natively.
    one = jnp.ones((n,), f32)
    zero = jnp.zeros((n,), f32)
    carry = dict(
        tp_x=one, tp_y=one, tp_z=one,
        en_x=zero, en_y=zero, en_z=zero,
        active=jnp.ones((n,), jnp.int32),
        is_specular=jnp.zeros((n,), jnp.int32),
        ray_ox=origin[:, 0], ray_oy=origin[:, 1], ray_oz=origin[:, 2],
        ray_dx=direction[:, 0], ray_dy=direction[:, 1], ray_dz=direction[:, 2],
        state=state,
        traced=jnp.zeros((), jnp.int32),
    )
    if do_sort:
        carry["lane"] = idx.astype(jnp.int32)

    # Opt-in only: tools/fan_lab.py measured the depth-0 shadow fan's
    # iteration count INSENSITIVE to every candidate sort key (~241k
    # iterations sorted or not -- camera-blocked order already carries
    # the locality), so the two extra sorts don't pay by default.
    # Read once per trace (compile time): set before first compile.
    shadow_sort_depths = (
        {0} if do_sort and os.environ.get("CPUGPU_SHADOW_SORT") == "1"
        else set()
    )

    def body(c, depth, d, sort_now):
        flags = c["active"] | (c["is_specular"] << 1)
        traced = c["traced"] + jnp.sum(c["active"], dtype=jnp.int32)
        rays, state2, tp, en, flags2, so, sd, stmax, contrib = mk.shade_extend(
            mk_nodes, mk_ltris, dev.mk_mats, dev.mk_lights,
            dev.mk_light_tris,
            dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
            dev.mk_objmat,
            depth[None],
            (c["ray_ox"], c["ray_oy"], c["ray_oz"],
             c["ray_dx"], c["ray_dy"], c["ray_dz"]),
            c["state"],
            (c["tp_x"], c["tp_y"], c["tp_z"]),
            (c["en_x"], c["en_y"], c["en_z"]),
            flags,
            **static,
        )
        if nee:
            sneed = (flags2 >> 2) & 1
            traced = traced + jnp.sum(sneed, dtype=jnp.int32)
            occl = occl_tables(dev)
            if occl is not None:
                # occlusion-specialized tables (bvh8.to_slim_occl):
                # shallower fat-leaf any-hit tree, bitwise-identical
                # occluded bit -> bitwise-identical energy
                sh_nodes, sh_ltris, sh_roots, sh_ents = occl
                shadow_static = dict(
                    roots=sh_roots, num_sph=num_sph, num_pln=num_pln,
                    interpret=interpret, frame_stack=frame_stack,
                    cond_push=cond_push, fused_nn=0,
                    width=dev.poccl_width, occl=True,
                    rowx=rowx, ents=sh_ents,
                    occl_rows=2 if PACKET_OCCL2 else 1,
                )
            else:
                sh_nodes, sh_ltris = mk_nodes, mk_ltris
                shadow_static = dict(
                    roots=mk_roots, num_sph=num_sph, num_pln=num_pln,
                    interpret=interpret, frame_stack=frame_stack,
                    cond_push=cond_push, fused_nn=fused_nn,
                    width=mk_width, rowx=rowx, ents=mk_ents,
                )
                if instanced:
                    shadow_static.update(
                        inst_inv=dev.inst_inv,
                        inst_root=dev.inst_blas_root_packet,
                    )
            if d in shadow_sort_depths:
                en = sorted_shadow_resolve(
                    dev, mk, so, sd, stmax, flags2, en, contrib,
                    idx.astype(jnp.int32), static=shadow_static,
                    tables=(sh_nodes, sh_ltris),
                )
            else:
                en = mk.shadow_resolve(
                    sh_nodes, sh_ltris, dev.mk_sph, dev.mk_pln,
                    so, sd, stmax, flags2, en, contrib,
                    **shadow_static,
                )
        nc = dict(
            tp_x=tp[0], tp_y=tp[1], tp_z=tp[2],
            en_x=en[0], en_y=en[1], en_z=en[2],
            active=flags2 & 1,
            is_specular=(flags2 >> 1) & 1,
            ray_ox=rays[0], ray_oy=rays[1], ray_oz=rays[2],
            ray_dx=rays[3], ray_dy=rays[4], ray_dz=rays[5],
            state=state2,
            traced=traced,
        )
        if do_sort:
            nc["lane"] = c["lane"]
            if sort_now:
                # end-of-depth-0 feeds the (still pixel-coherent) bounce
                # fan: compact only.  Later boundaries feed scattered
                # glass-interior fans: morton regroup at 8 bits/axis.
                # Measured schedule, tools/fan_lab.py + profile_mega_census.
                nc = sort_wavefront(
                    dev, nc, idx.astype(jnp.int32), aovs=False,
                    mode="compact" if d == 0 else "morton8",
                )
        return nc

    def sort_boundary(d):
        # sort only the first N depth boundaries (default 3): beyond
        # that the surviving fans are tiny and the stale morton order
        # costs fewer extra kernel iterations (+26k on the benchmark
        # census) than more ~21 ms full-wavefront sorts.  Image
        # bitwise-invariant (restore sorts return lane order), so the
        # boundary is a pure perf knob: CPUGPU_SORT_DEPTHS, read at
        # trace time like CPUGPU_SHADOW_SORT.
        nd = int(os.environ.get("CPUGPU_SORT_DEPTHS") or "3")
        return d < min(nd, settings.max_ray_depth)

    # Python-unrolled depth loop (the two Pallas kernels dominate compile
    # time and are shared across depths): unlike the scan in
    # trace_advanced, this drops the pointless LAST sort (nothing
    # consumes the final ordering) -- bitwise identical, one sort fewer.
    for d in range(settings.max_ray_depth + 1):
        carry = body(
            carry,
            jnp.int32(d),
            d,
            sort_now=sort_boundary(d),
        )
    e_cols = [carry["en_x"], carry["en_y"], carry["en_z"]]
    state = carry["state"]
    if do_sort:
        cols = restore_lane_order(
            carry["lane"], idx.astype(jnp.int32), e_cols + [state],
        )
        e_cols, state = cols[:3], cols[3]
    energy = jnp.stack(e_cols, axis=1)
    zeros = jnp.zeros((n,), jnp.int32)
    return state, TraceResult(energy, carry["traced"], zeros, zeros)


def trace_advanced_frame(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
) -> tuple[jnp.ndarray, TraceResult]:
    """TracePathAdvanced via the whole-frame Pallas kernel
    (ops/pt_frame_kernel.py): every depth, the packet BVH traversal,
    the shading body, and the NEE shadow resolve run inside ONE launch
    with rays resident in registers -- no per-depth HBM carries, sorts,
    or dispatches.  Per-lane energy/state/traced are bitwise equal to
    the unsorted megakernel path in interpret mode
    (tests/test_pt_frame.py); gate via scene.pt_frame_active.  `idx`
    is unused (no wavefront sorting -- the gate limits this path to
    trees small enough that unsorted fans stay cheap).  AOVs are not
    tracked (returned as zeros)."""
    from cpugpupathtracing_tpu.ops import pt_frame_kernel as pfk

    n = origin.shape[0]
    nee = settings.next_event_estimation and dev.num_lights > 0
    interpret = jax.default_backend() != "tpu"
    mk_nodes, mk_ltris, fused_nn, mk_ents = packet_tables(
        dev, whole_frame=True)
    occl = occl_tables(dev, whole_frame=True)
    kw = {}
    if occl is not None:
        sh_nodes, sh_ltris, sh_roots, sh_ents = occl
        kw = dict(
            sh_nodes=sh_nodes, sh_ltris=sh_ltris, sh_roots=sh_roots,
            sh_ents=sh_ents, occl=True,
            occl_rows=2 if PACKET_OCCL2 else 1,
        )
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
        interpret=interpret,
        fused_nn=fused_nn,
        width=dev.packet_width,
        ents=mk_ents,
        light_tri_meta=dev.light_tri_meta,
        **kw,
    )
    tables = (
        mk_nodes, mk_ltris, dev.mk_mats, dev.mk_lights,
        dev.mk_light_tris,
        dev.mk_sph, dev.mk_pln, dev.mk_sph_mat, dev.mk_pln_mat,
        dev.mk_objmat,
    )
    rays_c = (origin[:, 0], origin[:, 1], origin[:, 2],
              direction[:, 0], direction[:, 1], direction[:, 2])
    depths = settings.max_ray_depth + 1
    # Split-span schedule (read at trace time): run depths [0, K) in
    # one span, ONE morton8 wavefront sort, then depths [K, end) in a
    # second span -- the early-exit while skips whole sorted-dead tiles,
    # buying the per-depth pipeline's compaction at 1/depths the sort
    # count.  Per-lane energy/traced identical to the single span
    # (sorting permutes, restore returns; tests pin it).  K=2 is the
    # measured default (config-2 sweep: unsplit 25.6, K=1 26.3,
    # K=2 31.5, K=3 26.5 Mrays/s -- depths 0-1 ride the camera-blocked
    # pixel order, the sort lands exactly where the fan scatters,
    # matching the fan-lab key schedule).  CPUGPU_PTFRAME_SPLIT
    # overrides; 0 disables.
    split_env = os.environ.get("CPUGPU_PTFRAME_SPLIT")
    split = int(split_env) if split_env else (2 if depths > 3 else 0)
    zeros = jnp.zeros((n,), jnp.int32)
    unsplit_max = int(os.environ.get("CPUGPU_PTFRAME_MAX_NODES") or "2048")
    if (idx is None and 0 < split < depths
            and int(dev.pnodes.shape[0]) > unsplit_max):
        # the gate admitted this tree on the SPLIT schedule's economics;
        # without lane identities no sort can run, and the unsplit
        # whole-frame kernel measured a loss on big incoherent trees --
        # delegate to the per-depth pipeline instead
        return trace_advanced_mega(dev, settings, origin, direction,
                                   state, idx=None)
    if idx is not None and 0 < split < depths:
        rays2, st2, tp2, en2, fl2, tr1 = pfk.pt_frame(
            *tables, rays_c, state,
            depths=split, carry_out=True, **static,
        )
        c = dict(
            ray_ox=rays2[0], ray_oy=rays2[1], ray_oz=rays2[2],
            ray_dx=rays2[3], ray_dy=rays2[4], ray_dz=rays2[5],
            state=st2,
            tp_x=tp2[0], tp_y=tp2[1], tp_z=tp2[2],
            en_x=en2[0], en_y=en2[1], en_z=en2[2],
            active=fl2 & 1,
            is_specular=(fl2 >> 1) & 1,
            lane=idx.astype(jnp.int32),
        )
        c = sort_wavefront(
            dev, c, idx.astype(jnp.int32), aovs=False, mode="morton8"
        )
        energy3, st3, traced2 = pfk.pt_frame(
            *tables,
            (c["ray_ox"], c["ray_oy"], c["ray_oz"],
             c["ray_dx"], c["ray_dy"], c["ray_dz"]),
            c["state"],
            depths=depths - split, depth_base=split,
            carry_in=(
                (c["tp_x"], c["tp_y"], c["tp_z"]),
                (c["en_x"], c["en_y"], c["en_z"]),
                c["active"] | (c["is_specular"] << 1),
            ),
            **static,
        )
        cols = restore_lane_order(
            c["lane"], idx.astype(jnp.int32),
            [energy3[:, 0], energy3[:, 1], energy3[:, 2], st3],
        )
        energy = jnp.stack(cols[:3], axis=1)
        return cols[3], TraceResult(energy, tr1 + traced2, zeros, zeros)

    energy, state, traced = pfk.pt_frame(
        *tables, rays_c, state, depths=depths, **static,
    )
    return state, TraceResult(energy, traced, zeros, zeros)


def trace_brute(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
) -> tuple[jnp.ndarray, TraceResult]:
    """TracePath (Source/Main.cpp:581-689): brute-force path tracing.
    The recursion is a linear chain, unrolled to throughput form; the
    depth loop is a lax.scan.  `idx` enables once-per-depth wavefront
    sorting (see trace_advanced).  Returns (rng_state, TraceResult)."""
    n = origin.shape[0]
    f32 = jnp.float32
    if settings.debug_render_mode == DebugRenderMode.BVH_DEPTH:
        return _debug_bvh_result(dev, origin, direction, state, n)
    aovs = settings.aovs_active
    do_sort = (
        idx is not None
        and settings.max_ray_depth + 1 <= 0xFF  # fits sort_wavefront's fold
        and packet_path_active(dev)
    )

    carry = dict(
        throughput=jnp.ones((n, 3), f32),
        energy=jnp.zeros((n, 3), f32),
        active=jnp.ones((n,), jnp.int32),
        ray_ox=origin[:, 0], ray_oy=origin[:, 1], ray_oz=origin[:, 2],
        ray_dx=direction[:, 0], ray_dy=direction[:, 1], ray_dz=direction[:, 2],
        state=state,
        traced=jnp.zeros((), jnp.int32),
    )
    if aovs:
        carry["final_depth"] = jnp.zeros((n,), jnp.int32)
        carry["bvh_depth0"] = jnp.zeros((n,), jnp.int32)
    if do_sort:
        carry["lane"] = idx.astype(jnp.int32)

    def body(c, depth):
        state = c["state"]
        active, throughput, energy = c["active"] != 0, c["throughput"], c["energy"]
        final_depth = c["final_depth"] if aovs else None
        ro_c = (c["ray_ox"], c["ray_oy"], c["ray_oz"])
        rd_c = (c["ray_dx"], c["ray_dy"], c["ray_dz"])
        ray_o = jnp.stack(ro_c, axis=1)
        ray_d = jnp.stack(rd_c, axis=1)

        traced = c["traced"] + jnp.sum(active, dtype=jnp.int32)
        hit = intersect_scene(
            dev, ro_c, rd_c, jnp.full((n,), RAY_TMAX, f32), active=active,
            count_depth=aovs,
        )
        if aovs:
            bvh_depth0 = jnp.where(depth == 0, hit.bvh_depth, c["bvh_depth0"])

        miss = active & (hit.obj < 0)
        if aovs:
            final_depth = jnp.where(miss, depth, final_depth)
        active = active & ~miss

        pos, normal, mat_idx = hit_surface(dev, hit, ray_o, ray_d)
        mat = _gather_material(dev, mat_idx)

        # light hit always returns its emission (Main.cpp:606-609)
        hit_light = active & mat["is_light"]
        energy = energy + jnp.where(
            hit_light[:, None],
            throughput * mat["emissive"] * mat["intensity"][:, None],
            0.0,
        )
        if aovs:
            final_depth = jnp.where(hit_light, depth, final_depth)
        active = active & ~hit_light

        state, r_lobe = rnglib.next_f32(state)
        sel_spec = active & (r_lobe < mat["specular"])
        sel_diel = active & ~sel_spec & (
            r_lobe < mat["specular"] + mat["refractivity"]
        )
        sel_diff = active & ~sel_spec & ~sel_diel

        spec_dir = sampling.reflect(ray_d, normal)
        tir, inside, refract_dir, fr = _dielectric(ray_d, normal, mat)
        state, r_fr = rnglib.next_f32(state)
        choose_refract = r_fr > fr
        # brute force always samples the hemisphere uniformly (Main.cpp:679)
        state, diff_dir = sampling.uniform_hemisphere(state, normal)
        cosi = dot(diff_dir, normal)

        beer = jnp.exp(-mat["absorption"] * hit.t[:, None])

        # TIR kills the path here (k<0 leaves final_color black, Main.cpp:645)
        diel_dead = sel_diel & tir
        if aovs:
            final_depth = jnp.where(diel_dead, depth, final_depth)
        diel_refract = sel_diel & ~tir & choose_refract
        diel_reflect = sel_diel & ~tir & ~choose_refract

        new_dir = ray_d
        new_dir = jnp.where(sel_spec[:, None] | diel_reflect[:, None], spec_dir, new_dir)
        new_dir = jnp.where(diel_refract[:, None], refract_dir, new_dir)
        new_dir = jnp.where(sel_diff[:, None], diff_dir, new_dir)

        tp_mult = jnp.ones((n, 3), f32)
        tp_mult = jnp.where(
            (sel_spec | diel_reflect | diel_refract)[:, None], mat["albedo"], tp_mult
        )
        tp_mult = jnp.where(
            (diel_refract & inside)[:, None], mat["albedo"] * beer, tp_mult
        )
        # 2*pi * (albedo/pi) * cos = 2 * albedo * cos (Main.cpp:679-685)
        tp_mult = jnp.where(
            sel_diff[:, None], 2.0 * mat["albedo"] * cosi[:, None], tp_mult
        )
        throughput = throughput * tp_mult

        active = active & ~diel_dead
        bounced = sel_spec | diel_refract | diel_reflect | sel_diff

        nc = dict(
            throughput=throughput,
            energy=energy,
            active=active.astype(jnp.int32),
            ray_ox=jnp.where(bounced, pos[:, 0] + new_dir[:, 0] * RAY_NUDGE, ro_c[0]),
            ray_oy=jnp.where(bounced, pos[:, 1] + new_dir[:, 1] * RAY_NUDGE, ro_c[1]),
            ray_oz=jnp.where(bounced, pos[:, 2] + new_dir[:, 2] * RAY_NUDGE, ro_c[2]),
            ray_dx=jnp.where(bounced, new_dir[:, 0], rd_c[0]),
            ray_dy=jnp.where(bounced, new_dir[:, 1], rd_c[1]),
            ray_dz=jnp.where(bounced, new_dir[:, 2], rd_c[2]),
            state=state,
            traced=traced,
        )
        if aovs:
            nc["final_depth"] = final_depth
            nc["bvh_depth0"] = bvh_depth0
        if do_sort:
            nc["lane"] = c["lane"]
            nc = sort_wavefront(dev, nc, idx.astype(jnp.int32), aovs=aovs)
        return nc, None

    carry, _ = jax.lax.scan(
        body, carry, jnp.arange(settings.max_ray_depth + 1, dtype=jnp.int32)
    )
    energy, state = carry["energy"], carry["state"]
    if aovs:
        final_depth = jnp.where(
            carry["active"] != 0, settings.max_ray_depth + 1, carry["final_depth"]
        )
        bvh_depth0 = carry["bvh_depth0"]
    else:
        final_depth = bvh_depth0 = jnp.zeros((n,), jnp.int32)
    if do_sort:
        cols = [energy[:, 0], energy[:, 1], energy[:, 2], state]
        if aovs:
            cols += [final_depth, bvh_depth0]
        cols = restore_lane_order(carry["lane"], idx.astype(jnp.int32), cols)
        e0, e1, e2, state = cols[:4]
        if aovs:
            final_depth, bvh_depth0 = cols[4], cols[5]
        energy = jnp.stack([e0, e1, e2], axis=1)
    return state, TraceResult(
        energy, carry["traced"], final_depth, bvh_depth0
    )
