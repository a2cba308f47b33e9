"""Whitted-style raytracer.

The reference's *previous project phase* (README.md:41-52, "Finished" but
absent from the current source tree): direct illumination of diffuse
surfaces from point lights with distance attenuation, hard shadows via
shadow rays, recursive pure-specular reflection, and dielectrics with
Fresnel; depth-capped.  Reconstructed here from that feature list with
the current tree's ingredients (Reflect/Refract/Fresnel, Beer absorption).

Semantics per vertex (lane-masked wavefront, like the path tracers):

  energy += throughput * diffuse_weight * albedo
            * sum_over_lights( vis * max(N.L, 0) * intensity / d^2 )

with each scene light treated as a point light at its center.  The ray
then continues as a dielectric (stochastic Fresnel branch choice between
refraction and reflection -- unbiased under progressive accumulation,
where classic Whitted would fork the tree) when refractivity > 0, else
as a mirror when specular > 0, else terminates.  Beer's-law absorption
applies on medium exit, as in the path tracers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpugpupathtracing_tpu.config import DebugRenderMode, RenderSettings
from cpugpupathtracing_tpu.models.integrators import (
    TraceResult,
    _dielectric,
    _gather_material,
    _GREEN,
    _RED,
    restore_lane_order,
    sort_wavefront,
)
from cpugpupathtracing_tpu.models.scene import (
    DeviceScene,
    hit_surface,
    intersect_scene,
    packet_path_active,
)
from cpugpupathtracing_tpu.ops import sampling
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_NUDGE, RAY_TMAX, dot, length, lerp

# per-light shadow loop unrolls statically up to this many lights;
# beyond it the fans batch into one (L*N) any-hit traversal (same
# image bitwise -- accumulation order is per-light sequential in both)
_UNROLL_MAX_LIGHTS = 4


def trace_whitted(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
):
    """Whitted trace over a lane batch. Returns (rng_state, TraceResult).

    Every light acts as a POINT light: spheres at their center (the
    shadow ray stops at the surface radius so the light sphere does not
    occlude itself), mesh lights at their area-weighted surface
    centroid with radius 0 (scene.py light build).  Up to 4 lights the
    per-light loop unrolls statically; beyond that the shadow fans
    batch into ONE (L*N)-wide any-hit traversal so code size and launch
    count stay constant in the light count."""
    n = origin.shape[0]
    f32 = jnp.float32
    if settings.debug_render_mode == DebugRenderMode.BVH_DEPTH:
        from cpugpupathtracing_tpu.models.integrators import _debug_bvh_result

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

    # point-light positions: light object centers (spheres) and
    # mesh-light triangle-range centroids are not defined; restrict to
    # sphere lights, which both default scenes use.
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

        hit_light = active & mat["is_light"]
        energy = energy + jnp.where(
            hit_light[:, None],
            throughput * mat["emissive"] * mat["intensity"][:, None],
            0.0,
        )
        if aovs:
            final_depth = jnp.where(hit_light, depth, final_depth)
        active = active & ~hit_light

        diffuse_weight = jnp.maximum(0.0, 1.0 - mat["specular"] - mat["refractivity"])

        # direct lighting: every light as a point light, hard shadows
        direct = jnp.zeros((n, 3), f32)
        L = dev.num_lights

        def light_geom(li):
            lpos = dev.light_sph_center[li]
            to_l = lpos[None, :] - pos
            dist = length(to_l)
            to_l = to_l / jnp.maximum(dist[:, None], 1e-20)
            ndotl = dot(normal, to_l)
            want = active & (diffuse_weight > 0.0) & (ndotl > 0.0)
            # the "point" light is physically a small sphere in the
            # scene; stop the shadow ray at its surface so it does not
            # occlude its own light (mesh-light proxies have radius 0)
            shadow_tmax = dist - dev.light_sph_radius[li] - 2.0 * RAY_NUDGE
            return to_l, dist, ndotl, want, shadow_tmax

        def accumulate(li, vis, dist, ndotl, direct):
            lmat = _gather_material(
                dev, dev.obj_mat[dev.light_obj[li]][None].repeat(1)
            )
            emission = lmat["emissive"][0] * lmat["intensity"][0]
            atten = 1.0 / jnp.maximum(dist * dist, 1e-20)
            return direct + jnp.where(
                vis[:, None], (ndotl * atten)[:, None] * emission[None, :], 0.0
            )

        if L <= _UNROLL_MAX_LIGHTS:
            for li in range(L):
                to_l, dist, ndotl, want, shadow_tmax = light_geom(li)
                traced = traced + jnp.sum(want, dtype=jnp.int32)
                sh = intersect_scene(
                    dev,
                    (
                        pos[:, 0] + to_l[:, 0] * RAY_NUDGE,
                        pos[:, 1] + to_l[:, 1] * RAY_NUDGE,
                        pos[:, 2] + to_l[:, 2] * RAY_NUDGE,
                    ),
                    (to_l[:, 0], to_l[:, 1], to_l[:, 2]),
                    shadow_tmax,
                    any_hit=True,
                    active=want,
                    count_depth=False,  # occlusion only: no AOV consumer
                )
                vis = want & (sh.obj < 0)
                direct = accumulate(li, vis, dist, ndotl, direct)
        else:
            # many lights: ONE batched (L*N) any-hit traversal; the
            # per-light accumulation stays a sequential loop so the
            # energy sum order (and hence the image) is bitwise
            # identical to the unrolled form
            geoms = [light_geom(li) for li in range(L)]
            for _, _, _, want_l, _ in geoms:
                traced = traced + jnp.sum(want_l, dtype=jnp.int32)
            so = jnp.concatenate(
                [
                    jnp.stack(
                        [
                            pos[:, 0] + g[0][:, 0] * RAY_NUDGE,
                            pos[:, 1] + g[0][:, 1] * RAY_NUDGE,
                            pos[:, 2] + g[0][:, 2] * RAY_NUDGE,
                        ],
                        axis=1,
                    )
                    for g in geoms
                ]
            )
            sd = jnp.concatenate([g[0] for g in geoms])
            stm = jnp.concatenate([g[4] for g in geoms])
            sact = jnp.concatenate([g[3] for g in geoms])
            sh = intersect_scene(
                dev, so, sd, stm, any_hit=True, active=sact,
                count_depth=False,
            )
            occ = (sh.obj < 0).reshape(L, n)
            for li, (to_l, dist, ndotl, want, _) in enumerate(geoms):
                vis = want & occ[li]
                direct = accumulate(li, vis, dist, ndotl, direct)
        energy = energy + jnp.where(
            active[:, None],
            throughput * diffuse_weight[:, None] * mat["albedo"] * direct,
            0.0,
        )

        # continuation: dielectric first, else mirror, else terminate
        tir, inside, refract_dir, fr = _dielectric(ray_d, normal, mat)
        state, r_fr = rnglib.next_f32(state)
        choose_refract = r_fr > fr
        spec_dir = sampling.reflect(ray_d, normal)
        beer = jnp.exp(-mat["absorption"] * hit.t[:, None])

        cont_diel = active & (mat["refractivity"] > 0.0) & ~tir
        diel_refract = cont_diel & choose_refract
        diel_reflect = cont_diel & ~choose_refract
        cont_spec = active & ~(mat["refractivity"] > 0.0) & (mat["specular"] > 0.0)
        die = active & ~cont_diel & ~cont_spec & ~(active & (mat["refractivity"] > 0.0) & tir)
        # TIR on a refractive surface reflects
        tir_reflect = active & (mat["refractivity"] > 0.0) & tir

        new_dir = ray_d
        new_dir = jnp.where(
            (cont_spec | diel_reflect | tir_reflect)[:, None], spec_dir, new_dir
        )
        new_dir = jnp.where(diel_refract[:, None], refract_dir, new_dir)

        tp_mult = jnp.ones((n, 3), f32)
        tp_mult = jnp.where(
            (diel_refract | diel_reflect | tir_reflect)[:, None],
            mat["refractivity"][:, None] * mat["albedo"],
            tp_mult,
        )
        tp_mult = jnp.where(
            (diel_refract & inside)[:, None],
            mat["refractivity"][:, None] * mat["albedo"] * beer,
            tp_mult,
        )
        tp_mult = jnp.where(
            cont_spec[:, None], mat["specular"][:, None] * mat["albedo"], tp_mult
        )
        throughput = throughput * tp_mult

        if aovs:
            final_depth = jnp.where(die, depth, final_depth)
        active = active & ~die
        bounced = cont_spec | diel_refract | diel_reflect | tir_reflect

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
    if settings.debug_render_mode == DebugRenderMode.RAY_DEPTH:
        energy = lerp(
            _GREEN,
            _RED,
            (final_depth.astype(f32) / f32(settings.max_ray_depth))[:, None],
        )
    return state, TraceResult(
        energy, carry["traced"], final_depth, bvh_depth0
    )


def trace_whitted_kernel(
    dev: DeviceScene,
    settings: RenderSettings,
    origin,
    direction,
    state,
    idx=None,
):
    """trace_whitted via the whole-frame analytic Pallas kernel
    (ops/whitted_kernel.py): every depth, shadow test, and the
    dielectric/mirror continuation run inside ONE launch with rays
    resident in VMEM -- no HBM round trips between depths.  RNG state
    and traced match trace_whitted exactly; energy up to codegen FMA
    ulps + silhouette occlusion flips (tests/test_whitted_kernel pins
    the contract); gate via scene.whitted_kernel_active.  `idx` is
    unused (analytic scenes are not coherence-sorted)."""
    from cpugpupathtracing_tpu.ops import whitted_kernel as wk

    del idx
    n = origin.shape[0]
    energy, state, traced = wk.whitted_frame(
        dev.mk_mats, dev.mk_lights, dev.mk_sph, dev.mk_pln,
        dev.mk_sph_mat, dev.mk_pln_mat, dev.mk_objmat,
        (origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2]),
        state,
        num_mats=int(dev.mk_mats.shape[0]),
        num_lights=dev.num_lights,
        num_sph=int(dev.sph_center.shape[0]),
        num_pln=int(dev.pln_point.shape[0]),
        depths=settings.max_ray_depth + 1,
        interpret=jax.default_backend() != "tpu",
    )
    zeros = jnp.zeros((n,), jnp.int32)
    return state, TraceResult(energy, traced, zeros, zeros)


def make_whitted_scene():
    """Benchmark config 1 (BASELINE.md): spheres + plane, point lights,
    hard shadows."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models.scene import Scene

    s = Scene()
    red = s.add_material(matlib.Material.diffuse((0.8, 0.2, 0.2)))
    green = s.add_material(matlib.Material.diffuse((0.2, 0.8, 0.2)))
    mirror = s.add_material(matlib.Material.diffuse((0.95, 0.95, 0.95), specular=1.0))
    glass = s.add_material(
        matlib.Material.dielectric((1.0, 1.0, 1.0), 0.0, 1.0, (0.1, 0.1, 0.1), 1.5)
    )
    white = s.add_material(matlib.Material.diffuse((0.9, 0.9, 0.9)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 150.0))

    s.add_sphere("Red sphere", (-2.5, 0.0, 0.0), 1.0, red)
    s.add_sphere("Green sphere", (0.0, 0.0, -1.5), 1.0, green)
    s.add_sphere("Mirror sphere", (2.5, 0.0, 0.0), 1.0, mirror)
    s.add_sphere("Glass sphere", (0.8, -0.2, 1.5), 0.8, glass)
    s.add_plane("Floor", (0.0, -1.2, 0.0), (0.0, 1.0, 0.0), white)
    l0 = s.add_sphere("Point light0", (6.0, 8.0, 4.0), 0.2, light)
    s.mark_light(l0)
    l1 = s.add_sphere("Point light1", (-5.0, 6.0, -3.0), 0.2, light)
    s.mark_light(l1)
    return s
