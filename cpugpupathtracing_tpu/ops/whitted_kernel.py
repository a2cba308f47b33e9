"""Whole-frame Pallas kernel for the Whitted raytracer on analytic scenes.

Benchmark config 1 (spheres + plane + point lights, BASELINE.md) has no
BVH at all, yet the XLA wavefront loop still pays ~(max_depth+1) *
(1 closest-hit + L shadow) full-wavefront HBM round trips per frame:
every depth boundary materializes the ~14-column carry and every
analytic test re-reads the rays from HBM.  On the tunneled v5e that
skeleton floor measured 10.9 ms/frame at 800x600 (88 Mrays/s) -- within
reach of, but below, the 100 Mrays/s/chip target.

This kernel runs the ENTIRE Whitted trace -- every depth, the analytic
closest-hit loop, the per-light occlusion tests, the light-hit emission,
direct lighting, and the dielectric/mirror continuation -- inside ONE
Pallas launch.  Rays live in registers/VMEM for the whole frame: HBM
traffic collapses to one read of (origin, direction, rng state) and one
write of (energy, state, per-lane traced count) per lane.  Everything
in between is straight VPU vector code (there is no traversal loop and
no gather anywhere -- the scene is a handful of SMEM scalars).

Exactness: every predicate, epsilon, RNG draw (one per depth, as in
models/whitted.trace_whitted), and f32 association replicates the XLA
path op for op.  RNG state and the traced counter match trace_whitted
EXACTLY; energy matches up to codegen multiply-add fusion (the two
programs are shaped differently, so XLA:CPU/Mosaic may form different
FMAs), which shows up as last-ulp diffs plus rare occlusion flips on
shadow rays grazing an occluder silhouette (d2 ~ r^2), each worth one
light's attenuated contribution.  tests/test_whitted_kernel.py pins
that contract (same rationale as tests/test_megakernel.py).

Gating (scene.whitted_kernel_active): analytic-only scene (no
triangles, no instances), every light a sphere proxy, prim/light
counts within the static-unroll caps, AOVs off.

Reference parity: the Whitted phase feature list (reference
README.md:41-52) as reconstructed in models/whitted.py; shadow-ray
semantics per Source/Main.cpp:452-453, point-light attenuation per the
classic Whitted recipe the reference describes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpugpupathtracing_tpu.ops.megakernel import (
    L_CENTER,
    L_EMISSION,
    L_RADIUS,
    M_ABSORB,
    M_ALBEDO,
    M_EMISSIVE,
    M_INTENSITY,
    M_IOR,
    M_REFRACT,
    M_SPECULAR,
    PLANE_DENOM_EPS,
    RAY_NUDGE,
    RAY_TMAX,
    _analytic_tests,
    _select_mat_col,
    _u2f,
    _xs32,
)

# (64, 128) per grid step: 8 vregs per vector op gives the VPU
# instruction-level parallelism a (8, 128) single-vreg body lacks
# (every op would chain on the previous one's latency); the whole
# 15-array carry is still only ~0.5 MB of VMEM
BLOCK = 8192
ROWS = 64
LANES = 128


def _analytic_occluded(sph_ref, pln_ref, ox, oy, oz, dx, dy, dz, tmax,
                       num_sph, num_pln):
    """Any-hit over the analytic prims: does any valid hit land closer
    than tmax?  Matches models/scene.intersect_scene's nearest-hit loop
    exactly in EXISTENCE (occlusion is monotone in the shrinking t, so
    'any valid t < tmax' is bitwise the same predicate as 'obj >= 0'
    after the full loop)."""
    occ = jnp.zeros(ox.shape, jnp.int32)
    for s in range(num_sph):
        cx, cy, cz = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]
        rsq = sph_ref[s, 3]
        elx, ely, elz = cx - ox, cy - oy, cz - oz
        tca = elx * dx + ely * dy + elz * dz
        d2 = (elx * elx + ely * ely + elz * elz) - tca * tca
        thc = jnp.sqrt(jnp.maximum(rsq - d2, 0.0))
        t0 = tca - thc
        t1 = tca + thc
        ts = jnp.where(t0 < 0.0, t1, t0)
        vs = (tca >= 0.0) & (d2 <= rsq) & (ts >= 0.0)
        occ = occ | (vs & (ts < tmax)).astype(jnp.int32)
    for p in range(num_pln):
        nxp, nyp, nzp = pln_ref[p, 3], pln_ref[p, 4], pln_ref[p, 5]
        px, py, pz = pln_ref[p, 0], pln_ref[p, 1], pln_ref[p, 2]
        denom = dx * nxp + dy * nyp + dz * nzp
        den_ok = jnp.abs(denom) > PLANE_DENOM_EPS
        tp = ((px - ox) * nxp + (py - oy) * nyp + (pz - oz) * nzp) / (
            jnp.where(den_ok, denom, 1.0)
        )
        vp = den_ok & (tp > 0.0)
        occ = occ | (vp & (tp < tmax)).astype(jnp.int32)
    return occ != 0


def _whitted_kernel(
    mats_ref, lights_ref, sph_ref, pln_ref, sphmat_ref, plnmat_ref,
    objmat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, st_ref, act_ref,
    ex_ref, ey_ref, ez_ref, ost_ref, tr_ref,
    *, num_mats, num_lights, num_sph, num_pln, depths,
):
    shape = (ROWS, LANES)
    f32 = jnp.float32

    def body(_, c):
        (ox, oy, oz, dx, dy, dz, st, tpx, tpy, tpz, enx, eny, enz,
         act, tr) = c
        act_b = act != 0
        # traced += active at depth start (trace_whitted body line 1)
        tr = tr + act

        t = jnp.full(shape, RAY_TMAX, f32)
        kind = jnp.zeros(shape, jnp.int32)
        t, kind = _analytic_tests(
            sph_ref, pln_ref, ox, oy, oz, dx, dy, dz, t, kind,
            num_sph, num_pln,
        )
        miss = act_b & ~(kind > 0)
        act_b = act_b & ~miss

        # ---- hit surface (models/scene.hit_surface, analytic arms) ----
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        nx = jnp.zeros(shape, f32)
        ny = jnp.zeros(shape, f32)
        nz = jnp.zeros(shape, f32)
        mat_idx = jnp.full(shape, objmat_ref[0], jnp.int32)
        for s in range(num_sph):
            is_s = kind == 1 + s
            cxs, cys, czs = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]
            vx, vy, vz = px - cxs, py - cys, pz - czs
            l_s = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            nx = jnp.where(is_s, vx / l_s, nx)
            ny = jnp.where(is_s, vy / l_s, ny)
            nz = jnp.where(is_s, vz / l_s, nz)
            mat_idx = jnp.where(is_s, sphmat_ref[s], mat_idx)
        for p in range(num_pln):
            is_p = kind == 1 + num_sph + p
            nx = jnp.where(is_p, pln_ref[p, 3], nx)
            ny = jnp.where(is_p, pln_ref[p, 4], ny)
            nz = jnp.where(is_p, pln_ref[p, 5], nz)
            mat_idx = jnp.where(is_p, plnmat_ref[p], mat_idx)

        def mat_col(col):
            return _select_mat_col(mats_ref, mat_idx, col, num_mats)

        alb_r = mat_col(M_ALBEDO)
        alb_g = mat_col(M_ALBEDO + 1)
        alb_b = mat_col(M_ALBEDO + 2)
        m_spec = mat_col(M_SPECULAR)
        m_refr = mat_col(M_REFRACT)
        m_ior = mat_col(M_IOR)
        is_light = mat_col(13) > 0.5

        # ---- light hit: unconditional emission add, then terminate ----
        hit_light = act_b & is_light
        inten = mat_col(M_INTENSITY)
        enx = enx + jnp.where(hit_light, tpx * mat_col(M_EMISSIVE) * inten, 0.0)
        eny = eny + jnp.where(hit_light, tpy * mat_col(M_EMISSIVE + 1) * inten, 0.0)
        enz = enz + jnp.where(hit_light, tpz * mat_col(M_EMISSIVE + 2) * inten, 0.0)
        act_b = act_b & ~hit_light

        dw = jnp.maximum(0.0, 1.0 - m_spec - m_refr)

        # ---- direct lighting: every light a point light, hard shadows
        # (trace_whitted's light_geom/accumulate, per-light sequential) --
        dir_r = jnp.zeros(shape, f32)
        dir_g = jnp.zeros(shape, f32)
        dir_b = jnp.zeros(shape, f32)
        for li in range(num_lights):
            lcx = lights_ref[li, L_CENTER]
            lcy = lights_ref[li, L_CENTER + 1]
            lcz = lights_ref[li, L_CENTER + 2]
            lrad = lights_ref[li, L_RADIUS]
            tlx, tly, tlz = lcx - px, lcy - py, lcz - pz
            dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
            d_d = jnp.maximum(dist, 1e-20)
            tlx, tly, tlz = tlx / d_d, tly / d_d, tlz / d_d
            ndotl = nx * tlx + ny * tly + nz * tlz
            want = act_b & (dw > 0.0) & (ndotl > 0.0)
            tr = tr + want.astype(jnp.int32)
            # shadow ray stops at the light sphere's surface so the
            # light cannot occlude itself (mesh proxies have radius 0)
            stmax = dist - lrad - 2.0 * RAY_NUDGE
            occ = _analytic_occluded(
                sph_ref, pln_ref,
                px + tlx * RAY_NUDGE, py + tly * RAY_NUDGE,
                pz + tlz * RAY_NUDGE,
                tlx, tly, tlz, stmax, num_sph, num_pln,
            )
            vis = want & ~occ
            atten = 1.0 / jnp.maximum(dist * dist, 1e-20)
            dir_r = dir_r + jnp.where(vis, (ndotl * atten) * lights_ref[li, L_EMISSION], 0.0)
            dir_g = dir_g + jnp.where(vis, (ndotl * atten) * lights_ref[li, L_EMISSION + 1], 0.0)
            dir_b = dir_b + jnp.where(vis, (ndotl * atten) * lights_ref[li, L_EMISSION + 2], 0.0)
        enx = enx + jnp.where(act_b, tpx * dw * alb_r * dir_r, 0.0)
        eny = eny + jnp.where(act_b, tpy * dw * alb_g * dir_g, 0.0)
        enz = enz + jnp.where(act_b, tpz * dw * alb_b * dir_b, 0.0)

        # ---- continuation: dielectric first, else mirror, else die
        # (trace_whitted lines 223-276; dielectric math bit-matches
        # integrators._dielectric via the megakernel formulation) ----
        ddn = dx * nx + dy * ny + dz * nz
        rfx = dx - 2.0 * nx * ddn
        rfy = dy - 2.0 * ny * ddn
        rfz = dz - 2.0 * nz * ddn

        cosi_raw = jnp.clip(ddn, -1.0, 1.0)
        outside = cosi_raw < 0.0
        inside = ~outside
        cosi = jnp.abs(cosi_raw)
        etai = jnp.where(outside, 1.0, m_ior)
        etat = jnp.where(outside, m_ior, 1.0)
        nrx = jnp.where(outside, nx, -nx)
        nry = jnp.where(outside, ny, -ny)
        nrz = jnp.where(outside, nz, -nz)
        eta = etai / etat
        kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
        tir = kk < 0.0
        coef = eta * cosi - jnp.sqrt(jnp.maximum(kk, 0.0))
        rx = dx * eta + coef * nrx
        ry = dy * eta + coef * nry
        rz = dz * eta + coef * nrz
        l_r = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        rx, ry, rz = rx / l_r, ry / l_r, rz / l_r
        angle_out = rx * nx + ry * ny + rz * nz
        s_pol = (etai * ddn - etat * angle_out) / (etai * ddn + etat * angle_out)
        p_pol = (etai * angle_out - etat * ddn) / (etai * angle_out + etat * ddn)
        fr = 0.5 * (s_pol * s_pol + p_pol * p_pol)
        fr = jnp.where(tir, 1.0, fr)

        st = _xs32(st)
        r_fr = _u2f(st)
        choose_refract = r_fr > fr

        ab_r = mat_col(M_ABSORB)
        ab_g = mat_col(M_ABSORB + 1)
        ab_b = mat_col(M_ABSORB + 2)
        beer_r = jnp.exp(-ab_r * t)
        beer_g = jnp.exp(-ab_g * t)
        beer_b = jnp.exp(-ab_b * t)

        has_refr = m_refr > 0.0
        cont_diel = act_b & has_refr & ~tir
        diel_refract = cont_diel & choose_refract
        diel_reflect = cont_diel & ~choose_refract
        cont_spec = act_b & ~has_refr & (m_spec > 0.0)
        tir_reflect = act_b & has_refr & tir
        die = act_b & ~cont_diel & ~cont_spec & ~tir_reflect

        refl = cont_spec | diel_reflect | tir_reflect
        ndx = jnp.where(refl, rfx, dx)
        ndy = jnp.where(refl, rfy, dy)
        ndz = jnp.where(refl, rfz, dz)
        ndx = jnp.where(diel_refract, rx, ndx)
        ndy = jnp.where(diel_refract, ry, ndy)
        ndz = jnp.where(diel_refract, rz, ndz)

        diel_any = diel_refract | diel_reflect | tir_reflect
        tm_r = jnp.where(diel_any, m_refr * alb_r, 1.0)
        tm_g = jnp.where(diel_any, m_refr * alb_g, 1.0)
        tm_b = jnp.where(diel_any, m_refr * alb_b, 1.0)
        ref_in = diel_refract & inside
        tm_r = jnp.where(ref_in, m_refr * alb_r * beer_r, tm_r)
        tm_g = jnp.where(ref_in, m_refr * alb_g * beer_g, tm_g)
        tm_b = jnp.where(ref_in, m_refr * alb_b * beer_b, tm_b)
        tm_r = jnp.where(cont_spec, m_spec * alb_r, tm_r)
        tm_g = jnp.where(cont_spec, m_spec * alb_g, tm_g)
        tm_b = jnp.where(cont_spec, m_spec * alb_b, tm_b)
        tpx = tpx * tm_r
        tpy = tpy * tm_g
        tpz = tpz * tm_b

        act_b = act_b & ~die
        bounced = refl | diel_refract
        ox = jnp.where(bounced, px + ndx * RAY_NUDGE, ox)
        oy = jnp.where(bounced, py + ndy * RAY_NUDGE, oy)
        oz = jnp.where(bounced, pz + ndz * RAY_NUDGE, oz)
        dx = jnp.where(bounced, ndx, dx)
        dy = jnp.where(bounced, ndy, dy)
        dz = jnp.where(bounced, ndz, dz)
        return (ox, oy, oz, dx, dy, dz, st, tpx, tpy, tpz,
                enx, eny, enz, act_b.astype(jnp.int32), tr)

    init = (
        ox_ref[:].reshape(shape), oy_ref[:].reshape(shape),
        oz_ref[:].reshape(shape),
        dx_ref[:].reshape(shape), dy_ref[:].reshape(shape),
        dz_ref[:].reshape(shape),
        st_ref[:].reshape(shape),
        jnp.ones(shape, f32), jnp.ones(shape, f32), jnp.ones(shape, f32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        act_ref[:].reshape(shape),
        jnp.zeros(shape, jnp.int32),
    )
    out = jax.lax.fori_loop(0, depths, body, init)
    ex_ref[:] = out[10].reshape(-1)
    ey_ref[:] = out[11].reshape(-1)
    ez_ref[:] = out[12].reshape(-1)
    ost_ref[:] = out[6].reshape(-1)
    tr_ref[:] = out[14].reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mats", "num_lights", "num_sph", "num_pln", "depths",
        "interpret",
    ),
)
def whitted_frame(
    mats, lights, sph, pln, sphmat, plnmat, objmat,
    rays, state,
    *, num_mats, num_lights, num_sph, num_pln, depths, interpret=False,
):
    """Full Whitted trace in one launch over an analytic scene.

    rays: 6-tuple of (N,) ray components; state (N,) u32.
    Returns (energy (N, 3) f32, state' (N,) u32, traced () i32) --
    bitwise equal to models/whitted.trace_whitted in interpret mode.
    """
    n0 = rays[0].shape[0]
    cols = list(rays) + [state, jnp.ones((n0,), jnp.int32)]
    pads = [1.0] * 6 + [0, 0]
    n = -(-n0 // BLOCK) * BLOCK
    if n != n0:
        pad = n - n0
        cols = [
            jnp.concatenate([a, jnp.full((pad,), v, a.dtype)])
            for a, v in zip(cols, pads)
        ]
    num_steps = n // BLOCK

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 7
        + [pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)] * 8
    )
    out_specs = [
        pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
    ] * 5
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct((n,), f32)] * 3
        + [jax.ShapeDtypeStruct((n,), jnp.uint32)]
        + [jax.ShapeDtypeStruct((n,), jnp.int32)]
    )
    res = pl.pallas_call(
        functools.partial(
            _whitted_kernel,
            num_mats=num_mats, num_lights=num_lights,
            num_sph=num_sph, num_pln=num_pln, depths=depths,
        ),
        grid=(num_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mats, lights, sph, pln, sphmat, plnmat, objmat, *cols)
    ex, ey, ez, ost, tr = [r[:n0] for r in res]
    energy = jnp.stack([ex, ey, ez], axis=1)
    return energy, ost, jnp.sum(tr, dtype=jnp.int32)
