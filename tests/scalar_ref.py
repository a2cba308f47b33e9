"""Independent scalar (pure-Python) port of the reference path tracers.

This is the RMSE-gate oracle demanded by BASELINE.md: a per-pixel
*recursive* re-implementation of the reference's integrators that shares
NOTHING with the jnp wavefront code -- its own vec math on tuples, its own
sequential global xorshift32 RNG (Include/Random.h:4-34), its own
rejection-sampled hemisphere draws (Source/Util.cpp:7-30, the reference's
do-while loops, which the jnp code replaces with closed-form sampling),
its own linear scene intersection (no BVH).  Converged images from this
port and from the jnp renderer must agree: a systematic vectorization bug
in the wavefront shading cannot hide from this diff.

Ports (all physics bit-faithful to the C++):
  * TracePath            Source/Main.cpp:581-689  (recursive brute force)
  * TracePathAdvanced    Source/Main.cpp:396-579  (NEE + RR + cosine)
  * IntersectScene       Source/Main.cpp:299-316  (linear nearest-wins)
  * Camera::GetRay       Source/Main.cpp:133-149  (screen plane)
  * Util sampling        Source/Util.cpp:7-79
  * Primitives           Source/Primitives.cpp:6-146, :170-227

Deliberately slow and simple; used on tiny frames in tests only.
"""

from __future__ import annotations

import math

import numpy as np

PI = 3.14159265358979323846
INV_PI = 1.0 / PI
NUDGE = 0.001          # RAY_REFLECT_NUDGE_MULTIPLIER (Main.cpp:49)
TMAX = 1e34            # Ray::t init (Include/Primitives.h:63)
TRI_DET_EPS = 1e-3
PLANE_EPS = 1e-6

# ---- global sequential xorshift32 (Include/Random.h:4-34) ----

_seed = 0x12345678


def seed_rng(s: int) -> None:
    global _seed
    _seed = s & 0xFFFFFFFF or 0x12345678


def rand_u32() -> int:
    global _seed
    s = _seed
    s ^= (s << 13) & 0xFFFFFFFF
    s ^= s >> 17
    s ^= (s << 5) & 0xFFFFFFFF
    _seed = s & 0xFFFFFFFF
    return _seed


def rand_f32() -> float:
    return np.float32(rand_u32() * 2.3283064365387e-10).item()


def rand_range(lo: int, hi: int) -> int:
    return lo + rand_u32() % (hi - lo + 1)


# ---- vec3 on tuples ----

def v3(x, y=None, z=None):
    if y is None:
        return (float(x), float(x), float(x))
    return (float(x), float(y), float(z))


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length(a):
    return math.sqrt(dot(a, a))


def normalize(a):
    l = length(a)
    return scale(a, 1.0 / l) if l > 0 else a


# ---- Util sampling (Source/Util.cpp) ----

def uniform_hemisphere_sample(normal):
    while True:
        d = (rand_f32() * 2 - 1, rand_f32() * 2 - 1, rand_f32() * 2 - 1)
        if dot(d, d) <= 1.0:
            break
    if dot(d, normal) < 0.0:
        d = scale(d, -1.0)
    return normalize(d)


def cosine_weighted_diffuse_reflection(normal):
    while True:
        d = (rand_f32() * 2 - 1, rand_f32() * 2 - 1, rand_f32() * 2 - 1)
        if dot(d, d) <= 1.0:
            break
    return normalize(add(normal, normalize(d)))


def survival_probability_rr(albedo):
    return min(max(max(albedo[0], albedo[1], albedo[2]), 0.1), 1.0)


def reflect(d, n):
    return sub(d, scale(n, 2.0 * dot(d, n)))


def fresnel(ang_in, ang_out, ior_out, ior_in):
    s = (ior_out * ang_in - ior_in * ang_out) / (ior_out * ang_in + ior_in * ang_out)
    p = (ior_out * ang_out - ior_in * ang_in) / (ior_out * ang_out + ior_in * ang_in)
    return 0.5 * (s * s + p * p)


def refract(d, n, eta, cosi, k):
    return normalize(add(scale(d, eta), scale(n, eta * cosi - math.sqrt(k))))


# ---- primitives (Source/Primitives.cpp) ----

def isect_triangle(o, d, va, vb, vc, t_cur):
    e1 = sub(vb, va)
    e2 = sub(vc, va)
    h = cross(d, e2)
    a = dot(e1, h)
    if abs(a) < TRI_DET_EPS:
        return None
    f = 1.0 / a
    s = sub(o, va)
    u = f * dot(s, h)
    if u < 0.0 or u > 1.0:
        return None
    q = cross(s, e1)
    v = f * dot(d, q)
    if v < 0.0 or u + v > 1.0:
        return None
    t = f * dot(e2, q)
    if t <= 0.0 or t >= t_cur:
        return None
    return t


def isect_sphere(o, d, center, radius_sq, t_cur):
    el = sub(center, o)
    tca = dot(el, d)
    if tca < 0.0:
        return None
    d2 = dot(el, el) - tca * tca
    if d2 > radius_sq:
        return None
    thc = math.sqrt(radius_sq - d2)
    t0 = tca - thc
    t1 = tca + thc
    t = t1 if t0 < 0.0 else t0
    if t < 0.0 or t >= t_cur:
        return None
    return t


def isect_plane(o, d, point, normal, t_cur):
    denom = dot(d, normal)
    if abs(denom) <= PLANE_EPS:
        return None
    t = dot(sub(point, o), normal) / denom
    if t <= 0.0 or t >= t_cur:
        return None
    return t


def random_point_triangle(va, vb, vc):
    a = rand_f32()
    b = rand_f32()
    if a + b > 1.0:
        a = 1.0 - a
        b = 1.0 - b
    g = 1.0 - b - a
    return add(scale(va, a), add(scale(vb, b), scale(vc, g)))


def random_point_sphere_facing(center, radius, pos):
    to_pos = normalize(sub(pos, center))
    d = uniform_hemisphere_sample(to_pos)
    return add(center, scale(d, radius))


def triangle_area(va, vb, vc):
    a = length(sub(vb, va))
    b = length(sub(vc, va))
    c = length(sub(vc, vb))
    s = (a + b + c) / 2.0
    return math.sqrt(max(s * (s - a) * (s - b) * (s - c), 0.0))


# ---- scene model ----

class Mat:
    def __init__(self, albedo=(0, 0, 0), specular=0.0, refractivity=0.0,
                 absorption=(0, 0, 0), ior=1.0, emissive=(0, 0, 0),
                 intensity=0.0, is_light=False):
        self.albedo = albedo
        self.specular = specular
        self.refractivity = refractivity
        self.absorption = absorption
        self.ior = ior
        self.emissive = emissive
        self.intensity = intensity
        self.is_light = is_light


class Obj:
    """kind: 'tris' (list of (v0,v1,v2,normal)), 'sphere', 'plane'."""

    def __init__(self, kind, mat, tris=None, center=None, radius=None,
                 point=None, normal=None):
        self.kind = kind
        self.mat = mat
        self.tris = tris or []
        self.center = center
        self.radius = radius
        self.radius_sq = radius * radius if radius is not None else None
        self.point = point
        self.normal = normal
        if kind == "tris":
            self.total_area = sum(triangle_area(a, b, c) for a, b, c, _ in tris)


class SceneS:
    def __init__(self):
        self.objects: list[Obj] = []
        self.lights: list[int] = []

    class Settings:
        max_ray_depth = 5
        nee = True
        cosine = True
        rr = True

    settings = Settings()


def intersect_scene(scene, o, d, tmax):
    """Linear nearest-wins loop (Source/Main.cpp:299-316).
    Returns (t, obj_idx, tri_idx) or (tmax, -1, -1)."""
    best_t, best_obj, best_tri = tmax, -1, -1
    for oi, obj in enumerate(scene.objects):
        if obj.kind == "tris":
            for ti, (va, vb, vc, _) in enumerate(obj.tris):
                t = isect_triangle(o, d, va, vb, vc, best_t)
                if t is not None:
                    best_t, best_obj, best_tri = t, oi, ti
        elif obj.kind == "sphere":
            t = isect_sphere(o, d, obj.center, obj.radius_sq, best_t)
            if t is not None:
                best_t, best_obj, best_tri = t, oi, -1
        elif obj.kind == "plane":
            t = isect_plane(o, d, obj.point, obj.normal, best_t)
            if t is not None:
                best_t, best_obj, best_tri = t, oi, -1
    return best_t, best_obj, best_tri


def hit_result(scene, o, d, t, obj_idx, tri_idx):
    pos = add(o, scale(d, t))
    obj = scene.objects[obj_idx]
    if obj.kind == "tris":
        normal = obj.tris[tri_idx][3]       # flat v0.normal
    elif obj.kind == "sphere":
        normal = normalize(sub(pos, obj.center))
    else:
        normal = obj.normal
    return pos, normal, obj.mat


def _sample_light(scene, hit_pos):
    """GetRandomLightSourceForSample (Source/Main.cpp:351-394)."""
    li = scene.lights[rand_range(0, len(scene.lights) - 1)]
    light = scene.objects[li]
    if light.kind == "tris":
        tri = light.tris[rand_range(0, len(light.tris) - 1)]
        pos = random_point_triangle(tri[0], tri[1], tri[2])
        normal = tri[3]
        area = light.total_area / 2.0
    else:
        pos = random_point_sphere_facing(light.center, light.radius, hit_pos)
        normal = normalize(sub(pos, light.center))
        area = 2.0 * PI * light.radius_sq
    to_light = sub(pos, hit_pos)
    distance = length(to_light)
    to_light = normalize(to_light)
    emission = scale(light.mat.emissive, light.mat.intensity)
    return pos, to_light, distance, normal, emission, area


def trace_path(scene, o, d, ray_depth, t_cur=TMAX):
    """TracePath (Source/Main.cpp:581-689), recursive brute force."""
    if ray_depth > scene.settings.max_ray_depth:
        return (0.0, 0.0, 0.0)
    t, obj_idx, tri_idx = intersect_scene(scene, o, d, t_cur)
    if obj_idx < 0:
        return (0.0, 0.0, 0.0)
    pos, normal, mat = hit_result(scene, o, d, t, obj_idx, tri_idx)
    if mat.is_light:
        return scale(mat.emissive, mat.intensity)

    color = (0.0, 0.0, 0.0)
    r = rand_f32()
    if r < mat.specular:
        sd = reflect(d, normal)
        sub_c = trace_path(scene, add(pos, scale(sd, NUDGE)), sd, ray_depth + 1)
        color = mul(mat.albedo, sub_c)
    elif r < mat.specular + mat.refractivity:
        n = normal
        cosi = max(-1.0, min(1.0, dot(n, d)))
        etai, etat = 1.0, mat.ior
        inside = True
        if cosi < 0.0:
            cosi = -cosi
            inside = False
        else:
            etai, etat = etat, etai
            n = scale(n, -1.0)
        eta = etai / etat
        k = 1.0 - eta * eta * (1.0 - cosi * cosi)
        if k >= 0.0:   # TIR leaves color black (Main.cpp:645)
            rd = refract(d, n, eta, cosi, k)
            ang_in = dot(d, normal)
            ang_out = dot(rd, normal)
            fr = fresnel(ang_in, ang_out, etai, etat)
            if rand_f32() > fr:
                sub_c = trace_path(scene, add(pos, scale(rd, NUDGE)), rd, ray_depth + 1)
                color = mul(mat.albedo, sub_c)
                if inside:
                    beer = (math.exp(-mat.absorption[0] * t),
                            math.exp(-mat.absorption[1] * t),
                            math.exp(-mat.absorption[2] * t))
                    color = mul(color, beer)
            else:
                sd = reflect(d, normal)
                sub_c = trace_path(scene, add(pos, scale(sd, NUDGE)), sd, ray_depth + 1)
                color = mul(mat.albedo, sub_c)
    else:
        dd = uniform_hemisphere_sample(normal)
        cosi = dot(dd, normal)
        irr = trace_path(scene, add(pos, scale(dd, NUDGE)), dd, ray_depth + 1)
        brdf = scale(mat.albedo, INV_PI)
        color = scale(mul(brdf, scale(irr, cosi)), 2.0 * PI)
    return color


def trace_path_advanced(scene, o, d):
    """TracePathAdvanced (Source/Main.cpp:396-579), iterative."""
    throughput = (1.0, 1.0, 1.0)
    energy = (0.0, 0.0, 0.0)
    ray_depth = 0
    is_specular = False
    t_cur = TMAX
    s = scene.settings
    while ray_depth <= s.max_ray_depth:
        t, obj_idx, tri_idx = intersect_scene(scene, o, d, t_cur)
        if obj_idx < 0:
            break
        pos, normal, mat = hit_result(scene, o, d, t, obj_idx, tri_idx)
        if mat.is_light:
            if not s.nee or ray_depth == 0 or is_specular:
                energy = add(energy, mul(throughput, scale(mat.emissive, mat.intensity)))
            break

        brdf_diffuse = scale(mat.albedo, INV_PI)
        diffuse_weight = max(0.0, 1.0 - mat.specular - mat.refractivity)

        if scene.lights and s.nee and diffuse_weight > 0.001:
            lpos, to_light, dist, lnormal, emission, area = _sample_light(scene, pos)
            ndotl = dot(normal, to_light)
            nldotl = dot(lnormal, scale(to_light, -1.0))
            if ndotl > 0.0 and nldotl > 0.0:
                so = add(pos, scale(to_light, NUDGE))
                _, s_obj, _ = intersect_scene(scene, so, to_light, dist - 2.0 * NUDGE)
                if s_obj < 0:
                    solid_angle = (nldotl * area) / (dist * dist)
                    contrib = scale(
                        mul(mul(throughput, brdf_diffuse), emission),
                        ndotl * solid_angle * len(scene.lights) * diffuse_weight,
                    )
                    energy = add(energy, contrib)

        if s.rr:
            survival = survival_probability_rr(mat.albedo)
            if survival < rand_f32():
                break
            throughput = scale(throughput, 1.0 / survival)

        r = rand_f32()
        if r < mat.specular:
            sd = reflect(d, normal)
            o, d = add(pos, scale(sd, NUDGE)), sd
            t_cur = TMAX
            throughput = mul(throughput, mat.albedo)
            is_specular = True
        elif r < mat.specular + mat.refractivity:
            n = normal
            cosi = max(-1.0, min(1.0, dot(n, d)))
            etai, etat = 1.0, mat.ior
            inside = True
            if cosi < 0.0:
                cosi = -cosi
                inside = False
            else:
                etai, etat = etat, etai
                n = scale(n, -1.0)
            eta = etai / etat
            k = 1.0 - eta * eta * (1.0 - cosi * cosi)
            if k >= 0.0:
                rd = refract(d, n, eta, cosi, k)
                ang_in = dot(d, normal)
                ang_out = dot(rd, normal)
                fr = fresnel(ang_in, ang_out, etai, etat)
                if rand_f32() > fr:
                    throughput = mul(throughput, mat.albedo)
                    if inside:
                        beer = (math.exp(-mat.absorption[0] * t),
                                math.exp(-mat.absorption[1] * t),
                                math.exp(-mat.absorption[2] * t))
                        throughput = mul(throughput, beer)
                    o, d = add(pos, scale(rd, NUDGE)), rd
                    t_cur = TMAX
                    is_specular = True
                else:
                    sd = reflect(d, normal)
                    o, d = add(pos, scale(sd, NUDGE)), sd
                    t_cur = TMAX
                    is_specular = True
            # k < 0: TIR -- ray unchanged; the reference's fallthrough
            # reprocesses the same vertex next iteration (its stale
            # payload survives the no-op re-traversal).  Re-intersecting
            # the unchanged ray with a fresh t finds the same hit.
            else:
                t_cur = TMAX
        else:
            if s.cosine:
                dd = cosine_weighted_diffuse_reflection(normal)
                ndotr = dot(dd, normal)
                pdf = 1.0 / (2.0 * PI)      # reference's swapped constant
            else:
                dd = uniform_hemisphere_sample(normal)
                ndotr = dot(dd, normal)
                pdf = ndotr / PI            # reference's swapped constant
            o, d = add(pos, scale(dd, NUDGE)), dd
            t_cur = TMAX
            throughput = mul(throughput, scale(brdf_diffuse, ndotr / pdf))
            is_specular = False
        ray_depth += 1
    return energy


def get_ray(cam_pos, fov_rad, aspect, u, v):
    """Camera::GetRay over the axis-aligned screen plane
    (Source/Main.cpp:133-149); view_dir fixed at (0,0,-1) like the scenes
    used in tests."""
    center = add(cam_pos, scale((0.0, 0.0, -1.0), fov_rad))
    tl = add(center, (-aspect, 1.0, 0.0))
    tr = add(center, (aspect, 1.0, 0.0))
    bl = add(center, (-aspect, -1.0, 0.0))
    pixel = add(tl, add(scale(sub(tr, tl), u), scale(sub(bl, tl), v)))
    d = normalize(sub(pixel, cam_pos))
    return cam_pos, d


def render(scene, width, height, spp, cam_pos=(0.0, 0.0, 8.0),
           fov_deg=60.0, mode="advanced", seed=1):
    """Accumulated mean image, (H, W, 3) float64."""
    seed_rng(seed)
    aspect = width / height
    fov_rad = fov_deg * PI / 180.0
    img = np.zeros((height, width, 3), np.float64)
    for y in range(height):
        for x in range(width):
            u = x / width
            v = y / height
            acc = (0.0, 0.0, 0.0)
            for _ in range(spp):
                o, d = get_ray(cam_pos, fov_rad, aspect, u, v)
                if mode == "advanced":
                    c = trace_path_advanced(scene, o, d)
                else:
                    c = trace_path(scene, o, d, 0)
                acc = add(acc, c)
            img[y, x] = np.asarray(acc) / spp
    return img
