"""Intersection-kernel tests vs hand-computed analytic cases."""

import numpy as np
import jax.numpy as jnp

from cpugpupathtracing_tpu.ops import intersect
from cpugpupathtracing_tpu.utils.vecmath import AABB_MISS, RAY_TMAX


def tri(v0, v1, v2):
    v0, v1, v2 = map(lambda v: jnp.asarray(v, jnp.float32), (v0, v1, v2))
    return v0, v1 - v0, v2 - v0


class TestTriangle:
    def test_direct_hit(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([0.0, 0.0, 5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, t = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert bool(valid)
        np.testing.assert_allclose(t, 5.0, atol=1e-6)

    def test_double_sided(self):
        # hit from behind must also register (no backface culling,
        # Source/Primitives.cpp:15-19)
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([0.0, 0.0, -5.0])
        d = jnp.array([0.0, 0.0, 1.0])
        valid, t = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert bool(valid)
        np.testing.assert_allclose(t, 5.0, atol=1e-6)

    def test_miss_outside(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([5.0, 5.0, 5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, _ = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert not bool(valid)

    def test_parallel_ray_rejected_by_det_eps(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([0.0, 0.0, 1.0])
        d = jnp.array([1.0, 0.0, 0.0])  # parallel to triangle plane
        valid, _ = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert not bool(valid)

    def test_behind_origin_rejected(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([0.0, 0.0, -5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, _ = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert not bool(valid)

    def test_batched_shapes(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (8, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
        valid, t = intersect.intersect_triangle(o, d, v0, e1, e2)
        assert valid.shape == (8,) and t.shape == (8,)
        assert bool(valid.all())


class TestSphere:
    C = jnp.array([0.0, 0.0, 0.0])
    R2 = jnp.float32(4.0)

    def test_hit_front(self):
        o = jnp.array([0.0, 0.0, 10.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, t = intersect.intersect_sphere(o, d, self.C, self.R2)
        assert bool(valid)
        np.testing.assert_allclose(t, 8.0, atol=1e-5)

    def test_inside_hits_exit(self):
        o = jnp.array([0.0, 0.0, 1.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, t = intersect.intersect_sphere(o, d, self.C, self.R2)
        assert bool(valid)
        np.testing.assert_allclose(t, 3.0, atol=1e-5)

    def test_behind_rejected_by_tca(self):
        # center behind origin -> tca < 0 -> miss even though the line hits
        o = jnp.array([0.0, 0.0, -10.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, _ = intersect.intersect_sphere(o, d, self.C, self.R2)
        assert not bool(valid)

    def test_tangent_miss(self):
        o = jnp.array([0.0, 5.0, 10.0])
        d = jnp.array([0.0, 0.0, -1.0])
        valid, _ = intersect.intersect_sphere(o, d, self.C, self.R2)
        assert not bool(valid)


class TestPlane:
    def test_hit(self):
        o = jnp.array([0.0, 5.0, 0.0])
        d = jnp.array([0.0, -1.0, 0.0])
        valid, t = intersect.intersect_plane(
            o, d, jnp.array([0.0, -3.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
        )
        assert bool(valid)
        np.testing.assert_allclose(t, 8.0, atol=1e-6)

    def test_parallel_miss(self):
        o = jnp.array([0.0, 5.0, 0.0])
        d = jnp.array([1.0, 0.0, 0.0])
        valid, _ = intersect.intersect_plane(
            o, d, jnp.array([0.0, -3.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
        )
        assert not bool(valid)


class TestAABB:
    def test_hit_entry_distance(self):
        o = jnp.array([0.0, 0.0, 5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        t = intersect.intersect_aabb(
            o, 1.0 / d, jnp.float32(RAY_TMAX),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        np.testing.assert_allclose(t, 4.0, atol=1e-6)

    def test_miss(self):
        o = jnp.array([5.0, 5.0, 5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        t = intersect.intersect_aabb(
            o, 1.0 / d, jnp.float32(RAY_TMAX),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) == float(np.float32(AABB_MISS))

    def test_origin_inside_hits_with_negative_tmin(self):
        o = jnp.array([0.0, 0.0, 0.0])
        d = jnp.array([1.0, 0.0, 0.0])
        t = intersect.intersect_aabb(
            o, 1.0 / d, jnp.float32(RAY_TMAX),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) < 0.0  # tmin negative, still a hit per the predicate

    def test_closer_hit_culls_box(self):
        # tmin >= ray.t -> miss sentinel (the traversal early-out)
        o = jnp.array([0.0, 0.0, 5.0])
        d = jnp.array([0.0, 0.0, -1.0])
        t = intersect.intersect_aabb(
            o, 1.0 / d, jnp.float32(2.0),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) == float(np.float32(AABB_MISS))


class TestBruteForce:
    def test_nearest_of_two(self):
        v0s, e1s, e2s = [], [], []
        for z in [0.0, -2.0]:
            v0, e1, e2 = tri([-1, -1, z], [1, -1, z], [0, 1, z])
            v0s.append(v0), e1s.append(e1), e2s.append(e2)
        tv0, te1, te2 = jnp.stack(v0s), jnp.stack(e1s), jnp.stack(e2s)
        o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
        t_init = jnp.full((2,), RAY_TMAX, jnp.float32)
        t, idx = intersect.brute_force_nearest_triangle(o, d, tv0, te1, te2, t_init)
        np.testing.assert_allclose(t, [5.0, 3.0], atol=1e-5)
        assert idx.tolist() == [0, 1]

    def test_miss_returns_minus_one(self):
        v0, e1, e2 = tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
        o = jnp.array([[10.0, 10.0, 5.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        t_init = jnp.full((1,), RAY_TMAX, jnp.float32)
        t, idx = intersect.brute_force_nearest_triangle(
            o, d, v0[None], e1[None], e2[None], t_init
        )
        assert idx.tolist() == [-1]
        np.testing.assert_allclose(t, [RAY_TMAX])


def test_many_analytics_batched_matches_unrolled(monkeypatch, rng_np):
    """> ANALYTIC_UNROLL_MAX spheres/planes take the batched (N, S)
    path; hits must be bitwise identical to the static unrolled loops
    (first-min argmin == the loop's strict-< tie rule)."""
    import jax.numpy as jnp
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import scene as scenelib
    from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

    s = scenelib.Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    for k in range(24):
        ang = 2 * np.pi * k / 24
        s.add_sphere(
            f"s{k}",
            (3.0 * np.cos(ang), 0.3 * (k % 5), 3.0 * np.sin(ang)),
            0.4 + 0.02 * k,
            grey,
        )
    for k in range(18):
        s.add_plane(
            f"p{k}", (0.0, -2.0 - 0.5 * k, 0.0), (0.05 * (k % 3), 1.0, 0.0), grey
        )
    dev = s.device()
    n = 512
    o = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32) * 5)
    aim = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = aim - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)

    hb = scenelib.intersect_scene(dev, o, d, t0)
    monkeypatch.setattr(scenelib, "ANALYTIC_UNROLL_MAX", 99)
    hu = scenelib.intersect_scene(dev, o, d, t0)
    np.testing.assert_array_equal(np.asarray(hb.t), np.asarray(hu.t))
    np.testing.assert_array_equal(np.asarray(hb.obj), np.asarray(hu.obj))
    np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hu.prim))
    np.testing.assert_array_equal(np.asarray(hb.kind), np.asarray(hu.kind))
    assert int((np.asarray(hb.obj) >= 0).sum()) > 100
