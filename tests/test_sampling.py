"""Sampling-distribution tests vs analytic expectations."""

import numpy as np
import jax.numpy as jnp

from cpugpupathtracing_tpu.ops import sampling
from cpugpupathtracing_tpu.utils import rng
from cpugpupathtracing_tpu.utils.vecmath import dot, normalize

N = 200_000


def _states(salt=0):
    return rng.seed_lanes(jnp.arange(N), 0, salt=salt)


class TestSphereSampling:
    def test_uniform_sphere_is_unit_and_uniform(self):
        _, d = sampling.uniform_sphere(_states())
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # each component mean ~ 0, each octant ~ 1/8
        assert np.abs(d.mean(axis=0)).max() < 0.01
        octant = (d[:, 0] > 0) & (d[:, 1] > 0) & (d[:, 2] > 0)
        assert abs(octant.mean() - 0.125) < 0.01

    def test_uniform_hemisphere_cosine_moment(self):
        # E[cos theta] over a uniform hemisphere = 1/2
        n = jnp.array([0.0, 0.0, 1.0])
        _, d = sampling.uniform_hemisphere(_states(1), n)
        cos_t = np.asarray(dot(d, n))
        assert (cos_t >= 0).all()
        assert abs(cos_t.mean() - 0.5) < 0.01

    def test_cosine_weighted_moment(self):
        # E[cos theta] under pdf cos/pi = 2/3
        n = normalize(jnp.array([1.0, 2.0, -0.5]))
        _, d = sampling.cosine_weighted(_states(2), n)
        cos_t = np.asarray(dot(d, n))
        assert (cos_t >= -1e-6).all()
        assert abs(cos_t.mean() - 2.0 / 3.0) < 0.01


class TestShadingUtils:
    def test_survival_probability(self):
        albedo = jnp.array([[0.05, 0.02, 0.01], [0.5, 0.9, 0.2], [3.0, 0.0, 0.0]])
        np.testing.assert_allclose(
            sampling.survival_probability_rr(albedo), [0.1, 0.9, 1.0]
        )

    def test_reflect(self):
        d = normalize(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = sampling.reflect(d, n)
        np.testing.assert_allclose(r, normalize(jnp.array([1.0, 1.0, 0.0])), atol=1e-6)

    def test_refract_snell(self):
        # straight-on ray passes through undeflected
        d = jnp.array([0.0, 0.0, -1.0])
        n = jnp.array([0.0, 0.0, 1.0])
        cosi = jnp.float32(1.0)
        eta = jnp.float32(1.0 / 1.5)
        k = 1.0 - eta * eta * (1.0 - cosi * cosi)
        out = sampling.refract(d, n, eta, cosi, k)
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_refract_angle_obeys_snell(self):
        # 45 degrees into glass (ior 1.5)
        theta_i = np.deg2rad(45.0)
        d = jnp.array([np.sin(theta_i), -np.cos(theta_i), 0.0], dtype=jnp.float32)
        n_geo = jnp.array([0.0, 1.0, 0.0])
        cosi = -dot(n_geo, d)  # reference flips sign so cosi > 0
        eta = jnp.float32(1.0 / 1.5)
        k = 1.0 - eta * eta * (1.0 - cosi * cosi)
        out = np.asarray(sampling.refract(d, n_geo, eta, cosi, k))
        sin_t = np.linalg.norm(np.cross(out, np.asarray(n_geo)))
        np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-6)

    def test_fresnel_normal_incidence(self):
        # R0 = ((n1-n2)/(n1+n2))^2; glass 1.5 -> 0.04
        fr = sampling.fresnel(
            jnp.float32(-1.0), jnp.float32(-1.0), jnp.float32(1.0), jnp.float32(1.5)
        )
        np.testing.assert_allclose(fr, ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)

    def test_random_point_triangle_uniform(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        _, p = sampling.random_point_triangle(_states(3), v0, v1, v2)
        p = np.asarray(p)
        # inside the triangle
        assert (p[:, 0] >= 0).all() and (p[:, 1] >= 0).all()
        assert (p[:, 0] + p[:, 1] <= 1.0 + 1e-6).all()
        # centroid of uniform points = triangle centroid
        np.testing.assert_allclose(p.mean(axis=0), [1 / 3, 1 / 3, 0.0], atol=0.01)

    def test_random_point_sphere_facing(self):
        center = jnp.array([0.0, 0.0, 0.0])
        pos = jnp.array([10.0, 0.0, 0.0])
        _, p = sampling.random_point_sphere_facing(
            _states(4), center, jnp.float32(2.0), pos
        )
        p = np.asarray(p)
        np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 2.0, atol=1e-5)
        # all points on the visible hemisphere (x >= 0)
        assert (p[:, 0] >= -1e-5).all()
