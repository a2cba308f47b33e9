"""Integrator physics tests: analytic oracles and cross-integrator
agreement (the reference's interactive comparison mode made automatic,
SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import (
    DiffusePdfMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import integrators, materials as matlib
from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX, normalize

EMISSION = 2.0
ALBEDO = 0.6


def furnace_scene() -> Scene:
    """Diffuse floor inside a uniformly emissive box.

    A diffuse surface with albedo a under uniform incident radiance L
    reflects exactly a*L: the converged one-bounce answer is analytic.
    (An enclosing emissive *sphere* would not work: the reference's
    sphere predicate rejects tca < 0, so rays from inside that point away
    from the center miss -- reproduced faithfully in intersect_sphere.)
    """
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((ALBEDO, ALBEDO, ALBEDO)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), EMISSION))
    s.add_plane("floor", (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), white)
    for name, point, n in [
        ("ceil", (0.0, 50.0, 0.0), (0.0, -1.0, 0.0)),
        ("x+", (50.0, 0.0, 0.0), (-1.0, 0.0, 0.0)),
        ("x-", (-50.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
        ("z+", (0.0, 0.0, 50.0), (0.0, 0.0, -1.0)),
        ("z-", (0.0, 0.0, -50.0), (0.0, 0.0, 1.0)),
    ]:
        s.add_plane(name, point, n, light)
    return s


def outdoor_scene() -> Scene:
    """Diffuse floor + one area light sphere above: NEE-compatible."""
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 20.0))
    s.add_plane("floor", (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), grey)
    li = s.add_sphere("light", (0.0, 8.0, 0.0), 2.0, light)
    s.mark_light(li)
    return s


def _down_rays(n):
    """n rays looking at the floor from above, spread over x/z."""
    xs = np.linspace(-3, 3, n, dtype=np.float32)
    o = jnp.asarray(np.stack([xs, np.full(n, 5.0, np.float32), xs * 0.37], 1))
    d = jnp.tile(normalize(jnp.array([0.05, -1.0, 0.02]))[None], (n, 1))
    return o, d


def _mean_energy(trace_fn, dev, settings, n=4096, rounds=8, salt=1):
    o, d = _down_rays(n)
    acc = np.zeros(3)
    for r in range(rounds):
        st = rnglib.seed_lanes(jnp.arange(n), r, salt=salt)
        _, res = trace_fn(dev, settings, o, d, st)
        acc += np.asarray(res.energy).mean(axis=0)
    return acc / rounds


class TestFurnace:
    def test_direct_light_hit(self):
        dev = furnace_scene().device()
        o = jnp.zeros((8, 3)) + jnp.array([0.0, 1.0, 0.0])
        d = jnp.tile(normalize(jnp.array([0.3, 1.0, 0.1]))[None], (8, 1))
        st = rnglib.seed_lanes(jnp.arange(8), 0)
        settings = RenderSettings(
            next_event_estimation=False, russian_roulette=False,
            cosine_weighted_diffuse=False,
        )
        _, res = integrators.trace_brute(dev, settings, o, d, st)
        np.testing.assert_allclose(np.asarray(res.energy), EMISSION, atol=1e-5)
        # one traversal per lane, path ends at the light
        assert int(res.traced_rays) == 8

    @pytest.mark.parametrize("cosine", [False, True])
    def test_advanced_correct_pdf_reaches_albedo_times_L(self, cosine):
        dev = furnace_scene().device()
        settings = RenderSettings(
            next_event_estimation=False,  # env light unusable by NEE from inside
            russian_roulette=False,
            cosine_weighted_diffuse=cosine,
            diffuse_pdf_mode=DiffusePdfMode.CORRECT,
        )
        mean = _mean_energy(integrators.trace_advanced, dev, settings)
        np.testing.assert_allclose(mean, ALBEDO * EMISSION, rtol=0.03)

    def test_brute_force_matches_analytic(self):
        dev = furnace_scene().device()
        settings = RenderSettings(next_event_estimation=False, russian_roulette=False)
        mean = _mean_energy(integrators.trace_brute, dev, settings)
        np.testing.assert_allclose(mean, ALBEDO * EMISSION, rtol=0.03)

    def test_reference_swapped_pdf_ratio(self):
        """Pins the reference's swapped cosine-pdf constant
        (Main.cpp:553-557): its estimator multiplies by 2 cos(theta),
        giving E[2cos^2]/E[cos] * pi/... = 4/3 the correct answer under
        uniform incident radiance."""
        dev = furnace_scene().device()
        base = dict(next_event_estimation=False, russian_roulette=False,
                    cosine_weighted_diffuse=True)
        ref = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, diffuse_pdf_mode=DiffusePdfMode.REFERENCE),
        )
        cor = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, diffuse_pdf_mode=DiffusePdfMode.CORRECT),
        )
        np.testing.assert_allclose(ref / cor, 4.0 / 3.0, rtol=0.05)


class TestCrossIntegrator:
    def test_advanced_uniform_correct_equals_brute(self):
        """With NEE/RR off, uniform sampling, and correct pdfs, the
        advanced integrator is the same estimator as brute force."""
        dev = outdoor_scene().device()
        adv = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(
                next_event_estimation=False, russian_roulette=False,
                cosine_weighted_diffuse=False,
                diffuse_pdf_mode=DiffusePdfMode.CORRECT,
            ),
            n=8192, rounds=12,
        )
        bru = _mean_energy(
            integrators.trace_brute, dev,
            RenderSettings(next_event_estimation=False, russian_roulette=False),
            n=8192, rounds=12,
        )
        np.testing.assert_allclose(adv, bru, rtol=0.06)

    def test_nee_consistent_with_brute(self):
        """NEE must not change the converged mean (energy-conservation
        oracle, the reference's total_energy_received check)."""
        dev = outdoor_scene().device()
        nee = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(
                next_event_estimation=True, russian_roulette=False,
                cosine_weighted_diffuse=False,
                diffuse_pdf_mode=DiffusePdfMode.CORRECT,
            ),
            n=8192, rounds=12, salt=7,
        )
        bru = _mean_energy(
            integrators.trace_brute, dev,
            RenderSettings(next_event_estimation=False, russian_roulette=False),
            n=8192, rounds=12, salt=9,
        )
        np.testing.assert_allclose(nee, bru, rtol=0.06)

    def test_russian_roulette_unbiased(self):
        dev = outdoor_scene().device()
        base = dict(next_event_estimation=True, cosine_weighted_diffuse=True,
                    diffuse_pdf_mode=DiffusePdfMode.CORRECT)
        on = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, russian_roulette=True), n=8192, rounds=12,
        )
        off = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, russian_roulette=False), n=8192, rounds=12, salt=3,
        )
        np.testing.assert_allclose(on, off, rtol=0.07)

    def test_nee_reduces_variance(self):
        """The point of NEE: per-sample variance drops on direct lighting."""
        dev = outdoor_scene().device()
        o, d = _down_rays(4096)
        st = rnglib.seed_lanes(jnp.arange(4096), 0)
        base = dict(russian_roulette=False, cosine_weighted_diffuse=False,
                    diffuse_pdf_mode=DiffusePdfMode.CORRECT)
        _, with_nee = integrators.trace_advanced(
            dev, RenderSettings(**base, next_event_estimation=True), o, d, st
        )
        _, without = integrators.trace_advanced(
            dev, RenderSettings(**base, next_event_estimation=False), o, d, st
        )
        v_on = np.asarray(with_nee.energy).var(axis=0).mean()
        v_off = np.asarray(without.energy).var(axis=0).mean()
        assert v_on < v_off * 0.5


class TestMirrorAndGlass:
    def test_perfect_mirror_sees_light(self):
        """Specular lobe: mirror floor reflects the light sphere."""
        s = Scene()
        mirror = s.add_material(matlib.Material.diffuse((1.0, 1.0, 1.0), specular=1.0))
        light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 3.0))
        s.add_plane("mirror", (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), mirror)
        li = s.add_sphere("light", (0.0, 6.0, 0.0), 2.0, light)
        s.mark_light(li)
        dev = s.device()
        # straight-down ray reflects off the mirror straight up into the
        # light (the downward primary cannot hit the light: tca < 0)
        o = jnp.array([[0.0, 3.0, 0.0]])
        d = jnp.asarray(normalize(jnp.array([[0.0, -1.0, 0.0]])))
        st = rnglib.seed_lanes(jnp.arange(1), 0)
        settings = RenderSettings(russian_roulette=False)
        _, res = integrators.trace_advanced(dev, settings, o, d, st)
        # albedo 1 mirror: full light emission; specular ray may see light
        # even with NEE on (is_specular flag, Main.cpp:424-431)
        np.testing.assert_allclose(np.asarray(res.energy)[0], 3.0, rtol=1e-4)

    def test_nee_double_count_guard(self):
        """A diffuse bounce that happens to hit the light adds nothing
        when NEE is on (Main.cpp:424-431) -- checked statistically: with
        cosine sampling toward a huge overhead light, NEE-on mean stays
        below the sum of direct+indirect double counting."""
        dev = outdoor_scene().device()
        base = dict(russian_roulette=False, cosine_weighted_diffuse=False,
                    diffuse_pdf_mode=DiffusePdfMode.CORRECT)
        nee = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, next_event_estimation=True), rounds=12,
        )
        off = _mean_energy(
            integrators.trace_advanced, dev,
            RenderSettings(**base, next_event_estimation=False), rounds=12,
        )
        # same converged mean: the guard prevents ~2x overcounting
        np.testing.assert_allclose(nee, off, rtol=0.08)

    def test_glass_beer_absorption_tints(self):
        """Beer's law on medium exit: absorption (0.2, 0.8, 0.8) transmits
        red-dominant (Main.cpp:524-532)."""
        s = Scene()
        glass = s.add_material(
            matlib.Material.dielectric((1.0, 1.0, 1.0), 0.0, 1.0, (0.2, 0.8, 0.8), 1.5)
        )
        light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 2.0))
        s.add_sphere("ball", (0.0, 0.0, 0.0), 1.0, glass)
        # emissive backdrop behind the ball catches the transmitted rays
        s.add_plane("backdrop", (0.0, 0.0, -10.0), (0.0, 0.0, 1.0), light)
        dev = s.device()
        n = 4096
        o = jnp.tile(jnp.array([[0.0, 0.0, 5.0]]), (n, 1))
        d = jnp.tile(jnp.asarray(normalize(jnp.array([0.05, 0.0, -1.0])))[None], (n, 1))
        st = rnglib.seed_lanes(jnp.arange(n), 0)
        settings = RenderSettings(
            next_event_estimation=False, russian_roulette=False, max_ray_depth=8
        )
        _, res = integrators.trace_advanced(dev, settings, o, d, st)
        mean = np.asarray(res.energy).mean(axis=0)
        assert mean[0] > mean[1] * 1.5 and mean[0] > mean[2] * 1.5


class TestCounters:
    def test_traced_rays_counts_all_misses_once(self):
        s = Scene()
        s.add_material(matlib.Material.diffuse((1.0, 1.0, 1.0)))
        s.add_plane("floor", (0.0, -5.0, 0.0), (0.0, 1.0, 0.0), 0)
        dev = s.device()
        n = 64
        o = jnp.zeros((n, 3))
        d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))  # all miss upward
        st = rnglib.seed_lanes(jnp.arange(n), 0)
        _, res = integrators.trace_advanced(
            dev, RenderSettings(track_aovs=True), o, d, st
        )
        assert int(res.traced_rays) == n
        assert np.asarray(res.ray_depth).max() == 0

    def test_determinism(self):
        dev = outdoor_scene().device()
        o, d = _down_rays(256)
        settings = RenderSettings()
        st = rnglib.seed_lanes(jnp.arange(256), 5)
        _, r1 = integrators.trace_advanced(dev, settings, o, d, st)
        _, r2 = integrators.trace_advanced(dev, settings, o, d, st)
        np.testing.assert_array_equal(np.asarray(r1.energy), np.asarray(r2.energy))


class TestTraceChunked:
    def test_prime_lane_count_matches_unchunked(self):
        """Regression: a prime n must not degrade to chunk size 1 (the
        old divisor walk); chunked results stay bitwise equal."""
        n = 1009  # prime > max_chunk below
        dev = outdoor_scene().device()
        o, d = _down_rays(n)
        settings = RenderSettings(track_aovs=True)
        st = rnglib.seed_lanes(jnp.arange(n), 3)
        _, ref = integrators.trace_advanced(dev, settings, o, d, st)
        _, chk = integrators.trace_chunked(
            integrators.trace_advanced, dev, settings, o, d, st, max_chunk=128
        )
        np.testing.assert_array_equal(np.asarray(ref.energy), np.asarray(chk.energy))
        assert int(ref.traced_rays) == int(chk.traced_rays)
        np.testing.assert_array_equal(
            np.asarray(ref.ray_depth), np.asarray(chk.ray_depth)
        )


class TestWhittedLights:
    def test_mesh_light_as_centroid_point(self):
        """A mesh light acts as a point light at its area-weighted
        surface centroid (scene.py light build): the floor below it is
        lit, and the reconstruction matches the point-light formula
        evaluated by hand at the centroid."""
        from cpugpupathtracing_tpu.models import mesh as meshlib
        from cpugpupathtracing_tpu.models.whitted import trace_whitted

        s = Scene()
        grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
        light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 5.0))
        s.add_plane("floor", (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), grey)
        cube = meshlib.cube(half=1.0)
        li = s.add_mesh("mesh light", cube, light)
        s.mark_light(li)
        dev = s.device()
        # symmetric cube at the origin: centroid is the origin
        np.testing.assert_allclose(
            np.asarray(dev.light_sph_center[0]), np.zeros(3), atol=1e-5
        )
        assert float(dev.light_sph_radius[0]) == 0.0
        o, d = _down_rays(64)
        st = rnglib.seed_lanes(jnp.arange(64), 0)
        _, res = trace_whitted(dev, RenderSettings(), o, d, st)
        en = np.asarray(res.energy)
        assert np.isfinite(en).all()
        # rays far from under the cube see the floor lit by the point
        assert en.sum() > 0.0

    def test_many_lights_batched_matches_unrolled(self, monkeypatch):
        """> _UNROLL_MAX_LIGHTS lights run ONE batched (L*N) any-hit
        traversal; the image must be bitwise identical to the
        statically unrolled per-light loop."""
        from cpugpupathtracing_tpu.models import whitted as wh

        s = Scene()
        grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
        light = s.add_material(matlib.Material.light((1.0, 0.9, 0.8), 4.0))
        s.add_plane("floor", (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), grey)
        s.add_sphere("blocker", (0.0, 1.2, 0.0), 0.6, grey)
        for k in range(6):
            ang = 2 * np.pi * k / 6
            i = s.add_sphere(
                f"l{k}", (4 * np.cos(ang), 5.0, 4 * np.sin(ang)), 0.5, light
            )
            s.mark_light(i)
        dev = s.device()
        o, d = _down_rays(256)
        st = rnglib.seed_lanes(jnp.arange(256), 0)
        _, batched = wh.trace_whitted(dev, RenderSettings(), o, d, st)
        monkeypatch.setattr(wh, "_UNROLL_MAX_LIGHTS", 99)
        _, unrolled = wh.trace_whitted(dev, RenderSettings(), o, d, st)
        np.testing.assert_array_equal(
            np.asarray(batched.energy), np.asarray(unrolled.energy)
        )
        assert int(batched.traced_rays) == int(unrolled.traced_rays)
