"""Foundation-layer tests: vec math, packing, RNG, logging, PNG IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.utils import image, log, rng
from cpugpupathtracing_tpu.utils import vecmath as vm


class TestVecMath:
    def test_dot_cross_normalize(self):
        a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
        b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
        np.testing.assert_allclose(vm.dot(a, b), [32.0, 0.0])
        np.testing.assert_allclose(vm.cross(a, b)[1], [0.0, 0.0, -1.0])
        n = vm.normalize(a)
        np.testing.assert_allclose(vm.length(n), [1.0, 1.0], atol=1e-6)

    def test_lerp_matches_reference_form(self):
        # Vec3Lerp(a, b, t) = a + t*(b-a)
        a = jnp.array([0.0, 1.0, 0.0])
        b = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(vm.lerp(a, b, 0.25), [0.25, 0.75, 0.0])

    def test_vec4_to_uint_pack(self):
        # Reference packs 0xAABBGGRR with clamp-to-1 and truncation
        # (Include/MathLib.h:144-152).
        rgba = jnp.array([[1.0, 0.5, 0.0, 1.0], [2.0, -1.0, 0.999, 0.0]])
        packed = np.asarray(vm.vec4_to_uint(rgba))
        assert packed[0] == (255 << 24) + (0 << 16) + (127 << 8) + 255
        assert packed[1] == (255 << 24) + (int(255 * 0.999) << 16) + (0 << 8) + 255
        unpacked = np.asarray(vm.uint_to_rgba8(jnp.asarray(packed)))
        assert unpacked[0].tolist() == [255, 127, 0, 255]

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        y = vm.srgb_to_linear(vm.linear_to_srgb(x))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_solve_quadratic(self):
        has, x0, x1 = vm.solve_quadratic(
            jnp.array([1.0, 1.0]), jnp.array([-3.0, 0.0]), jnp.array([2.0, 1.0])
        )
        assert bool(has[0]) and not bool(has[1])
        np.testing.assert_allclose([x0[0], x1[0]], [1.0, 2.0], atol=1e-6)


class TestRng:
    def test_xorshift_matches_scalar_reference(self):
        # xorshift32 from seed 0x12345678 (Include/Random.h:15-21)
        def scalar_xorshift(s):
            s ^= (s << 13) & 0xFFFFFFFF
            s ^= s >> 17
            s ^= (s << 5) & 0xFFFFFFFF
            return s & 0xFFFFFFFF

        s = 0x12345678
        expected = []
        for _ in range(5):
            s = scalar_xorshift(s)
            expected.append(s)

        state = jnp.array([0x12345678], dtype=jnp.uint32)
        got = []
        for _ in range(5):
            state, v = rng.next_u32(state)
            got.append(int(v[0]))
        assert got == expected

    def test_wang_hash_scalar(self):
        # WangHash(0) per the reference algorithm (Include/Random.h:6-13)
        def scalar_wang(seed):
            seed = (seed ^ 61) ^ (seed >> 16)
            seed = (seed * 9) & 0xFFFFFFFF
            seed = seed ^ (seed >> 4)
            seed = (seed * 0x27D4EB2D) & 0xFFFFFFFF
            seed = seed ^ (seed >> 15)
            return seed

        for x in [0, 1, 42, 0xDEADBEEF]:
            assert int(rng.wang_hash(jnp.uint32(x))) == scalar_wang(x)

    def test_uniformity(self):
        state = rng.seed_lanes(jnp.arange(20000), 0)
        state, v = rng.next_f32(state)
        v = np.asarray(v)
        assert v.min() >= 0.0 and v.max() < 1.0
        assert abs(v.mean() - 0.5) < 0.01
        assert abs(v.var() - 1.0 / 12.0) < 0.01

    def test_streams_decorrelated_across_frames(self):
        s0 = rng.seed_lanes(jnp.arange(1000), 0)
        s1 = rng.seed_lanes(jnp.arange(1000), 1)
        _, a = rng.next_f32(s0)
        _, b = rng.next_f32(s1)
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.1

    def test_seed_never_zero(self):
        state = rng.seed_lanes(jnp.arange(100000), 7)
        assert int(np.sum(np.asarray(state) == 0)) == 0

    def test_u32_range(self):
        state = rng.seed_lanes(jnp.arange(10000), 3)
        state, v = rng.next_u32_range(state, 0, 2)
        v = np.asarray(v)
        assert set(np.unique(v)).issubset({0, 1, 2})
        # roughly uniform over 3 buckets
        counts = np.bincount(v, minlength=3)
        assert counts.min() > 2500

    def test_determinism(self):
        a = rng.seed_lanes(jnp.arange(64), 5, salt=2)
        b = rng.seed_lanes(jnp.arange(64), 5, salt=2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLogger:
    def test_log_returns_formatted(self):
        line = log.log_info("Test", "value = {}", 42)
        assert line == "[Test] value = 42"

    def test_except_raises(self):
        with pytest.raises(RuntimeError, match="boom"):
            log.except_error("Test", "boom {}", 1)


class TestImage:
    def test_png_roundtrip(self, tmp_path, rng_np):
        img = rng_np.integers(0, 256, size=(13, 17, 4), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        image.write_png(p, img)
        back = image.read_png(p)
        np.testing.assert_array_equal(back, img)

    def test_packed_to_rgba8(self):
        packed = np.array([[0xFF00FF00 + 0x7F]], np.uint32)  # A=255 B=0 G=255 R=127
        rgba = image.packed_to_rgba8(packed)
        assert rgba[0, 0].tolist() == [0x7F, 0xFF, 0x00, 0xFF]
