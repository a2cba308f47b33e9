"""Pallas packet-traversal kernel vs the brute-force oracle (interpret
mode: the kernel's semantics run on CPU; compiled-mode parity is covered
by the TPU benchmarks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import bvh, bvh8, mesh
from cpugpupathtracing_tpu.ops import intersect
from cpugpupathtracing_tpu.ops import traverse_packet as tp
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


@pytest.fixture(scope="module")
def sphere_bvh():
    m = mesh.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    w = bvh8.collapse(b)
    return b, w


def _rays(rng_np, n):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 4
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_packet_matches_brute_force(sphere_bvh, rng_np):
    b, w = sphere_bvh
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, _, _ = tp.traverse_packet(
        o, d, t0, jnp.asarray(w.nodes), jnp.asarray(w.tris9),
        jnp.asarray(w.leaf_tri_id), (0,), interpret=True,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit) >= 0, np.asarray(bidx) >= 0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def test_packet_padding_and_active(sphere_bvh, rng_np):
    """Non-multiple-of-tile ray counts are padded; inactive lanes are
    excluded from the union and report misses."""
    b, w = sphere_bvh
    n = 1500  # not a multiple of 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.asarray(rng_np.random(n) < 0.5)
    t, hit, _, _ = tp.traverse_packet(
        o, d, t0, jnp.asarray(w.nodes), jnp.asarray(w.tris9),
        jnp.asarray(w.leaf_tri_id), (0,), active=act, interpret=True,
    )
    assert t.shape == (n,)
    inactive = ~np.asarray(act)
    assert (np.asarray(hit)[inactive] == -1).all()
    np.testing.assert_allclose(np.asarray(t)[inactive], RAY_TMAX)


def test_packet_any_hit_occlusion(sphere_bvh, rng_np):
    b, w = sphere_bvh
    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    args = (jnp.asarray(w.nodes), jnp.asarray(w.tris9), jnp.asarray(w.leaf_tri_id))
    _, h_near, _, _ = tp.traverse_packet(o, d, t0, *args, (0,), interpret=True)
    _, h_any, _, _ = tp.traverse_packet(
        o, d, t0, *args, (0,), any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_any) >= 0, np.asarray(h_near) >= 0)


def test_packet_tmax(sphere_bvh):
    b, w = sphere_bvh
    o = jnp.tile(jnp.array([[0.11, 0.07, 5.0]]), (1024, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (1024, 1))
    t0 = jnp.concatenate([
        jnp.full((512,), 3.0, jnp.float32),   # tmax before the sphere
        jnp.full((512,), 10.0, jnp.float32),
    ])
    t, hit, _, _ = tp.traverse_packet(
        o, d, t0, jnp.asarray(w.nodes), jnp.asarray(w.tris9),
        jnp.asarray(w.leaf_tri_id), (0,), interpret=True,
    )
    assert (np.asarray(hit)[:512] == -1).all()
    assert (np.asarray(hit)[512:] >= 0).all()


def test_packet_mr_matches_brute_force(rng_np):
    """Multi-row (8 sub-packet) kernel vs the oracle, interpret mode."""
    from cpugpupathtracing_tpu.ops import traverse_packet_mr as tm

    m = mesh.icosphere(subdivisions=1)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    w = bvh8.collapse(b, leaf_max=8)
    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, _, _ = tm.traverse_packet_mr(
        o, d, t0, jnp.asarray(w.nodes), jnp.asarray(w.tris9),
        jnp.asarray(w.leaf_tri_id), (0,), interpret=True,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit) >= 0, np.asarray(bidx) >= 0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def test_packet_mr_active_and_anyhit(rng_np):
    from cpugpupathtracing_tpu.ops import traverse_packet_mr as tm

    m = mesh.icosphere(subdivisions=1)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    w = bvh8.collapse(b, leaf_max=8)
    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.asarray(rng_np.random(n) < 0.5)
    args = (jnp.asarray(w.nodes), jnp.asarray(w.tris9), jnp.asarray(w.leaf_tri_id))
    t, hit, _, _ = tm.traverse_packet_mr(
        o, d, t0, *args, (0,), active=act, interpret=True
    )
    inactive = ~np.asarray(act)
    assert (np.asarray(hit)[inactive] == -1).all()
    _, h_any, _, _ = tm.traverse_packet_mr(
        o, d, t0, *args, (0,), any_hit=True, interpret=True
    )
    _, h_near, _, _ = tm.traverse_packet_mr(
        o, d, t0, *args, (0,), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_any) >= 0, np.asarray(h_near) >= 0)
