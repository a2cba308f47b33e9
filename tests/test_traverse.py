"""Device BVH traversal vs the brute-force all-triangles oracle.

The core correctness gate from SURVEY.md section 4: traversal hit ==
brute-force hit (distance and triangle) on random rays, for every build
option, including multi-object fused traversal.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import bvh, mesh
from cpugpupathtracing_tpu.ops import intersect, traverse
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


def _random_rays(rng_np, n, spread=4.0, target=0.0):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * spread
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5 + target
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _pack(b: bvh.BVH):
    nodes8 = jnp.asarray(traverse.pack_nodes(b.nodes_min, b.nodes_max, b.left_first, b.prim_count))
    tris9 = jnp.asarray(traverse.pack_tris(b.tri_v0, b.tri_v1, b.tri_v2))
    perm = jnp.asarray(b.tri_indices, jnp.int32)
    return nodes8, perm, tris9


@pytest.mark.parametrize("option", [
    BuildOption.NAIVE_SPLIT,
    BuildOption.SAH_SPLIT_INTERVALS,
    BuildOption.SAH_SPLIT_PRIMITIVES,
])
def test_traversal_matches_brute_force(option, rng_np):
    m = mesh.icosphere(subdivisions=2)  # 320 tris
    b = bvh.build(m.positions, m.normals, m.indices, option, max_leaf_size=4)
    nodes8, perm, tris9 = _pack(b)
    o, d = _random_rays(rng_np, 512)
    t_init = jnp.full((512,), RAY_TMAX, jnp.float32)

    t, hit, depth = traverse.traverse(o, d, t_init, nodes8, perm, tris9, (0,))
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t_init
    )
    hit, bidx = np.asarray(hit), np.asarray(bidx)
    t, bt = np.asarray(t), np.asarray(bt)
    # some rays must hit for the test to mean anything
    assert (bidx >= 0).sum() > 100
    np.testing.assert_array_equal(hit >= 0, bidx >= 0)
    np.testing.assert_allclose(t, bt, rtol=1e-5)
    # equal-t ties can pick different triangles; require same distance AND
    # same triangle in the overwhelming majority
    agree = (hit == bidx) | (bidx < 0)
    assert agree.mean() > 0.99


def test_multi_object_fused_traversal(rng_np):
    """Two BVHs concatenated, both roots seeded: nearest across objects."""
    m1 = mesh.icosphere(center=(-2.0, 0, 0), subdivisions=1)
    m2 = mesh.cube(center=(2.0, 0, 0))
    b1 = bvh.build(m1.positions, m1.normals, m1.indices, BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    b2 = bvh.build(m2.positions, m2.normals, m2.indices, BuildOption.NAIVE_SPLIT, max_leaf_size=4)

    # concatenate with offsets (what models/scene.py does)
    nodes8 = np.concatenate([
        traverse.pack_nodes(b1.nodes_min, b1.nodes_max, b1.left_first, b1.prim_count),
        traverse.pack_nodes(
            b2.nodes_min, b2.nodes_max,
            np.where(b2.prim_count > 0, b2.left_first + b1.num_triangles,
                     b2.left_first + b1.num_nodes),
            b2.prim_count,
        ),
    ])
    perm = np.concatenate([b1.tri_indices, b2.tri_indices + b1.num_triangles])
    tris9 = np.concatenate([
        traverse.pack_tris(b1.tri_v0, b1.tri_v1, b1.tri_v2),
        traverse.pack_tris(b2.tri_v0, b2.tri_v1, b2.tri_v2),
    ])
    all_v0 = np.concatenate([b1.tri_v0, b2.tri_v0])
    all_v1 = np.concatenate([b1.tri_v1, b2.tri_v1])
    all_v2 = np.concatenate([b1.tri_v2, b2.tri_v2])

    o, d = _random_rays(rng_np, 512, spread=6.0)
    t_init = jnp.full((512,), RAY_TMAX, jnp.float32)
    t, hit, _ = traverse.traverse(
        o, d, t_init, jnp.asarray(nodes8), jnp.asarray(perm, jnp.int32),
        jnp.asarray(tris9), (0, b1.num_nodes)
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(all_v0), jnp.asarray(all_v1 - all_v0),
        jnp.asarray(all_v2 - all_v0), t_init
    )
    np.testing.assert_array_equal(np.asarray(hit) >= 0, np.asarray(bidx) >= 0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def test_tmax_respected_for_shadow_rays(rng_np):
    """Rays with finite t_init must ignore hits beyond it."""
    m = mesh.icosphere(subdivisions=1)
    b = bvh.build(m.positions, m.normals, m.indices, BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    nodes8, perm, tris9 = _pack(b)
    # slightly off-axis so the ray hits a face interior, not the exact
    # shared vertex at (0, 0, 1) where rays can slip through the crack
    o = jnp.tile(jnp.array([[0.11, 0.07, 5.0]]), (2, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
    # sphere front face near t=4; tmax 3 misses, tmax 10 hits
    t_init = jnp.array([3.0, 10.0], jnp.float32)
    t, hit, _ = traverse.traverse(o, d, t_init, nodes8, perm, tris9, (0,))
    assert int(hit[0]) == -1 and int(hit[1]) >= 0
    np.testing.assert_allclose(float(t[0]), 3.0)
    assert 3.8 < float(t[1]) < 4.2


def test_any_hit_occlusion(rng_np):
    m = mesh.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices, BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    nodes8, perm, tris9 = _pack(b)
    o, d = _random_rays(rng_np, 256)
    t_init = jnp.full((256,), RAY_TMAX, jnp.float32)
    _, hit_n, _ = traverse.traverse(o, d, t_init, nodes8, perm, tris9, (0,))
    _, hit_a, _ = traverse.traverse(o, d, t_init, nodes8, perm, tris9, (0,), any_hit=True)
    # occlusion result agrees with nearest-hit result
    np.testing.assert_array_equal(np.asarray(hit_a) >= 0, np.asarray(hit_n) >= 0)


def test_bvh_depth_counter_positive(rng_np):
    m = mesh.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices, BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    nodes8, perm, tris9 = _pack(b)
    o = jnp.array([[0.11, 0.07, 5.0]])  # off the exact-vertex axis
    d = jnp.array([[0.0, 0.0, -1.0]])
    t_init = jnp.full((1,), RAY_TMAX, jnp.float32)
    _, hit, depth = traverse.traverse(o, d, t_init, nodes8, perm, tris9, (0,))
    assert int(hit[0]) >= 0
    assert 0 < int(depth[0]) <= b.max_depth + 1
