"""BVH builder invariants and structural parity checks (SURVEY.md section 4)."""

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import bvh, mesh

OPTIONS = [
    BuildOption.NAIVE_SPLIT,
    BuildOption.SAH_SPLIT_INTERVALS,
    BuildOption.SAH_SPLIT_PRIMITIVES,
]


def _build(m: mesh.Mesh, option, **kw):
    return bvh.build(m.positions, m.normals, m.indices, option, **kw)


def _check_invariants(b: bvh.BVH):
    t = b.num_triangles
    # permutation covers every triangle exactly once
    assert sorted(b.tri_indices.tolist()) == list(range(t))

    leaf_slots = np.zeros(t, bool)
    visited = np.zeros(b.num_nodes, bool)

    stack = [0]
    while stack:
        i = stack.pop()
        assert not visited[i], "node reachable twice"
        visited[i] = True
        if b.prim_count[i] > 0:
            s, c = int(b.left_first[i]), int(b.prim_count[i])
            assert not leaf_slots[s : s + c].any(), "triangle in two leaves"
            leaf_slots[s : s + c] = True
            # leaf bounds contain their triangles
            seg = b.tri_indices[s : s + c]
            lo = np.minimum(np.minimum(b.tri_v0[seg], b.tri_v1[seg]), b.tri_v2[seg])
            hi = np.maximum(np.maximum(b.tri_v0[seg], b.tri_v1[seg]), b.tri_v2[seg])
            assert (lo.min(0) >= b.nodes_min[i] - 1e-4).all()
            assert (hi.max(0) <= b.nodes_max[i] + 1e-4).all()
        else:
            li = int(b.left_first[i])
            ri = li + 1
            # parent bounds contain child bounds
            for ci in (li, ri):
                assert (b.nodes_min[ci] >= b.nodes_min[i] - 1e-4).all()
                assert (b.nodes_max[ci] <= b.nodes_max[i] + 1e-4).all()
            stack += [li, ri]
    assert leaf_slots.all(), "triangle missing from all leaves"
    assert visited[: b.num_nodes].all(), "orphan node allocated"


@pytest.mark.parametrize("option", OPTIONS)
def test_invariants_icosphere(option):
    m = mesh.icosphere(subdivisions=2)  # 320 tris
    b = _build(m, option)
    _check_invariants(b)


@pytest.mark.parametrize("option", OPTIONS)
def test_invariants_random_soup(option, rng_np):
    pos = rng_np.normal(size=(300, 3)).astype(np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (300, 1))
    idx = np.arange(300, dtype=np.uint32)
    b = bvh.build(pos, nrm, idx, option)
    _check_invariants(b)


def test_naive_split_leaf_size():
    # NaiveSplit terminates at <= 2 prims (Source/BVH.cpp:211-212) unless
    # partition degenerates
    m = mesh.icosphere(subdivisions=2)
    b = _build(m, BuildOption.NAIVE_SPLIT)
    leaves = b.prim_count[b.prim_count > 0]
    assert leaves.max() <= 4  # degenerate unsplittable clusters stay larger

    assert b.max_depth > 3


def test_sah_beats_naive_on_area():
    # total traversal cost proxy: sum over interior of child half-areas
    m = mesh.dragon_standin()
    bn = _build(m, BuildOption.NAIVE_SPLIT)
    bs = _build(m, BuildOption.SAH_SPLIT_INTERVALS)

    def cost(b):
        interior = b.prim_count == 0
        area = bvh._half_area(b.nodes_min, b.nodes_max)
        return float(area[~interior] @ b.prim_count[~interior])

    assert cost(bs) <= cost(bn) * 1.1


def test_total_area_heron():
    m = mesh.ground_quad(half_extent=1.0)  # two right triangles, area 2 each
    b = _build(m, BuildOption.NAIVE_SPLIT)
    np.testing.assert_allclose(b.total_area, 4.0, rtol=1e-5)


def test_max_leaf_size_enforced():
    m = mesh.dragon_standin()
    b = _build(m, BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=4)
    _check_invariants(b)
    assert b.prim_count.max() <= 4


def test_rebuild_with_other_heuristic():
    m = mesh.icosphere(subdivisions=1)
    b = _build(m, BuildOption.SAH_SPLIT_INTERVALS)
    b2 = b.rebuild(BuildOption.NAIVE_SPLIT)
    _check_invariants(b2)
    assert b2.build_option == BuildOption.NAIVE_SPLIT
    assert b2.num_triangles == b.num_triangles


def test_single_triangle():
    pos = np.float32([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    nrm = np.tile(np.float32([0, 0, 1]), (3, 1))
    b = bvh.build(pos, nrm, np.arange(3, dtype=np.uint32), BuildOption.SAH_SPLIT_INTERVALS)
    assert b.num_nodes == 1 and b.prim_count[0] == 1


def test_flat_normals_use_v0(rng_np):
    # tri_normal must be v0's normal, not an average (Source/Primitives.cpp:148-151)
    pos = rng_np.normal(size=(6, 3)).astype(np.float32)
    nrm = rng_np.normal(size=(6, 3)).astype(np.float32)
    idx = np.array([3, 1, 2, 0, 4, 5], np.uint32)
    b = bvh.build(pos, nrm, idx, BuildOption.NAIVE_SPLIT)
    np.testing.assert_allclose(b.tri_normal[0], nrm[3])
    np.testing.assert_allclose(b.tri_normal[1], nrm[0])


class TestNativeBuilder:
    """The C++ builder must produce bit-identical trees to the numpy
    oracle (same f32 arithmetic, candidate order, tie-breaks)."""

    @pytest.mark.parametrize("option", OPTIONS)
    @pytest.mark.parametrize("leaf", [None, 4])
    def test_bit_parity(self, option, leaf, monkeypatch):
        from cpugpupathtracing_tpu import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        m = mesh.icosphere(subdivisions=3)
        b_native = bvh.build(m.positions, m.normals, m.indices, option, max_leaf_size=leaf)
        monkeypatch.setenv("CPUGPU_TPU_NO_NATIVE", "1")
        b_numpy = bvh.build(m.positions, m.normals, m.indices, option, max_leaf_size=leaf)
        for f in ["nodes_min", "nodes_max", "left_first", "prim_count", "tri_indices"]:
            np.testing.assert_array_equal(
                getattr(b_native, f), getattr(b_numpy, f), err_msg=f
            )
        assert b_native.max_depth == b_numpy.max_depth
