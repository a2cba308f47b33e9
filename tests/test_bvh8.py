"""8-wide BVH collapse + traversal vs binary and brute-force oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import BuildOption, RenderSettings
from cpugpupathtracing_tpu.models import bvh, bvh8, mesh
from cpugpupathtracing_tpu.ops import intersect, traverse_wide
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


def _build8(m, option=BuildOption.SAH_SPLIT_INTERVALS):
    b = bvh.build(m.positions, m.normals, m.indices, option, max_leaf_size=4)
    return b, bvh8.collapse(b)


def _random_rays(rng_np, n, spread=4.0):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * spread
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestCollapse:
    def test_structure(self):
        b, w = _build8(mesh.icosphere(subdivisions=2))
        nodes = w.nodes
        cidx = nodes[:, 48:56].view(np.int32)
        ccnt = nodes[:, 56:64].view(np.int32)
        # every triangle appears exactly once across leaves
        assert sorted(w.leaf_tri_id.tolist()) == list(range(b.num_triangles))
        # interior children reference valid rows, leaves valid tri ranges
        interior = ccnt == 0
        leaf = ccnt > 0
        assert (cidx[interior] >= 0).all() and (cidx[interior] < len(nodes)).all()
        assert (cidx[leaf] + ccnt[leaf] <= len(w.tris9)).all()
        assert ccnt.max() <= bvh8.LEAF_MAX
        # each interior row is referenced exactly once (a tree)
        refs = np.bincount(cidx[interior], minlength=len(nodes))
        assert refs[0] == 0 and (refs[1:] == 1).all()

    def test_bounds_contain_leaf_tris(self):
        b, w = _build8(mesh.cube())
        bounds = w.nodes[:, 0:48].reshape(-1, 8, 6)
        cidx = w.nodes[:, 48:56].view(np.int32)
        ccnt = w.nodes[:, 56:64].view(np.int32)
        for r in range(len(w.nodes)):
            for k in range(8):
                if ccnt[r, k] > 0:
                    rows = w.tris9[cidx[r, k] : cidx[r, k] + ccnt[r, k]]
                    v0 = rows[:, 0:3]
                    v1 = v0 + rows[:, 3:6]
                    v2 = v0 + rows[:, 6:9]
                    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
                    hi = np.maximum(np.maximum(v0, v1), v2).max(0)
                    assert (lo >= bounds[r, k, 0:3] - 1e-4).all()
                    assert (hi <= bounds[r, k, 3:6] + 1e-4).all()

    def test_wide_tree_is_shallower(self):
        m = mesh.dragon_standin()
        b, w = _build8(m)
        assert w.max_depth < b.max_depth / 2


@pytest.mark.parametrize("option", [
    BuildOption.NAIVE_SPLIT, BuildOption.SAH_SPLIT_INTERVALS,
])
def test_traverse8_matches_brute_force(option, rng_np):
    m = mesh.icosphere(subdivisions=2)
    b, w = _build8(m, option)
    o, d = _random_rays(rng_np, 512)
    t_init = jnp.full((512,), RAY_TMAX, jnp.float32)
    t, hit, depth, _ = traverse_wide.traverse8(
        o, d, t_init, jnp.asarray(w.nodes), jnp.asarray(w.tris9),
        jnp.asarray(w.leaf_tri_id), (0,), stack_depth=7 * (w.max_depth + 1) + 1,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t_init,
    )
    np.testing.assert_array_equal(np.asarray(hit) >= 0, np.asarray(bidx) >= 0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
    agree = (np.asarray(hit) == np.asarray(bidx)) | (np.asarray(bidx) < 0)
    assert agree.mean() > 0.99


def test_traverse8_any_hit_and_tmax(rng_np):
    m = mesh.icosphere(subdivisions=2)
    b, w = _build8(m)
    args = (jnp.asarray(w.nodes), jnp.asarray(w.tris9), jnp.asarray(w.leaf_tri_id))
    o = jnp.tile(jnp.array([[0.11, 0.07, 5.0]]), (2, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
    t_init = jnp.array([3.0, 10.0], jnp.float32)
    t, hit, _, _ = traverse_wide.traverse8(o, d, t_init, *args, (0,))
    assert int(hit[0]) == -1 and int(hit[1]) >= 0
    o, d = _random_rays(rng_np, 128)
    tfull = jnp.full((128,), RAY_TMAX, jnp.float32)
    _, h1, _, _ = traverse_wide.traverse8(o, d, tfull, *args, (0,))
    _, h2, _, _ = traverse_wide.traverse8(o, d, tfull, *args, (0,), any_hit=True)
    np.testing.assert_array_equal(np.asarray(h1) >= 0, np.asarray(h2) >= 0)


def test_scene_wide_matches_binary_image(rng_np):
    """End-to-end: same frame traced with wide and binary traversal gives
    identical hits (both are exact nearest-hit)."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene

    def build(use_wide):
        s = Scene(use_wide=use_wide)
        grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
        s.add_mesh("ico", mesh.icosphere(subdivisions=2), grey)
        s.add_mesh("cube", mesh.cube(center=(2.5, 0, 0)), grey)
        s.add_sphere("ball", (-2.5, 0.0, 0.0), 1.0, grey)
        return s.device()

    dev_w, dev_b = build(True), build(False)
    assert dev_w.use_wide and not dev_b.use_wide
    o, d = _random_rays(rng_np, 1024, spread=5.0)
    t_init = jnp.full((1024,), RAY_TMAX, jnp.float32)
    hw = intersect_scene(dev_w, o, d, t_init)
    hb = intersect_scene(dev_b, o, d, t_init)
    np.testing.assert_allclose(np.asarray(hw.t), np.asarray(hb.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hw.obj), np.asarray(hb.obj))
    np.testing.assert_array_equal(np.asarray(hw.kind), np.asarray(hb.kind))


def test_scene_skip_matches_binary_image(rng_np):
    """Skip-link traversal (the stackless TPU fast path) returns the same
    hits as binary and wide."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene

    def build(traversal):
        s = Scene(traversal=traversal) if traversal != "binary" else Scene(use_wide=False)
        grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
        s.add_mesh("ico", mesh.icosphere(subdivisions=2), grey)
        s.add_mesh("cube", mesh.cube(center=(2.5, 0, 0)), grey)
        s.add_sphere("ball", (-2.5, 0.0, 0.0), 1.0, grey)
        return s.device()

    dev_s, dev_w, dev_b = build("skip"), build("wide"), build("binary")
    assert dev_s.traversal == "skip" and dev_w.traversal == "wide"
    o, d = _random_rays(rng_np, 1024, spread=5.0)
    t_init = jnp.full((1024,), RAY_TMAX, jnp.float32)
    hs = intersect_scene(dev_s, o, d, t_init)
    hw = intersect_scene(dev_w, o, d, t_init)
    hb = intersect_scene(dev_b, o, d, t_init)
    for h in (hw, hb):
        np.testing.assert_allclose(np.asarray(hs.t), np.asarray(h.t), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(hs.obj), np.asarray(h.obj))


def test_collapse_sah_oracle_parity(rng_np):
    """The SAH-cost DP collapse (bvh8.collapse_sah) must return tables
    whose slim-kernel hits equal the brute-force oracle, with every leaf
    child covering <= 8 triangles (the one-row slim contract) and
    strictly denser fill than the greedy collapse."""
    from cpugpupathtracing_tpu.models import bvh as bvhlib
    from cpugpupathtracing_tpu.models.bvh import BuildOption
    from cpugpupathtracing_tpu.ops import intersect
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

    m = mesh.icosphere(subdivisions=3)
    b = bvhlib.build(
        m.positions, m.normals, m.indices, BuildOption.SAH_SPLIT_INTERVALS,
        max_leaf_size=4,
    )
    w = bvh8.collapse_sah(b, leaf_max=8)
    cc = w.nodes[:, 56:64].view(np.int32)
    assert int(cc[cc > 0].max()) <= 8
    g = bvh8.collapse(b, leaf_max=4)
    fill = lambda x: (x.nodes[:, 56:64].view(np.int32) != -1).sum() / x.num_nodes
    assert fill(w) > fill(g)

    sl = bvh8.to_slim(w, b.tri_normal)
    n = 512
    o = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32) * 3)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t0 = jnp.full((n,), 1e30, jnp.float32)
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    res = pk.traverse_packet_slim(
        o, d, t0, jnp.asarray(sl.nodes), jnp.asarray(sl.ltris), (0,),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(res[1]), np.asarray(bidx))
    np.testing.assert_allclose(
        np.asarray(res[0])[np.asarray(bidx) >= 0],
        np.asarray(bt)[np.asarray(bidx) >= 0], rtol=1e-5,
    )
