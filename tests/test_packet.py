"""Slim Pallas packet-traversal kernel vs the brute-force oracle.

Interpret mode exercises the kernel's semantics on CPU; compiled-mode
parity on the real chip is gated by tools/tpu_parity_gate.py (wired into
bench.py so every perf run re-proves correctness)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import bvh, bvh8, mesh
from cpugpupathtracing_tpu.ops import intersect
from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


@pytest.fixture(scope="module", params=[1, 8])
def sphere_slim(request):
    """(binary BVH, slim tables) -- leaf_stop 1 (thin SAH leaves) and 8
    (fat packet leaves) exercise both leaf occupancy extremes."""
    m = mesh.icosphere(subdivisions=2)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8,
                  leaf_stop=request.param)
    s = bvh8.to_slim(bvh8.collapse(b, leaf_max=8), b.tri_normal)
    return b, s


def _rays(rng_np, n):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 4
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _tables(s):
    return jnp.asarray(s.nodes), jnp.asarray(s.ltris)


def test_slim_matches_brute_force(sphere_slim, rng_np):
    b, s = sphere_slim
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, obj, normal, depth, _iid = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), interpret=True,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bidx))
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
    # bvh_depth is real on this kernel (the AOV the mr kernel zeroed):
    # every ray that hit descended at least once
    assert (np.asarray(depth)[np.asarray(hit) >= 0] >= 1).all()
    # shading-complete payload: the embedded flat normal matches the
    # binary tree's per-triangle v0.normal for every hit
    hm = np.asarray(hit) >= 0
    expect_n = b.tri_normal[np.asarray(hit)[hm]]
    normal3 = np.stack([np.asarray(c) for c in normal], axis=1)
    np.testing.assert_array_equal(normal3[hm], expect_n)


def test_slim_padding_and_active(sphere_slim, rng_np):
    """Non-multiple-of-tile ray counts are padded; inactive lanes are
    excluded from unions and report misses; active lanes stay exact."""
    b, s = sphere_slim
    n = 1500  # not a multiple of 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.asarray(rng_np.random(n) < 0.5)
    t, hit, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), active=act, interpret=True,
    )
    assert t.shape == (n,)
    inactive = ~np.asarray(act)
    assert (np.asarray(hit)[inactive] == -1).all()
    np.testing.assert_allclose(np.asarray(t)[inactive], RAY_TMAX)
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(hit)[a], np.asarray(bidx)[a])


def test_slim_any_hit_occlusion(sphere_slim, rng_np):
    b, s = sphere_slim
    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    _, h_near, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), interpret=True
    )
    _, h_any, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_any) >= 0, np.asarray(h_near) >= 0)


def test_slim_tmax(sphere_slim):
    b, s = sphere_slim
    o = jnp.tile(jnp.array([[0.11, 0.07, 5.0]]), (1024, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (1024, 1))
    t0 = jnp.concatenate([
        jnp.full((512,), 3.0, jnp.float32),   # tmax before the sphere
        jnp.full((512,), 10.0, jnp.float32),
    ])
    t, hit, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), interpret=True,
    )
    assert (np.asarray(hit)[:512] == -1).all()
    assert (np.asarray(hit)[512:] >= 0).all()


def test_slim_frame_stack_matches_linear(sphere_slim, rng_np):
    """The 9-slot frame-stack control scheme (frame_stack=True) must be
    bit-exact with the linear per-entry stack on hits: strict-< accepts
    make the closest hit visit-order independent, and only the push/pop
    mechanics differ (ops/traverse_packet_slim.py FSTACK)."""
    b, s = sphere_slim
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.asarray(rng_np.random(n) < 0.8)
    lin = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), active=act, interpret=True,
        frame_stack=False,
    )
    frm = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), active=act, interpret=True,
        frame_stack=True,
    )
    np.testing.assert_array_equal(np.asarray(frm[0]), np.asarray(lin[0]))
    np.testing.assert_array_equal(np.asarray(frm[1]), np.asarray(lin[1]))
    np.testing.assert_array_equal(np.asarray(frm[2]), np.asarray(lin[2]))
    for c_f, c_l in zip(frm[3], lin[3]):
        np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_l))
    # and against the oracle directly
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(frm[1])[a], np.asarray(bidx)[a])


def test_slim_multi_root(rng_np):
    """Two concatenated objects, both roots pre-seeded: nearest hit must
    win across objects (the fused IntersectScene contract)."""
    m1 = mesh.icosphere(subdivisions=1)
    m2 = mesh.cube(half=0.4)
    parts, roots, node_off, leaf_off, tri_off = [], [], 0, 0, 0
    ln, lt, li = [], [], []
    tv0, tv1, tv2 = [], [], []
    for oi, m in enumerate((m1, m2)):
        b = bvh.build(m.positions, m.normals, m.indices,
                      BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8,
                      leaf_stop=8)
        s = bvh8.to_slim(bvh8.collapse(b, leaf_max=8), b.tri_normal)
        nd = s.nodes.copy()
        cidx = nd[:, 48:56].view(np.int32)
        ccnt = nd[:, 56:64].view(np.int32)
        cidx[ccnt == 0] += node_off
        cidx[ccnt > 0] -= leaf_off
        ln.append(nd)
        lrec = s.ltris.copy()
        lv = lrec.view(np.int32)
        for k in range(8):
            lv[:, 16 * k + 12] = oi
            tid = lv[:, 16 * k + 13]
            tid[tid >= 0] += tri_off
        lt.append(lrec)
        roots.append(node_off)
        node_off += s.num_nodes
        leaf_off += s.num_leaf_rows
        tri_off += b.num_triangles
        tv0.append(b.tri_v0)
        tv1.append(b.tri_v1)
        tv2.append(b.tri_v2)
    nodes = jnp.asarray(np.concatenate(ln))
    ltris = jnp.asarray(np.concatenate(lt))
    v0 = np.concatenate(tv0)
    v1 = np.concatenate(tv1)
    v2 = np.concatenate(tv2)

    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, hobj, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, tuple(roots), interpret=True,
    )
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(v0), jnp.asarray(v1 - v0), jnp.asarray(v2 - v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bidx))
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)
    # frame-stack scheme: multi-root seeding uses whole 9-slot frames
    tf, hitf, _, _, _, _ = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, tuple(roots), interpret=True,
        frame_stack=True,
    )
    np.testing.assert_array_equal(np.asarray(hitf), np.asarray(bidx))
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(t))


def test_stack_bound_falls_back_to_wide(monkeypatch, rng_np):
    """The scene build validates the packet kernel's FIXED stack size
    against the tree depth (ADVICE r2) for BOTH stack schemes, and falls
    back to the wide traversal instead of silently corrupting the stack.
    The bounds are patched small to trigger the guard on a tiny scene."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene

    def build():
        s = Scene()
        white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
        s.add_mesh("ball", mesh.icosphere(subdivisions=2), white)
        return s

    # healthy bounds: packet path stays selected
    assert build().device().traversal == "packet"

    # linear scheme: slot bound too small
    monkeypatch.setattr(tps, "STACK", 8)
    dev_lin = build().device()
    assert dev_lin.traversal == "wide"
    monkeypatch.undo()

    # frame scheme: frame bound too small
    monkeypatch.setattr(tps, "FRAMESTACK_DEFAULT", True)
    monkeypatch.setattr(tps, "FSTACK_FRAMES", 2)
    dev_frm = build().device()
    assert dev_frm.traversal == "wide"
    monkeypatch.undo()

    # w16 forces the frame scheme even with FRAMESTACK_DEFAULT off;
    # the same frame bound guards it
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_TREE", "w16")
    dev16 = build().device()
    assert dev16.traversal == "packet" and dev16.packet_width == 16
    monkeypatch.setattr(tps, "FSTACK_FRAMES", 2)
    dev_frm = build().device()
    assert dev_frm.traversal == "wide"

    # the fallback snapshot still intersects correctly
    n = 1024
    o, d = _rays(rng_np, n)
    tmax = jnp.full((n,), RAY_TMAX, jnp.float32)
    h = intersect_scene(dev_frm, o, d, tmax)
    assert int((np.asarray(h.obj) >= 0).sum()) > 0


def test_ctz8_chain_matches_popcount():
    """The CPUGPU_CTZ_CHAIN compare-chain fallback must agree with the
    population_count ctz for every 8-bit mask (incl. mw == 0 -> 7)."""
    for mw in range(256):
        w = jnp.int32(mw)
        a = int(tps._ctz8(w, chain=False))
        b = int(tps._ctz8(w, chain=True))
        assert a == b, (mw, a, b)
        if mw:
            assert a == (mw & -mw).bit_length() - 1
        else:
            assert a == 7


def test_lab_fused_decode_matches_brute_force(rng_np):
    """The kernel-lab decode='fused' variant (unified node|leaf table,
    one dynamic load per row) must reproduce brute-force hits exactly,
    standalone and on top of the frame-stack control scheme."""
    from tools.kernel_lab import traverse_lab, fuse_tables

    m = mesh.icosphere(subdivisions=1)
    b = bvh.build(m.positions, m.normals, m.indices,
                  BuildOption.SAH_SPLIT_INTERVALS, max_leaf_size=8)
    s = bvh8.to_slim(bvh8.collapse(b, leaf_max=8), b.tri_normal)
    un, nn = fuse_tables(s.nodes, s.ltris)

    n = 1024
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    act = jnp.ones((n,), jnp.int32)
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    oc = (o[:, 0], o[:, 1], o[:, 2])
    dc = (d[:, 0], d[:, 1], d[:, 2])
    dummy = jnp.zeros((1, 128), jnp.float32)
    for opts in (
        dict(slab="ilv", leaf="ilv", order="fixed", decode="fused", nn=nn),
        dict(slab="ilv", leaf="ilv", ctrl="framestack", decode="fused",
             nn=nn),
    ):
        t, hit, obj, depth, _ = traverse_lab(
            oc, dc, t0, jnp.asarray(un), dummy, (0,), active=act,
            opts_t=tuple(sorted(opts.items())),
        )
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(bidx))
        np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def test_fused_tables_production_bitwise(rng_np, monkeypatch):
    """CPUGPU_FUSED unified-table decode must be bitwise identical to
    the split-table kernel through intersect_scene, incl. any-hit."""
    import dataclasses

    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    monkeypatch.setattr(scenelib, "PACKET_FUSED", True)

    s = scenelib.Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    s.add_mesh("ball", meshlib.icosphere(subdivisions=2), grey)
    s.add_plane("floor", (0.0, -2.0, 0.0), (0.0, 1.0, 0.0), grey)
    dev = s.device()
    assert dev.pfused is not None and dev.pfused_nn > 0
    dev0 = dataclasses.replace(dev, pfused=None, pfused_nn=0)

    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    h1 = scenelib.intersect_scene(dev, o, d, t0)
    h0 = scenelib.intersect_scene(dev0, o, d, t0)
    for name in ("t", "obj", "kind", "prim", "inst"):
        np.testing.assert_array_equal(
            np.asarray(getattr(h1, name)), np.asarray(getattr(h0, name)),
            err_msg=name,
        )
    # any-hit: only the occlusion FLAG is specified (which occluder is
    # found first is visit-order dependent, and order-shifting flags
    # like CPUGPU_PIPELINED may be layered on this test's env)
    a1 = scenelib.intersect_scene(dev, o, d, t0, any_hit=True)
    a0 = scenelib.intersect_scene(dev0, o, d, t0, any_hit=True)
    np.testing.assert_array_equal(
        np.asarray(a1.obj) >= 0, np.asarray(a0.obj) >= 0,
        err_msg="any-hit occlusion",
    )


def test_pipelined_body_matches_baseline(sphere_slim, rng_np):
    """The software-pipelined kernel body (pop + next-row load before
    the current slab/leaf) must match the baseline kernel exactly on
    t/tri/obj/normals for closest-hit and on occlusion for any-hit,
    under both control schemes.  bvh_depth is visit-order dependent
    (documented) and only sanity-checked."""
    from cpugpupathtracing_tpu.models.scene import _fuse_packet_tables

    b, s = sphere_slim
    nodes, ltris = _tables(s)
    fused = _fuse_packet_tables(nodes, ltris)
    nn = int(nodes.shape[0])
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)

    ref = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,),
                                   interpret=True)
    refa = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,),
                                    interpret=True, any_hit=True)
    for fs in (False, True):
        r = tps.traverse_packet_slim(
            o, d, t0, fused, ltris, (0,), interpret=True,
            fused_nn=nn, pipelined=True, frame_stack=fs,
        )
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(r[i]),
                                          np.asarray(ref[i]))
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(r[3][c]),
                                          np.asarray(ref[3][c]))
        hits = np.asarray(r[1]) >= 0
        assert (np.asarray(r[4])[hits] >= 1).all()
        ra = tps.traverse_packet_slim(
            o, d, t0, fused, ltris, (0,), interpret=True,
            fused_nn=nn, pipelined=True, frame_stack=fs, any_hit=True,
        )
        np.testing.assert_array_equal(np.asarray(ra[1]) >= 0,
                                      np.asarray(refa[1]) >= 0)


def test_nearest_frame_pop_matches_linear(sphere_slim, rng_np):
    """CPUGPU_NEAREST frame-pop order (argmin child first, from the
    frame word's spare bits) must keep hits bit-exact vs the linear
    stack, standalone and on the pipelined body."""
    from cpugpupathtracing_tpu.models.scene import _fuse_packet_tables

    b, s = sphere_slim
    nodes, ltris = _tables(s)
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    ref = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,),
                                   interpret=True)
    r = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), interpret=True,
        frame_stack=True, nearest=True,
    )
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(r[i]), np.asarray(ref[i]))
    fused = _fuse_packet_tables(nodes, ltris)
    nn = int(nodes.shape[0])
    rp = tps.traverse_packet_slim(
        o, d, t0, fused, ltris, (0,), interpret=True,
        fused_nn=nn, pipelined=True, frame_stack=True, nearest=True,
    )
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(rp[i]), np.asarray(ref[i]))


def test_interpret_count_iters(sphere_slim, rng_np):
    """count_iters must work in interpret mode (the tree lab's metric:
    tools/tree_lab.py): per-sub-tile counts land in the right slots
    across MULTIPLE grid steps (the interpret path blocks the SMEM
    output per step -- its CPU lowering has no program_id), and
    requesting counts must not perturb hits."""
    b, s = sphere_slim
    n = 2 * tps.GROUPS * tps.TILE  # two grid steps
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    ref = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), interpret=True,
    )
    res = tps.traverse_packet_slim(
        o, d, t0, *_tables(s), (0,), interpret=True, count_iters=True,
    )
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(res[i]), np.asarray(ref[i]))
    iters = np.asarray(res[-1])
    assert iters.shape == (n // tps.TILE,)
    # every sub-tile is fully active, so every slot (both grid steps)
    # must record at least one iteration
    assert (iters >= 1).all()


@pytest.mark.parametrize("mode", ["fat", "dp", "sweep", "sweep_dp", "w16"])
def test_packet_tree_variants_match_oracle(mode, rng_np, monkeypatch):
    """Every CPUGPU_PACKET_TREE device-tree variant (models/scene.py
    _build_wide_cache) must return brute-force-exact hits -- the tree
    reshape is an iteration-count lever only.  "w16" additionally
    exercises the width-16 node rows (entries at col 96, 17-slot
    frames, nearest-first pop default)."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_TREE", mode)
    sc = scenelib.Scene()
    sc.add_material(matlib.Material.diffuse((1.0, 1.0, 1.0)))
    m = mesh.icosphere(subdivisions=2)
    sc.add_mesh("ball", m, 0, BuildOption.SAH_SPLIT_INTERVALS)
    obj = sc.objects[0]
    cache = scenelib._build_wide_cache(obj)
    slim = cache[2]
    assert slim.width == (16 if mode == "w16" else 8)
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    t, hit, _obj, _nrm, _depth, _iid = tps.traverse_packet_slim(
        o, d, t0, jnp.asarray(slim.nodes), jnp.asarray(slim.ltris), (0,),
        interpret=True, width=slim.width,
    )
    b = obj.bvh
    bt, bidx = intersect.brute_force_nearest_triangle(
        o, d, jnp.asarray(b.tri_v0), jnp.asarray(b.tri_v1 - b.tri_v0),
        jnp.asarray(b.tri_v2 - b.tri_v0), t0,
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bidx))
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-5)


def test_width_table_mismatch_raises(rng_np, monkeypatch):
    """Passing a width-16 table to a width-8 decode (or vice versa)
    would read bounds columns as entries and traverse garbage -- the
    entry points must reject the mismatch loudly (this exact bug made
    an offline lab spin for hours on a w16 scene)."""
    from cpugpupathtracing_tpu.models import materials as matlib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models import scene as scenelib

    monkeypatch.setattr(scenelib, "PACKET_TREE", "w16")
    sc = scenelib.Scene()
    m = sc.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    sc.add_mesh("s", meshlib.icosphere(subdivisions=1), m)
    slim = scenelib._build_wide_cache(sc.objects[0])[2]
    assert slim.width == 16
    o, d = _rays(rng_np, 1024)
    t0 = jnp.full((1024,), RAY_TMAX, jnp.float32)
    with pytest.raises(ValueError, match="cols but width"):
        tps.traverse_packet_slim(
            o, d, t0, jnp.asarray(slim.nodes), jnp.asarray(slim.ltris),
            (0,), interpret=True,  # width defaults to 8
        )
    with pytest.raises(ValueError, match="cols but width"):
        tps.traverse_packet_slim(
            o, d, t0, jnp.asarray(slim.nodes[:, :64].copy()),
            jnp.asarray(slim.ltris), (0,), interpret=True, width=16,
        )


def test_cond_push_matches_linear(sphere_slim, rng_np):
    """CPUGPU_CONDPUSH (frame stores gated on the scalar pass mask)
    must keep hits bit-exact vs the linear stack, on the plain
    frame-stack body and on the pipelined one."""
    from cpugpupathtracing_tpu.models.scene import _fuse_packet_tables

    b, s = sphere_slim
    nodes, ltris = _tables(s)
    n = 2048
    o, d = _rays(rng_np, n)
    t0 = jnp.full((n,), RAY_TMAX, jnp.float32)
    ref = tps.traverse_packet_slim(o, d, t0, nodes, ltris, (0,),
                                   interpret=True)
    r = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), interpret=True,
        frame_stack=True, cond_push=True,
    )
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(r[i]), np.asarray(ref[i]))
    fused = _fuse_packet_tables(nodes, ltris)
    nn = int(nodes.shape[0])
    rp = tps.traverse_packet_slim(
        o, d, t0, fused, ltris, (0,), interpret=True,
        fused_nn=nn, pipelined=True, frame_stack=True, cond_push=True,
    )
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(rp[i]), np.asarray(ref[i]))
    # any-hit occlusion contract under the flag
    ra = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), interpret=True, any_hit=True,
        frame_stack=True, cond_push=True,
    )
    refa = tps.traverse_packet_slim(
        o, d, t0, nodes, ltris, (0,), interpret=True, any_hit=True,
    )
    np.testing.assert_array_equal(np.asarray(ra[1]) >= 0,
                                  np.asarray(refa[1]) >= 0)
