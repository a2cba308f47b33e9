"""Seeded random-scene fuzz: full scene dispatch vs an independent oracle.

The fixed-scene parity tests (test_traverse/test_packet/test_instances)
pin each traversal against brute force on hand-built geometry; this file
fuzzes the STRUCTURAL space instead -- degenerate triangles, elongated
meshes with lopsided BVHs, many-object scenes with multi-root packet
tables, random affine instancing -- and checks `intersect_scene`'s full
dispatch (whatever path the scene picks, plus the packet kernel forced
in interpret mode) against an oracle built purely from the HOST-side
scene description in numpy: world-space triangle soup brute force +
direct analytic prim tests.  Everything is seeded and deterministic.
Oracle parity contract mirrors test_traverse: exact hit existence,
t to fp tolerance (op order differs between implementations).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import BuildOption
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene, packet_path_active
from cpugpupathtracing_tpu.ops import intersect
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX

N_RAYS = 512


def _soup(rng, n_tris, spread=3.0, degenerate=0):
    """Random triangle soup; `degenerate` of them have v1 == v0 (zero
    area -- the Möller-Trumbore det epsilon must reject, never NaN)."""
    v0 = rng.normal(size=(n_tris, 3)).astype(np.float32) * spread
    v1 = v0 + rng.normal(size=(n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(n_tris, 3)).astype(np.float32)
    if degenerate:
        v1[:degenerate] = v0[:degenerate]
    pos = np.stack([v0, v1, v2], axis=1).reshape(-1, 3)
    idx = np.arange(n_tris * 3, dtype=np.uint32)
    e1, e2 = v1 - v0, v2 - v0
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = (nrm / np.where(ln > 0, ln, 1.0)).astype(np.float32)
    normals = np.repeat(nrm, 3, axis=0)
    return meshlib.Mesh(pos, normals, idx)


def _rays(rng, n=N_RAYS, spread=6.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * spread
    aim = rng.normal(size=(n, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def _world_tris(scene):
    """Every world-space triangle in the scene, instancing applied in
    straight numpy (independent of the device tables)."""
    tris = []
    for obj in scene.objects:
        if obj.bvh is None:
            continue
        v = np.stack(
            [np.asarray(obj.bvh.tri_v0, np.float32),
             np.asarray(obj.bvh.tri_v1, np.float32),
             np.asarray(obj.bvh.tri_v2, np.float32)],
            axis=1,
        )  # (T, 3, 3)
        if obj.instances is not None:
            for m in np.asarray(obj.instances, np.float32):
                vw = v @ m[:3, :3].T + m[:3, 3]
                tris.append(vw.astype(np.float32))
        else:
            tris.append(v)
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(tris)


def _oracle_t(scene, o, d):
    """Nearest-hit t across every primitive, from the host description."""
    n = o.shape[0]
    best = np.full(n, np.float32(RAY_TMAX))
    v = _world_tris(scene)
    if v.shape[0]:
        bt, bidx = intersect.brute_force_nearest_triangle(
            o, d, jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1] - v[:, 0]),
            jnp.asarray(v[:, 2] - v[:, 0]),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )
        bt, bidx = np.asarray(bt), np.asarray(bidx)
        best = np.where(bidx >= 0, bt, best)
    for obj in scene.objects:
        if obj.sphere is not None:
            c, r = obj.sphere
            ok, t = intersect.intersect_sphere(
                o, d, jnp.asarray(np.asarray(c, np.float32)),
                jnp.float32(np.float32(r) * np.float32(r)),
            )
            t = np.asarray(t)
            best = np.minimum(best, np.where(np.asarray(ok), t, RAY_TMAX))
        if obj.plane is not None:
            p, nn = obj.plane
            ok, t = intersect.intersect_plane(
                o, d, jnp.asarray(np.asarray(p, np.float32)),
                jnp.asarray(np.asarray(nn, np.float32)),
            )
            t = np.asarray(t)
            best = np.minimum(best, np.where(np.asarray(ok), t, RAY_TMAX))
    return best


def _check_scene(scene, seed, force_packet, monkeypatch):
    if force_packet:
        monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    else:
        monkeypatch.delenv("CPUGPU_TPU_FORCE_PACKET", raising=False)
    jax.clear_caches()  # the env flag is read at trace time
    dev = scene.device()
    if force_packet and not packet_path_active(dev):
        pytest.skip("scene fell back off the packet path")
    rng = np.random.default_rng(seed)
    o, d = _rays(rng)
    t0 = jnp.full((N_RAYS,), RAY_TMAX, jnp.float32)

    hit = intersect_scene(dev, o, d, t0, count_depth=False)
    got_t = np.asarray(hit.t)
    got_hit = np.asarray(hit.obj) >= 0

    want_t = _oracle_t(scene, o, d)
    want_hit = want_t < RAY_TMAX

    np.testing.assert_array_equal(got_hit, want_hit)
    np.testing.assert_allclose(
        got_t[want_hit], want_t[want_hit], rtol=1e-4, atol=1e-5
    )

    # any-hit must agree with nearest-hit existence at full tmax
    sh = intersect_scene(dev, o, d, t0, any_hit=True, count_depth=False)
    np.testing.assert_array_equal(np.asarray(sh.obj) >= 0, want_hit)

    # occlusion-specialized tables (CPUGPU_OCCL, bvh8.to_slim_occl):
    # mesh-only occluded bit vs the triangle oracle under mixed tmax.
    # The kernel's Moller-Trumbore is bit-identical to the brute-force
    # oracle's (test_packet pins exact hit-index equality), so accept
    # predicates agree exactly at any shared tmax cut.
    import cpugpupathtracing_tpu.models.scene as scenelib
    from cpugpupathtracing_tpu.ops import traverse_packet_slim as tps

    monkeypatch.setattr(scenelib, "PACKET_OCCL", True)
    monkeypatch.setenv("CPUGPU_TPU_FORCE_PACKET", "1")
    scene._device = None
    occ = scenelib.occl_tables(scene.device())
    if occ is not None:
        onodes, oltris, oroots, oents = occ
        v = _world_tris(scene)
        tmax = jnp.asarray(np.where(
            rng.random(N_RAYS) < 0.5, rng.uniform(0.5, 8.0, N_RAYS),
            RAY_TMAX,
        ).astype(np.float32))
        _, h_occ, *_ = tps.traverse_packet_slim(
            o, d, tmax, onodes, oltris, oroots,
            any_hit=True, occl=True, count_depth=False, interpret=True,
        )
        _, bidx = intersect.brute_force_nearest_triangle(
            o, d, jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1] - v[:, 0]),
            jnp.asarray(v[:, 2] - v[:, 0]), tmax,
        )
        np.testing.assert_array_equal(
            np.asarray(h_occ) >= 0, np.asarray(bidx) >= 0
        )


def _scene_soup(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    s.add_mesh("soup", _soup(rng, 200, degenerate=20), white,
               BuildOption.SAH_SPLIT_INTERVALS)
    s.add_sphere("s0", rng.normal(size=3) * 2, 1.2, white)
    s.add_sphere("tiny", rng.normal(size=3), 0.01, white)
    s.add_plane("floor", (0.0, -4.0, 0.0), (0.0, 1.0, 0.0), white)
    s.add_plane("tilt", (5.0, 0.0, 0.0), tuple(
        (lambda v: v / np.linalg.norm(v))(rng.normal(size=3))
    ), white)
    return s


def _scene_elongated(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    ico = meshlib.icosphere(subdivisions=2)
    stretched = meshlib.Mesh(
        (ico.positions * np.array([8.0, 0.25, 0.5], np.float32)),
        ico.normals, ico.indices,
    )
    s.add_mesh("needle", stretched, white, BuildOption.NAIVE_SPLIT)
    s.add_mesh("soup", _soup(rng, 60, spread=1.5), white,
               BuildOption.SAH_SPLIT_INTERVALS)
    s.add_sphere("s", (0.0, 2.0, 0.0), 1.0, white)
    return s


def _scene_instanced(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    mats = []
    for _ in range(5):
        # random rotation (QR of a random matrix, det forced +) + scale
        q, _r = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = (q * rng.uniform(0.4, 1.6)).astype(np.float32)
        m[:3, 3] = rng.normal(size=3).astype(np.float32) * 3
        mats.append(m)
    s.add_instanced_mesh(
        "icos", meshlib.icosphere(subdivisions=1), white, np.stack(mats)
    )
    s.add_plane("floor", (0.0, -5.0, 0.0), (0.0, 1.0, 0.0), white)
    return s


def _scene_many_objects(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
    for i in range(12):
        c = rng.normal(size=3).astype(np.float32) * 4
        ico = meshlib.icosphere(subdivisions=0)
        m = meshlib.Mesh(ico.positions * 0.7 + c, ico.normals, ico.indices)
        s.add_mesh(f"m{i}", m, white,
                   BuildOption.SAH_SPLIT_INTERVALS if i % 2 else BuildOption.NAIVE_SPLIT)
    for i in range(6):
        s.add_sphere(f"s{i}", rng.normal(size=3) * 3, float(rng.uniform(0.2, 1.0)), white)
    return s


SCENES = {
    "soup": _scene_soup,
    "elongated": _scene_elongated,
    "instanced": _scene_instanced,
    "many_objects": _scene_many_objects,
}


SEEDS = {"soup": 240, "elongated": 512, "instanced": 777, "many_objects": 901}


@pytest.mark.parametrize("name", sorted(SCENES))
@pytest.mark.parametrize(
    "force_packet",
    [False, pytest.param(True, marks=pytest.mark.slow)],
    ids=["default", "packet"],
)  # the interpret-mode packet arm is the expensive half: nightly tier
def test_fuzz(name, force_packet, monkeypatch):
    seed = SEEDS[name]
    _check_scene(SCENES[name](seed), seed * 7 + 1, force_packet, monkeypatch)
