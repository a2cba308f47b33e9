"""TLAS / instancing tests: transformed instances vs baked-transform oracle."""

import numpy as np
import jax.numpy as jnp

from cpugpupathtracing_tpu.models import materials as matlib, mesh as meshlib
from cpugpupathtracing_tpu.models.scene import Scene, intersect_scene
from cpugpupathtracing_tpu.utils.vecmath import RAY_TMAX


def _transform(tx=0.0, ty=0.0, tz=0.0, scale=1.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.array(
        [
            [c * scale, 0.0, s * scale, tx],
            [0.0, scale, 0.0, ty],
            [-s * scale, 0.0, c * scale, tz],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    return m


def _bake(mesh, m4):
    pos = mesh.positions @ m4[:3, :3].T + m4[:3, 3]
    nrm_m = np.linalg.inv(m4[:3, :3]).T
    nrm = mesh.normals @ nrm_m.T
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    return meshlib.Mesh(pos.astype(np.float32), nrm.astype(np.float32), mesh.indices)


TRANSFORMS = [
    _transform(),
    _transform(tx=3.0, scale=0.5),
    _transform(tx=-3.0, ty=1.0, yaw=0.7),
    _transform(tz=-2.5, scale=1.5, yaw=-1.2),
]


def _rays(rng_np, n):
    o = rng_np.normal(size=(n, 3)).astype(np.float32) * 6.0
    aim = rng_np.normal(size=(n, 3)).astype(np.float32) * 2.0
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _scenes(traversal="skip"):
    base = meshlib.icosphere(subdivisions=2)
    inst = Scene(traversal=traversal)
    grey = inst.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    inst.add_instanced_mesh("spheres", base, grey, TRANSFORMS)

    baked = Scene()
    grey2 = baked.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    merged = _bake(base, TRANSFORMS[0])
    for m4 in TRANSFORMS[1:]:
        merged = merged.concat(_bake(base, m4))
    baked.add_mesh("merged", merged, grey2)
    return inst, baked


import pytest


class TestInstancing:
    @pytest.mark.parametrize("traversal", ["skip", "wide"])
    def test_hits_match_baked_oracle(self, rng_np, traversal):
        inst, baked = _scenes(traversal)
        di, db = inst.device(), baked.device()
        assert di.num_instances == 4
        o, d = _rays(rng_np, 1024)
        t_init = jnp.full((1024,), RAY_TMAX, jnp.float32)
        hi = intersect_scene(di, o, d, t_init)
        hb = intersect_scene(db, o, d, t_init)
        hit_i = np.asarray(hi.obj) >= 0
        hit_b = np.asarray(hb.obj) >= 0
        # baking transforms into vertices rounds differently than
        # transforming the ray at runtime; grazing silhouette rays may
        # land on a different triangle, so compare statistically
        assert (hit_i == hit_b).mean() > 0.995
        both = hit_i & hit_b
        assert both.sum() > 100
        rel = np.abs(np.asarray(hi.t)[both] - np.asarray(hb.t)[both]) / np.asarray(hb.t)[both]
        assert (rel < 2e-4).mean() > 0.99

    def test_normals_transformed(self, rng_np):
        from cpugpupathtracing_tpu.models.scene import hit_surface

        inst, baked = _scenes()
        di, db = inst.device(), baked.device()
        o, d = _rays(rng_np, 512)
        t_init = jnp.full((512,), RAY_TMAX, jnp.float32)
        hi = intersect_scene(di, o, d, t_init)
        hb = intersect_scene(db, o, d, t_init)
        _, ni, _ = hit_surface(di, hi, o, d)
        _, nb, _ = hit_surface(db, hb, o, d)
        m = (np.asarray(hi.obj) >= 0) & (np.asarray(hb.obj) >= 0)
        # same geometric normal (up to fp) wherever both agree on the hit
        same_tri = np.asarray(hi.t)[m]
        dotn = np.sum(np.asarray(ni)[m] * np.asarray(nb)[m], axis=1)
        assert (dotn > 0.999).mean() > 0.98

    def test_refit_moves_instance(self, rng_np):
        inst, _ = _scenes()
        di = inst.device()
        # ray at the instance translated to x=+3 (scale 0.5 icosphere)
        o = jnp.array([[3.0, 0.0, 8.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        t_init = jnp.full((1,), RAY_TMAX, jnp.float32)
        h1 = intersect_scene(di, o, d, t_init)
        assert int(h1.obj[0]) >= 0 and int(h1.inst[0]) == 1
        # move it far away; refit; the same ray must now miss
        inst.set_instance_transform(0, 1, _transform(tx=50.0, scale=0.5))
        d2 = inst.device()
        h2 = intersect_scene(d2, o, d, t_init)
        assert int(h2.obj[0]) < 0

    def test_end_to_end_render(self):
        from cpugpupathtracing_tpu.config import CameraConfig, RenderConfig
        from cpugpupathtracing_tpu.models.renderer import Renderer

        s = Scene()
        grey = s.add_material(matlib.Material.diffuse((0.6, 0.6, 0.6)))
        light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
        s.add_instanced_mesh(
            "cubes", meshlib.cube(half=0.8), grey,
            [_transform(tx=x) for x in (-2.5, 0.0, 2.5)],
        )
        s.add_plane("floor", (0.0, -2.0, 0.0), (0.0, 1.0, 0.0), grey)
        li = s.add_sphere("light", (6.0, 9.0, 7.0), 4.0, light)
        s.mark_light(li)
        r = Renderer(s, camera=CameraConfig(pos=(0.0, 0.5, 8.0)),
                     config=RenderConfig(width=64, height=36))
        r.render(2)
        img = r.image_rgba8()
        assert (img[..., :3].sum(-1) > 0).mean() > 0.3
