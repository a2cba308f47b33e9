"""RMSE gate: the jnp wavefront renderer vs the independent scalar port.

BASELINE.md's accuracy target is per-pixel agreement with the CPU
reference at equal spp.  tests/scalar_ref.py is that reference made
runnable: a pure-Python recursive port sharing nothing with the jnp code
(its own RNG, rejection sampling, vec math, linear scene intersection).
Both implementations estimate the same integral, so converged images must
agree to within Monte-Carlo noise; the gate is self-calibrating -- the
scalar port runs twice with independent seeds and the cross-implementation
RMSE must not exceed the scalar port's own seed-to-seed RMSE (any
systematic shading bias shows up as cross >> self).
"""

from __future__ import annotations

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    RenderConfig,
    RenderMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models.mesh import Mesh
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene

from tests import scalar_ref as sr

W, H = 8, 6
CAM_POS = (0.0, 0.0, 8.0)


def _quad_tris():
    """A 2x2 quad at z = -1.5 facing +z (two triangles, flat normal)."""
    v = [(-1.0, -0.5, -1.5), (1.0, -0.5, -1.5), (1.0, 1.5, -1.5), (-1.0, 1.5, -1.5)]
    n = (0.0, 0.0, 1.0)
    return [(v[0], v[1], v[2], n), (v[0], v[2], v[3], n)]


def _jnp_scene() -> Scene:
    s = Scene()
    m_grey = s.add_material(matlib.Material.diffuse((0.7, 0.7, 0.7)))
    m_blue = s.add_material(matlib.Material.diffuse((0.2, 0.3, 0.8)))
    m_glass = s.add_material(
        matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8, (0.1, 0.3, 0.3), 1.5)
    )
    m_light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 5.0))
    s.add_plane("ground", (0.0, -1.0, 0.0), (0.0, 1.0, 0.0), m_grey)
    s.add_sphere("blue", (-1.2, 0.0, 0.0), 1.0, m_blue)
    s.add_sphere("glass", (1.3, 0.0, 1.0), 0.9, m_glass)
    tris = _quad_tris()
    pos, idx, nrm = [], [], []
    for k, (a, b, c, n) in enumerate(tris):
        pos += [a, b, c]
        nrm += [n, n, n]
        idx += [3 * k, 3 * k + 1, 3 * k + 2]
    s.add_mesh(
        "quad",
        Mesh(
            positions=np.asarray(pos, np.float32),
            normals=np.asarray(nrm, np.float32),
            indices=np.asarray(idx, np.uint32),
        ),
        m_blue,
    )
    li = s.add_sphere("light", (3.0, 4.0, 3.0), 2.0, m_light)
    s.mark_light(li)
    return s


def _scalar_scene() -> sr.SceneS:
    s = sr.SceneS()
    grey = sr.Mat(albedo=(0.7, 0.7, 0.7))
    blue = sr.Mat(albedo=(0.2, 0.3, 0.8))
    glass = sr.Mat(albedo=(0.9, 0.9, 0.9), specular=0.1, refractivity=0.8,
                   absorption=(0.1, 0.3, 0.3), ior=1.5)
    light = sr.Mat(emissive=(1.0, 0.95, 0.8), intensity=5.0, is_light=True)
    s.objects.append(sr.Obj("plane", grey, point=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0)))
    s.objects.append(sr.Obj("sphere", blue, center=(-1.2, 0.0, 0.0), radius=1.0))
    s.objects.append(sr.Obj("sphere", glass, center=(1.3, 0.0, 1.0), radius=0.9))
    s.objects.append(sr.Obj("tris", blue, tris=_quad_tris()))
    s.objects.append(sr.Obj("sphere", light, center=(3.0, 4.0, 3.0), radius=2.0))
    s.lights.append(4)
    return s


def _render_jnp(mode: RenderMode, frames: int, spp: int) -> np.ndarray:
    r = Renderer(
        _jnp_scene(),
        camera=CameraConfig(pos=CAM_POS, aspect=W / H),
        config=RenderConfig(width=W, height=H, samples_per_frame=spp, seed=7),
        settings=RenderSettings(render_mode=mode),
    )
    r.render(frames)
    return r.radiance().astype(np.float64)


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.parametrize(
    "mode,scalar_mode,spp_scalar,frames",
    [
        (RenderMode.ADVANCED, "advanced", 500, 250),
        (RenderMode.BRUTE_FORCE, "brute", 500, 250),
    ],
)
def test_rmse_gate_vs_scalar_reference(mode, scalar_mode, spp_scalar, frames):
    sc = _scalar_scene()
    runs = [
        sr.render(sc, W, H, spp_scalar, cam_pos=CAM_POS, mode=scalar_mode, seed=sd)
        for sd in (11, 23, 37)
    ]
    img_j = _render_jnp(mode, frames, 4)   # frames * 4 spp

    # Self-noise floor from all seed pairs (MC noise is heavy-tailed
    # through the glass sphere; a single pair underestimates it).
    pair_rmse = [
        _rmse(runs[a], runs[b]) for a, b in ((0, 1), (0, 2), (1, 2))
    ]
    rmse_self = max(pair_rmse)                     # ~ sqrt(2) * sigma, upper
    s_mean = sum(runs) / len(runs)                 # sigma^2 / 3 per pixel
    rmse_cross = _rmse(s_mean, img_j)

    # Unbiased expectation: cross ~ sigma * sqrt(1/3 + spp_s/spp_j)
    # << rmse_self.  A systematic shading bias beyond the MC noise floor
    # fails this gate.
    assert rmse_cross <= rmse_self + 5e-3, (
        f"cross-implementation RMSE {rmse_cross:.4f} exceeds scalar "
        f"self-noise {rmse_self:.4f} (pairs {pair_rmse}): systematic bias "
        f"in the wavefront shading"
    )

    # Global energy agreement (mean pixel brightness) is far tighter than
    # per-pixel noise: sqrt(npix) averaging.
    mb_s = float(s_mean.mean())
    mb_j = float(img_j.mean())
    tol = 5.0 * rmse_self / np.sqrt(W * H) + 2e-3
    assert abs(mb_s - mb_j) <= tol, (
        f"mean brightness diverges: scalar {mb_s:.5f} vs jnp {mb_j:.5f} "
        f"(tol {tol:.5f})"
    )


def test_scalar_port_direct_light_analytic():
    """Tri-validation anchor: a single distant sphere light over a diffuse
    plane.  NEE-only contribution at the plane has a closed form the
    scalar port must reproduce: L = (NdotL / light_pdf) * brdf * emission
    with light_pdf = d^2 / (NLdotL * 2 pi r^2); averaged over visible-
    hemisphere light samples.  For a light far away (d >> r) this tends to
    brdf * emission * NdotL * (2 pi r^2 * <NLdotL>) / d^2 with <NLdotL>
    averaged over the sampled hemisphere (= 0.5 for a uniform hemisphere
    facing the receiver)."""
    s = sr.SceneS()
    grey = sr.Mat(albedo=(0.6, 0.6, 0.6))
    light = sr.Mat(emissive=(1.0, 1.0, 1.0), intensity=10.0, is_light=True)
    s.objects.append(sr.Obj("plane", grey, point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0)))
    s.objects.append(sr.Obj("sphere", light, center=(0.0, 100.0, 0.0), radius=1.0))
    s.lights.append(1)
    s.settings.max_ray_depth = 0   # direct light only (NEE at first vertex)
    s.settings.rr = False

    sr.seed_rng(3)
    n = 4000
    total = np.zeros(3)
    o = (0.0, 2.0, 0.5)
    d = sr.normalize((0.0, -1.0, 0.0))
    for _ in range(n):
        e = sr.trace_path_advanced(s, o, d)
        total += np.asarray(e)
    est = total / n

    # analytic: hit at (0,0,0.5); to-light distance ~ sqrt(100^2+0.5^2)
    hit = np.array([0.0, 0.0, 0.5])
    c = np.array([0.0, 100.0, 0.0])
    dvec = c - hit
    dist2 = float(dvec @ dvec)
    ndotl = float(dvec[1] / np.sqrt(dist2))      # normal (0,1,0)
    # <NLdotL> over uniform hemisphere facing receiver = 0.5 (cos avg),
    # area = 2 pi r^2; emission 10; brdf = albedo/pi; K lights = 1
    expected = (0.6 / np.pi) * 10.0 * ndotl * (0.5 * 2.0 * np.pi * 1.0) / dist2
    rel = abs(est[0] - expected) / expected
    assert rel < 0.08, f"scalar NEE estimate {est[0]:.6f} vs analytic {expected:.6f}"
