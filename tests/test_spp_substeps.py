"""Multi-spp frames run as pipelined 1-spp sub-dispatches (round-4
config-4 closure): same RNG streams -> identical traced-ray counts;
the image differs from the spp-unrolled program only by accumulator
fp add order (see Renderer._spp_substeps)."""

import os

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    DebugRenderMode,
    RenderConfig,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene


def _scene() -> Scene:
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    light = s.add_material(matlib.Material.light((1.0, 1.0, 1.0), 10.0))
    s.add_mesh("cube", meshlib.cube(half=1.5), grey)
    s.add_plane("floor", (0.0, -3.0, 0.0), (0.0, 1.0, 0.0), grey)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s


def _run(monkeypatch, unroll: bool, **settings):
    if unroll:
        monkeypatch.setenv("CPUGPU_SPP_UNROLL", "1")
    else:
        monkeypatch.delenv("CPUGPU_SPP_UNROLL", raising=False)
    r = Renderer(
        _scene(), camera=CameraConfig(),
        config=RenderConfig(width=64, height=32, samples_per_frame=4),
        settings=RenderSettings(**settings),
    )
    r.render_frame()
    traced = r.stats.traced_rays
    r.render_frame()
    return r, np.asarray(r.radiance()), traced


def test_substeps_match_unrolled(monkeypatch):
    r_sub, img_sub, tr_sub = _run(monkeypatch, unroll=False)
    r_un, img_un, tr_un = _run(monkeypatch, unroll=True)
    assert r_sub.num_accumulated == r_un.num_accumulated == 8
    # identical per-sample RNG streams -> identical control flow
    assert tr_sub == tr_un
    # only accumulator fp add order differs
    np.testing.assert_allclose(img_sub, img_un, atol=1e-5, rtol=1e-5)


def test_debug_modes_keep_unrolled_pixels(monkeypatch):
    """Debug AOV pixels average the CURRENT frame over all spp; the
    substep split would narrow them to the last sample, so debug modes
    must keep the unrolled program."""
    monkeypatch.delenv("CPUGPU_SPP_UNROLL", raising=False)
    r = Renderer(
        _scene(), camera=CameraConfig(),
        config=RenderConfig(width=32, height=16, samples_per_frame=4),
        settings=RenderSettings(debug_render_mode=DebugRenderMode.RAY_DEPTH),
    )
    assert not r._spp_substeps(4)
    r.render_frame()
    assert r.num_accumulated == 4
