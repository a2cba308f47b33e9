"""Whole-frame Whitted kernel parity (ops/whitted_kernel.py).

The kernel replicates trace_whitted's predicates, epsilons, and RNG
draws op for op, so rng state and the traced counter (which depend only
on hit/want masks whose inputs are bit-identical) must match EXACTLY.
Energy is compared under the megakernel contract (tests/test_megakernel
has the full rationale): the two programs are shaped differently, so
XLA:CPU / Mosaic codegen may fuse multiply-adds differently, giving
last-ulp energy diffs everywhere and, on shadow rays that graze an
occluder's silhouette (d2 ~ r^2), an occlusion flip worth one light's
attenuated contribution.  We assert tight agreement outside flips,
a small flip fraction, and flip magnitude bounded by a single far-light
term.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cpugpupathtracing_tpu.config import CameraConfig, RenderConfig, RenderSettings, RenderMode
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models.scene import Scene, whitted_kernel_active
from cpugpupathtracing_tpu.models.whitted import (
    make_whitted_scene,
    trace_whitted,
    trace_whitted_kernel,
)
from cpugpupathtracing_tpu.utils import rng as rnglib

SETTINGS = RenderSettings(render_mode=RenderMode.WHITTED)


def _trace(dev, settings, fn, w=64, h=32):
    n = w * h
    cam = camlib.to_arrays(CameraConfig(pos=(0.0, 0.5, 8.0), aspect=w / h))
    lane = jnp.arange(n, dtype=jnp.uint32)
    o, d = camlib.lane_rays(cam, lane, w, h)
    state = rnglib.seed_lanes(lane, jnp.uint32(0), salt=0x1CE)
    return fn(dev, settings, o, d, state, idx=None)


def _check(ref_out, got_out):
    (st_ref, ref), (st_got, got) = ref_out, got_out
    assert int(ref.traced_rays) == int(got.traced_rays)
    np.testing.assert_array_equal(np.asarray(st_ref), np.asarray(st_got))
    ea = np.asarray(ref.energy)
    em = np.asarray(got.energy)
    diff = np.abs(ea - em)
    # outside occlusion flips: codegen-ulp agreement only
    flips = (diff > 3e-6 + 3e-5 * np.abs(ea)).any(axis=1)
    assert flips.mean() < 0.01, f"{flips.sum()} lanes beyond boundary flips"
    # each flip is one grazing light's ndotl*atten*emission term
    assert diff.max() < 0.05, f"flip magnitude {diff.max():.4f} not silhouette-sized"


def test_config1_scene():
    dev = make_whitted_scene().device()
    _check(
        _trace(dev, SETTINGS, trace_whitted),
        _trace(dev, SETTINGS, trace_whitted_kernel),
    )


def test_padding():
    # 40x30 = 1200 lanes: not a BLOCK multiple, exercises the pad path
    dev = make_whitted_scene().device()
    _check(
        _trace(dev, SETTINGS, trace_whitted, w=40, h=30),
        _trace(dev, SETTINGS, trace_whitted_kernel, w=40, h=30),
    )


def test_many_lights():
    # 5 lights: the XLA path takes its batched (L*N) shadow branch,
    # the kernel still unrolls per light -- same contract either way
    s = make_whitted_scene()
    light = s.add_material(matlib.Material.light((0.9, 1.0, 0.85), 60.0))
    for i, c in enumerate([(0.0, 9.0, 6.0), (7.0, 5.0, -5.0), (-6.0, 7.0, 5.0)]):
        li = s.add_sphere(f"extra light{i}", c, 0.3, light)
        s.mark_light(li)
    dev = s.device()
    assert dev.num_lights == 5
    _check(
        _trace(dev, SETTINGS, trace_whitted),
        _trace(dev, SETTINGS, trace_whitted_kernel),
    )


def test_depth_cap():
    dev = make_whitted_scene().device()
    st = SETTINGS.replace(max_ray_depth=2)
    _check(
        _trace(dev, st, trace_whitted),
        _trace(dev, st, trace_whitted_kernel),
    )


def test_gate():
    dev = make_whitted_scene().device()
    # CPU backend: inactive unless forced
    assert not whitted_kernel_active(dev, SETTINGS)
    import os

    os.environ["CPUGPU_FORCE_WHITTED_KERNEL"] = "1"
    try:
        assert whitted_kernel_active(dev, SETTINGS)
        # AOVs (debug modes) keep the reference-shaped path
        assert not whitted_kernel_active(
            dev, SETTINGS.replace(track_aovs=True)
        )
        # mesh scenes are ineligible
        from cpugpupathtracing_tpu.models import mesh as meshlib

        s = make_whitted_scene()
        white = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
        s.add_mesh("ball", meshlib.icosphere(subdivisions=0), white)
        assert not whitted_kernel_active(s.device(), SETTINGS)
    finally:
        del os.environ["CPUGPU_FORCE_WHITTED_KERNEL"]


def test_renderer_routing(monkeypatch):
    # through the Renderer: forced kernel vs XLA path; traced counts are
    # exact, pixels may differ by tonemapped occlusion flips on a few
    # shadow-silhouette pixels
    from cpugpupathtracing_tpu.models.renderer import Renderer

    cfg = RenderConfig(width=48, height=32)
    cam = CameraConfig(pos=(0.0, 0.5, 8.0), aspect=1.5)

    def render_px(force):
        if force:
            monkeypatch.setenv("CPUGPU_FORCE_WHITTED_KERNEL", "1")
        else:
            monkeypatch.delenv("CPUGPU_FORCE_WHITTED_KERNEL", raising=False)
        r = Renderer(make_whitted_scene(), camera=cam, config=cfg, settings=SETTINGS)
        r.render(2)
        return r.image_rgba8(), r.stats.traced_rays

    px_ref, tr_ref = render_px(False)
    px_got, tr_got = render_px(True)
    assert tr_ref == tr_got
    d = np.abs(px_ref.astype(np.int32) - px_got.astype(np.int32))
    assert (d > 0).mean() < 0.01, f"{(d > 0).sum()} channels differ"
    assert d.max() <= 8, f"pixel diff {d.max()} beyond a tonemapped flip"
