"""Renderer driver tests: accumulation semantics, reset policy, pause,
comparison stitching, debug bypass, checkpoint/resume."""

import numpy as np
import pytest

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    DebugRenderMode,
    RenderConfig,
    RenderMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import materials as matlib, mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene, make_reference_scene
from cpugpupathtracing_tpu.models.whitted import make_whitted_scene

W, H = 64, 36


def small_scene() -> Scene:
    s = Scene()
    grey = s.add_material(matlib.Material.diffuse((0.5, 0.5, 0.5)))
    light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
    s.add_mesh("cube", meshlib.cube(half=1.5), grey)
    s.add_plane("floor", (0.0, -3.0, 0.0), (0.0, 1.0, 0.0), grey)
    li = s.add_sphere("light", (8.0, 9.0, 7.0), 4.0, light)
    s.mark_light(li)
    return s


@pytest.fixture(scope="module")
def renderer():
    return Renderer(small_scene(), config=RenderConfig(width=W, height=H))


class TestProgressive:
    def test_accumulation_counts(self, renderer):
        renderer.reset()
        renderer.render(3)
        assert renderer.num_accumulated == 3
        img = renderer.image_u32()
        assert img.shape == (H, W)
        # something is lit
        assert (renderer.image_rgba8()[..., :3].sum(-1) > 0).mean() > 0.2

    def test_pixels_are_running_mean(self, renderer):
        renderer.reset()
        renderer.render(2)
        rad = renderer.radiance()
        acc = np.asarray(renderer._accumulator)
        np.testing.assert_allclose(
            rad.reshape(-1, 3), acc[:, :3] / 2.0, rtol=1e-6
        )

    def test_determinism_same_seed(self):
        a = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        b = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        a.render(2)
        b.render(2)
        np.testing.assert_array_equal(a.image_u32(), b.image_u32())

    def test_progressive_converges(self, renderer):
        """Variance of the running mean must shrink with accumulation."""
        renderer.reset()
        renderer.render_frame()
        first = renderer.radiance()
        renderer.render(15)
        converged = renderer.radiance()
        renderer.render(16)
        converged2 = renderer.radiance()
        d_early = np.abs(first - converged2).mean()
        d_late = np.abs(converged - converged2).mean()
        assert d_late < d_early * 0.7

    def test_spp_per_frame(self):
        r = Renderer(
            small_scene(),
            config=RenderConfig(width=W, height=H, samples_per_frame=4),
        )
        r.render_frame()
        assert r.num_accumulated == 4


class TestResetPolicy:
    def test_camera_move_resets(self, renderer):
        renderer.reset()
        renderer.render(2)
        renderer.move_camera((0.1, 0.0, 0.0))
        assert renderer.num_accumulated == 0

    def test_material_edit_resets(self, renderer):
        renderer.render(1)
        renderer.set_material(0, matlib.Material.diffuse((0.4, 0.4, 0.4)))
        assert renderer.num_accumulated == 0

    def test_settings_toggle_does_not_reset(self, renderer):
        """The reference quirk: NEE/cosine/RR/depth toggles keep the
        accumulator (Main.cpp:859-867 has no reset)."""
        renderer.reset()
        renderer.render(2)
        renderer.set_settings(
            renderer.settings.replace(next_event_estimation=False)
        )
        assert renderer.num_accumulated == 2
        renderer.set_settings(
            renderer.settings.replace(next_event_estimation=True)
        )

    def test_render_mode_change_resets(self, renderer):
        renderer.render(1)
        renderer.set_render_mode(RenderMode.BRUTE_FORCE)
        assert renderer.num_accumulated == 0
        renderer.set_render_mode(RenderMode.ADVANCED)

    def test_pause_skips_and_resets(self, renderer):
        renderer.render(2)
        renderer.set_paused(True)
        assert renderer.num_accumulated == 0
        renderer.render(3)
        assert renderer.num_accumulated == 0  # paused: no-ops
        renderer.set_paused(False)

    def test_debug_mode_change_keeps_accumulator(self, renderer):
        renderer.reset()
        renderer.render(2)
        renderer.set_debug_mode(DebugRenderMode.RAY_DEPTH)
        assert renderer.num_accumulated == 2
        renderer.set_debug_mode(DebugRenderMode.NONE)


class TestDebugModes:
    def test_debug_bypasses_accumulator(self, renderer):
        renderer.reset()
        renderer.render(2)
        acc_before = np.asarray(renderer._accumulator).copy()
        renderer.set_debug_mode(DebugRenderMode.BVH_DEPTH)
        renderer.render_frame()
        np.testing.assert_array_equal(
            acc_before, np.asarray(renderer._accumulator)
        )
        img = renderer.image_rgba8()
        # heatmap: green (misses) and red/green mix; green channel dominates
        assert img[..., 1].mean() > img[..., 2].mean()
        renderer.set_debug_mode(DebugRenderMode.NONE)


class TestComparisonMode:
    def test_halves_differ_in_estimator_but_converge(self):
        r = Renderer(
            small_scene(),
            config=RenderConfig(width=W, height=H),
            settings=RenderSettings(render_mode=RenderMode.COMPARISON),
        )
        r.render(20)
        rad = r.radiance()
        left = rad[:, : W // 2].mean()
        right = rad[:, W // 2 :].mean()
        # both halves lit; given the reference's swapped cosine pdf the
        # advanced half is brighter, but the scene is the same
        assert left > 0.0 and right > 0.0
        assert 0.2 < left / right < 5.0


class TestStats:
    def test_traced_rays_and_energy(self, renderer):
        renderer.reset()
        renderer.render_frame()
        assert renderer.stats.traced_rays >= W * H  # at least the primaries
        assert renderer.total_energy_received > 0.0
        assert renderer.mean_energy > 0.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        # fresh renderers: the shared fixture's scene was mutated by the
        # material-edit test, so its fingerprint differs from small_scene()
        renderer = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        renderer.render(3)
        img = renderer.image_u32().copy()
        p = str(tmp_path / "ckpt.npz")
        renderer.save_checkpoint(p)

        r2 = Renderer(
            small_scene(),
            config=RenderConfig(width=W, height=H),
        )
        assert r2.load_checkpoint(p)
        assert r2.num_accumulated == 3
        r2.render_frame()
        renderer.render_frame()
        np.testing.assert_array_equal(renderer.image_u32(), r2.image_u32())
        assert not np.array_equal(img, r2.image_u32())

    def test_settings_toggle_survives_reload(self, tmp_path):
        # settings toggles don't reset the live accumulator (reference
        # quirk, Main.cpp:859-875), so they must not invalidate a saved
        # checkpoint either: fingerprint covers scene/camera/config/
        # render mode only
        renderer = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        renderer.render(2)
        p = str(tmp_path / "ckpt.npz")
        renderer.save_checkpoint(p)
        r2 = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        r2.set_settings(
            r2.settings.replace(
                max_ray_depth=r2.settings.max_ray_depth + 1,
                next_event_estimation=not r2.settings.next_event_estimation,
            )
        )
        assert r2.load_checkpoint(p)
        assert r2.num_accumulated == 2

    def test_render_mode_change_invalidates(self, tmp_path):
        # a render-mode change resets the accumulator (Main.cpp:876-877)
        # and therefore invalidates the checkpoint
        renderer = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        renderer.render(1)
        p = str(tmp_path / "ckpt.npz")
        renderer.save_checkpoint(p)
        r2 = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        r2.set_render_mode(RenderMode.BRUTE_FORCE)
        assert not r2.load_checkpoint(p)

    def test_fingerprint_mismatch_resets(self, tmp_path, renderer):
        renderer.reset()
        renderer.render(2)
        p = str(tmp_path / "ckpt.npz")
        renderer.save_checkpoint(p)
        other = Renderer(
            make_whitted_scene(), config=RenderConfig(width=W, height=H)
        )
        assert not other.load_checkpoint(p)
        assert other.num_accumulated == 0


class TestWhittedMode:
    def test_whitted_renders(self):
        r = Renderer(
            make_whitted_scene(),
            camera=CameraConfig(pos=(0.0, 0.5, 8.0)),
            config=RenderConfig(width=W, height=H),
            settings=RenderSettings(render_mode=RenderMode.WHITTED, max_ray_depth=4),
        )
        r.render(2)
        img = r.image_rgba8()
        assert (img[..., :3].sum(-1) > 5).mean() > 0.1


class TestReferenceScene:
    def test_reference_scene_smoke(self):
        s = make_reference_scene(
            dragon_mesh=meshlib.icosphere(radius=2.0, subdivisions=2)
        )
        r = Renderer(s, config=RenderConfig(width=W, height=H))
        r.render(2)
        img = r.image_rgba8()
        assert (img[..., :3].sum(-1) > 0).mean() > 0.3
        assert r.stats.traced_rays > W * H


class TestConvergenceRMSE:
    """The reference's split-screen comparison oracle made quantitative:
    brute force and the advanced integrator (corrected pdfs, since the
    reference's swapped constants deliberately bias its own comparison)
    must converge to the same image."""

    def test_brute_vs_advanced_rmse(self):
        from cpugpupathtracing_tpu.config import DiffusePdfMode

        def render(mode, frames, **kw):
            r = Renderer(
                small_scene(),
                config=RenderConfig(width=48, height=27),
                settings=RenderSettings(
                    render_mode=mode,
                    diffuse_pdf_mode=DiffusePdfMode.CORRECT,
                    **kw,
                ),
            )
            r.render(frames)
            return r.radiance()

        a = render(RenderMode.BRUTE_FORCE, 96)
        b = render(RenderMode.ADVANCED, 96)

        # tone-map like the display pack, then average 3x3 pixel blocks
        # (16x effective spp) so Monte-Carlo noise doesn't mask bias
        def pool(x):
            x = np.clip(x, 0, 1)
            h, w, _ = x.shape
            return x.reshape(h // 3, 3, w // 3, 3, 3).mean((1, 3))

        rmse = float(np.sqrt(np.mean((pool(a) - pool(b)) ** 2)))
        assert rmse < 0.05, f"integrators diverge: RMSE {rmse:.4f}"


class TestPipelined:
    def test_pipelined_bitwise_equals_frame_loop(self):
        cfg = RenderConfig(width=W, height=H)
        r1 = Renderer(small_scene(), config=cfg)
        r1.render(3)
        r2 = Renderer(small_scene(), config=cfg)
        total = r2.render_pipelined(3)
        # same kernel, same per-frame accumulator feedback: the
        # deferred-sync loop must be bitwise invisible
        assert np.array_equal(np.asarray(r1._pixels), np.asarray(r2._pixels))
        assert total == r1.stats.total_traced_rays
        assert total == r2.stats.total_traced_rays
        assert r2.num_accumulated == r1.num_accumulated


class TestLiveEditors:
    """Sphere/plane scene-tree editors (Source/Primitives.cpp:385-415):
    edits rebuild the device snapshot and reset the accumulator."""

    def test_sphere_edit_resets_and_changes_image(self):
        r = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        r.render(2)
        before = r.image_u32().copy()
        r.set_sphere(2, (8.0, 2.0, 7.0), 2.0)  # move + shrink the light
        assert r.num_accumulated == 0
        r.render(2)
        after = r.image_u32()
        assert not np.array_equal(before, after)

    def test_plane_edit_resets(self):
        r = Renderer(small_scene(), config=RenderConfig(width=W, height=H))
        r.render(1)
        r.set_plane(1, (0.0, -2.0, 0.0), (0.0, 1.0, 0.0))
        assert r.num_accumulated == 0
        # the raised floor is visible in the next frame
        r.render(1)
        assert r.image_u32().shape == (H, W)

    def test_kind_mismatch_raises(self):
        s = small_scene()
        with pytest.raises(Exception):
            s.set_sphere(1, (0, 0, 0), 1.0)   # index 1 is the plane
        with pytest.raises(Exception):
            s.set_plane(2, (0, 0, 0), (0, 1, 0))  # index 2 is the sphere
