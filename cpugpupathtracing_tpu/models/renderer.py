"""Progressive renderer: the frame driver and interactive-equivalent API.

Replaces the reference's Render() tile dispatch + main-loop glue
(Source/Main.cpp:691-755, :825-942) and its ImGui-side mutation handlers:
one jitted frame function traces every pixel (optionally several samples)
and accumulates into a device-resident framebuffer; the Renderer object
owns the live-mutable state (camera, settings, materials, BVH heuristic,
pause) and reproduces the reference's accumulator-invalidation policy:

  reset on camera movement (Main.cpp:292-296), material edits
  (Main.cpp:263-265), render-mode change (Main.cpp:876-877), and the
  pause toggle (Main.cpp:851-854).  Settings toggles (max depth, NEE,
  cosine, RR) do NOT reset in the reference -- new samples just blend in
  -- and that quirk is preserved (call reset() explicitly if unwanted).

Statistics mirror the stats panel (Main.cpp:841-857): per-frame traced
rays, accumulated-frame count, and mean energy per accumulated frame
(total_energy_received accumulates sum(rgb) * 0.001 per sample,
Main.cpp:735, in float64 on host).

Checkpoint/resume (SURVEY.md section 5): the progressive state is exactly
(accumulator, num_accumulated, sample counter); save/load round-trips it
through .npz with a scene/settings fingerprint that invalidates stale
checkpoints -- strictly more capable than the reference, which loses the
accumulator on exit.
"""

from __future__ import annotations

import functools
import hashlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    DebugRenderMode,
    RenderConfig,
    RenderMode,
    RenderSettings,
)
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import integrators
from cpugpupathtracing_tpu.models.materials import Material
from cpugpupathtracing_tpu.models.scene import DeviceScene, Scene
from cpugpupathtracing_tpu.utils import image as imagelib
from cpugpupathtracing_tpu.utils import rng as rnglib
from cpugpupathtracing_tpu.utils.log import log_info, log_warn
from cpugpupathtracing_tpu.utils.vecmath import vec4_to_uint


def trace_sample(dev, settings, origin, direction, state, idx):
    """One sample over prepared rays: the render-mode dispatch shared by
    the single-chip frame kernel and the sharded per-chip bodies
    (parallel/sharding.py), so both run the identical integrator +
    packet + wavefront-sorting code.  COMPARISON splits the frame and is
    handled by the caller."""
    from cpugpupathtracing_tpu.models.scene import (
        megakernel_active,
        pt_frame_active,
    )

    if settings.render_mode == RenderMode.BRUTE_FORCE:
        fn = integrators.trace_brute
    elif settings.render_mode == RenderMode.ADVANCED:
        if (
            pt_frame_active(dev, settings)
            and settings.debug_render_mode == DebugRenderMode.NONE
        ):
            fn = integrators.trace_advanced_frame
        elif (
            megakernel_active(dev, settings)
            and settings.debug_render_mode == DebugRenderMode.NONE
        ):
            fn = integrators.trace_advanced_mega
        else:
            fn = integrators.trace_advanced
    elif settings.render_mode == RenderMode.WHITTED:
        from cpugpupathtracing_tpu.models.scene import whitted_kernel_active
        from cpugpupathtracing_tpu.models.whitted import (
            trace_whitted,
            trace_whitted_kernel,
        )

        if whitted_kernel_active(dev, settings):
            fn = trace_whitted_kernel
        else:
            fn = trace_whitted
    else:
        raise ValueError(f"unknown render mode {settings.render_mode}")
    return integrators.trace_chunked(
        fn, dev, settings, origin, direction, state, idx=idx
    )


def _guarded_frame_kernel(dev, *args):
    """render_frame_kernel with a one-time fallback: if a whole-frame
    kernel (Whitted analytic, or the advanced path-tracing kernel) is
    what we are about to compile and Mosaic rejects it, disable it
    process-wide (scene.disable_whitted_kernel /
    scene.disable_pt_frame_kernel) and re-trace on the fallback path
    instead of failing every frame.  Both kernels have interpret-mode
    coverage but compile on the real chip only in production; a new
    Mosaic version must never take the renderer down."""
    try:
        return render_frame_kernel(dev, *args)
    except Exception as exc:  # pragma: no cover - chip-compiler only
        from cpugpupathtracing_tpu.models.scene import (
            disable_pt_frame_kernel,
            disable_whitted_kernel,
            pt_frame_active,
            whitted_kernel_active,
        )

        settings = args[4]
        if (
            settings.render_mode == RenderMode.WHITTED
            and whitted_kernel_active(dev, settings)
        ):
            log_warn(
                "Renderer",
                "whole-frame Whitted kernel failed to compile; "
                "falling back to the XLA path: {}", exc,
            )
            disable_whitted_kernel()
        elif (
            settings.render_mode == RenderMode.ADVANCED
            and pt_frame_active(dev, settings)
        ):
            log_warn(
                "Renderer",
                "whole-frame PT kernel failed to compile; falling back "
                "to the per-depth megakernels: {}", exc,
            )
            disable_pt_frame_kernel()
        else:
            raise
        jax.clear_caches()
        return render_frame_kernel(dev, *args)


@functools.partial(
    jax.jit,
    static_argnames=("settings", "width", "height", "spp", "seed"),
    keep_unused=True,
)
def render_frame_kernel(
    dev: DeviceScene,
    cam: camlib.CameraArrays,
    accumulator,      # (H*W, 4) f32 running sum
    sample_base,      # () i32 global sample counter (RNG stream selector)
    lane,             # (H*W,) u32 lane indices (passed in: keeps iota
                      # constants out of the executable, see camera.lane_rays)
    settings: RenderSettings,
    width: int,
    height: int,
    spp: int,
    seed: int,
):
    """One progressive frame: spp samples per pixel, accumulated.

    Returns (accumulator', pixels_u32 (H*W,), traced_rays, energy_sum).
    Debug render modes bypass accumulation exactly like the reference
    (Main.cpp:738-746): pixels show the current frame, the accumulator
    still exists untouched.
    """
    n = width * height
    # pixel-block ray order: coherent packets for the Pallas traversal;
    # RNG keys on the true pixel index, so the image is bitwise identical
    # to row-major order. Comparison mode keeps row-major (its halves
    # split by contiguous columns).
    bs = camlib.block_shape(width, height)
    if bs is not None and settings.render_mode != RenderMode.COMPARISON:
        bh, bw = bs
        origin, direction, pix = camlib.blocked_lane_rays(
            cam, lane, width, height, bh, bw
        )
    else:
        bs = None
        origin, direction = camlib.lane_rays(cam, lane, width, height)
        pix = lane

    frame_energy = jnp.zeros((n, 3), jnp.float32)
    traced = jnp.zeros((), jnp.int32)
    # lane identity for ray reordering (a device argument, not an
    # embedded iota -- see the lane parameter's rationale above).
    # CPUGPU_NO_SORT=1 disables wavefront sorting (profiling A/B only).
    # NOTE: read at TRACE time -- the flag must be set before the first
    # compile of this frame shape; flipping it later hits the jit cache.
    import os as _os

    lane_idx = (
        None if _os.environ.get("CPUGPU_NO_SORT") == "1" else lane.astype(jnp.int32)
    )

    for s in range(spp):
        stream = (sample_base + s).astype(jnp.uint32)
        state = rnglib.seed_lanes(pix, stream, salt=seed & 0xFFFFFFFF)
        if settings.render_mode == RenderMode.COMPARISON:
            # split screen: left half brute force, right half advanced
            # (Main.cpp:719-725).  Rays are regrouped into contiguous
            # halves so each integrator runs a dense batch.
            half = width // 2
            o2 = origin.reshape(height, width, 3)
            d2 = direction.reshape(height, width, 3)
            s2 = state.reshape(height, width)
            lo = o2[:, :half].reshape(-1, 3)
            ld = d2[:, :half].reshape(-1, 3)
            ls = s2[:, :half].reshape(-1)
            ro = o2[:, half:].reshape(-1, 3)
            rd = d2[:, half:].reshape(-1, 3)
            rs = s2[:, half:].reshape(-1)
            _, res_l = integrators.trace_chunked(integrators.trace_brute, dev, settings, lo, ld, ls)
            _, res_r = integrators.trace_chunked(integrators.trace_advanced, dev, settings, ro, rd, rs)
            energy = jnp.concatenate(
                [
                    res_l.energy.reshape(height, half, 3),
                    res_r.energy.reshape(height, width - half, 3),
                ],
                axis=1,
            ).reshape(-1, 3)
            traced = traced + res_l.traced_rays + res_r.traced_rays
        else:
            _, res = trace_sample(
                dev, settings, origin, direction, state, lane_idx
            )
            energy, traced = res.energy, traced + res.traced_rays
        frame_energy = frame_energy + energy

    if bs is not None:
        frame_energy = camlib.unblock_image(frame_energy, width, height, bh, bw)

    energy_sum = jnp.sum(frame_energy, dtype=jnp.float32) * 0.001

    sample = jnp.concatenate(
        [frame_energy, jnp.full((n, 1), float(spp), jnp.float32)], axis=1
    )
    if settings.debug_render_mode == DebugRenderMode.NONE:
        accumulator = accumulator + sample
        num = accumulator[:, 3:4]
        pixels = vec4_to_uint(accumulator / jnp.maximum(num, 1.0))
    else:
        pixels = vec4_to_uint(sample / float(spp))
    return accumulator, pixels, traced, energy_sum


class Statistics:
    """Stats panel counters (Source/Main.cpp:218-226, :841-857)."""

    def __init__(self):
        self.traced_rays = 0          # last frame
        self.total_traced_rays = 0
        self.frame_time_ms = 0.0
        self.fps = 0.0

    def reset(self):
        self.traced_rays = 0


class Renderer:
    """Progressive path-tracing renderer with live-editable state."""

    def __init__(
        self,
        scene: Scene,
        camera: CameraConfig | None = None,
        config: RenderConfig | None = None,
        settings: RenderSettings | None = None,
    ):
        self.scene = scene
        self.camera = camera or CameraConfig()
        self.config = config or RenderConfig()
        self.settings = settings or RenderSettings()
        self.pause_rendering = False
        self.stats = Statistics()
        self.num_accumulated = 0
        self.total_energy_received = 0.0  # float64 host accumulation
        self._sample_counter = 0
        n = self.config.width * self.config.height
        self._accumulator = jnp.zeros((n, 4), jnp.float32)
        self._pixels = jnp.zeros((n,), jnp.uint32)
        self._lane = jnp.arange(n, dtype=jnp.uint32)

    # ---- frame loop ----

    def _spp_substeps(self, spp: int) -> bool:
        """True when a multi-spp frame should run as spp pipelined
        1-spp sub-dispatches of the SAME executable instead of one
        spp-unrolled program (round-4 config-4 closure).

        The unrolled program was measured BELOW the 1-spp executable
        per-ray on the chip (4.73 vs 5.42 Mrays/s at 8 spp -- the 8x
        body blows up scheduling/liveness), and its compile time scales
        with spp (the spf=256 CPU compile measured 9x the render).
        Sub-steps reuse the warm 1-spp executable, so per-ray
        throughput matches the 1-spp frame by construction; dispatches
        pipeline (no host syncs between), and RNG streams are keyed by
        the global sample counter either way, so the image is identical
        up to accumulator fp add order.  Debug render modes keep the
        unrolled path (their pixels show the CURRENT frame averaged
        over all spp, which sub-steps would narrow to the last sample);
        COMPARISON keeps it too (same reason).  CPUGPU_SPP_UNROLL=1
        restores the old behavior for A/B."""
        import os as _os

        return (
            spp > 1
            and self.settings.debug_render_mode == DebugRenderMode.NONE
            and self.settings.render_mode != RenderMode.COMPARISON
            and _os.environ.get("CPUGPU_SPP_UNROLL") != "1"
        )

    def _dispatch_frame(self, spp: int):
        """Dispatch one progressive frame's kernels (no host syncs);
        returns (traced, esum) as lazy device scalars."""
        w, h = self.config.width, self.config.height
        sub = 1 if self._spp_substeps(spp) else spp
        traced_t = esum_t = None
        for _ in range(spp // sub):
            acc, pixels, traced, esum = _guarded_frame_kernel(
                self.scene.device(),
                camlib.to_arrays(self.camera),
                self._accumulator,
                jnp.asarray(self._sample_counter, jnp.int32),
                self._lane,
                self.settings,
                w,
                h,
                sub,
                self.config.seed,
            )
            self._accumulator = acc
            self._pixels = pixels
            self._sample_counter += sub
            self.num_accumulated += sub
            traced_t = traced if traced_t is None else traced_t + traced
            esum_t = esum if esum_t is None else esum_t + esum
        return traced_t, esum_t

    def render_frame(self, sync: bool = True):
        """Trace one progressive frame (Render(), Main.cpp:691-755).
        No-op while paused (Main.cpp:693-696).

        sync=False skips the per-frame host sync (stats stay stale) and
        returns the traced-ray count as a DEVICE scalar: callers doing
        per-frame host work (e.g. animation refit hooks) can still
        pipeline dispatches and sum/sync once at the end (see
        render_pipelined for the hook-free variant)."""
        if self.pause_rendering:
            return None
        t0 = time.perf_counter()
        traced, esum = self._dispatch_frame(self.config.samples_per_frame)
        if not sync:
            # energy/stat counters are the caller's to drain; pixels
            # and accumulator state are already chained on device
            return traced
        self.stats.traced_rays = int(traced)
        self.stats.total_traced_rays += int(traced)
        self.total_energy_received += float(esum)
        jax.block_until_ready(self._pixels)
        dt = time.perf_counter() - t0
        self.stats.frame_time_ms = dt * 1000.0
        self.stats.fps = 1.0 / dt if dt > 0 else 0.0
        return None

    def render(self, frames: int) -> None:
        for _ in range(frames):
            self.render_frame()

    def render_pipelined(self, frames: int) -> int:
        """Dispatch `frames` progressive frames WITHOUT per-frame host
        syncs, then sync once.  Through the tunneled chip each dispatch
        costs tens of ms of host latency that render_frame serializes
        with device compute (int(traced) + block_until_ready per
        frame); deferring the counter reads lets the host run ahead
        and the device queue stay full.  Per-frame counters accumulate
        ON DEVICE (a lazy scalar add per frame), so traced-ray
        accounting is identical to the per-frame loop.  Returns the
        total traced rays for the span; stats hold span averages."""
        if self.pause_rendering or frames <= 0:
            return 0
        t0 = time.perf_counter()
        spp = self.config.samples_per_frame
        traced_t = None
        esum_t = None
        for _ in range(frames):
            traced, esum = self._dispatch_frame(spp)
            traced_t = traced if traced_t is None else traced_t + traced
            esum_t = esum if esum_t is None else esum_t + esum
        jax.block_until_ready(self._pixels)
        dt = time.perf_counter() - t0
        total = int(traced_t)
        self.stats.traced_rays = total // frames
        self.stats.total_traced_rays += total
        self.total_energy_received += float(esum_t)
        self.stats.frame_time_ms = dt * 1000.0 / frames
        self.stats.fps = frames / dt if dt > 0 else 0.0
        return total

    # ---- output ----

    def image_u32(self) -> np.ndarray:
        """(H, W) packed 0xAABBGGRR framebuffer (data.pixels)."""
        return np.asarray(self._pixels).reshape(self.config.height, self.config.width)

    def image_rgba8(self) -> np.ndarray:
        return imagelib.packed_to_rgba8(self.image_u32())

    def radiance(self) -> np.ndarray:
        """(H, W, 3) float mean radiance (accumulator / num_accumulated)."""
        acc = np.asarray(self._accumulator)
        num = np.maximum(acc[:, 3:4], 1.0)
        return (acc[:, :3] / num).reshape(self.config.height, self.config.width, 3)

    def save_png(self, path: str) -> None:
        imagelib.write_png(path, self.image_rgba8())

    @property
    def mean_energy(self) -> float:
        """total_energy_received / num_accumulated (Main.cpp:848)."""
        if self.num_accumulated == 0:
            return 0.0
        return self.total_energy_received / self.num_accumulated

    def metrics(self) -> dict:
        """Every stats-panel number (Main.cpp:841-857) as a queryable
        dict, plus derived Mrays/s."""
        dt_s = self.stats.frame_time_ms / 1000.0
        return {
            "fps": self.stats.fps,
            "frame_time_ms": self.stats.frame_time_ms,
            "traced_rays": self.stats.traced_rays,
            "total_traced_rays": self.stats.total_traced_rays,
            "mrays_per_s": (
                self.stats.traced_rays / dt_s / 1e6 if dt_s > 0 else 0.0
            ),
            "accumulated_frames": self.num_accumulated,
            "mean_energy": self.mean_energy,
            "paused": self.pause_rendering,
            # the reference scene tree's per-object readout, incl.
            # per-BVH node count / depth / area (Source/BVH.cpp:149-186)
            "objects": self.scene.object_stats(),
        }

    def profile(self, log_dir: str):
        """Context manager tracing frames with jax.profiler (xprof);
        the TPU-native stand-in for the reference's frame timer."""
        return jax.profiler.trace(log_dir)

    def validate_frame(self) -> None:
        """Render one frame with NaN debugging enabled -- the functional
        replacement for the reference's (absent) sanitizers: JAX raises
        at the first NaN-producing primitive (SURVEY.md section 5)."""
        with jax.debug_nans(True):
            self.render_frame()

    # ---- invalidation (ResetAccumulator, Main.cpp:238-243) ----

    def reset(self) -> None:
        self.num_accumulated = 0
        self.total_energy_received = 0.0
        self._accumulator = jnp.zeros_like(self._accumulator)

    # ---- live edits, with the reference's reset policy ----

    def move_camera(self, delta_pos) -> None:
        """WASD-style translation; any movement resets (Main.cpp:292-296)."""
        p = self.camera.pos
        self.camera = self.camera.replace(
            pos=(p[0] + delta_pos[0], p[1] + delta_pos[1], p[2] + delta_pos[2])
        )
        self.reset()

    def set_camera(self, camera: CameraConfig) -> None:
        self.camera = camera
        self.reset()

    def set_settings(self, settings: RenderSettings) -> None:
        """Settings toggles do NOT reset (reference quirk) -- except a
        render-mode change, which does (Main.cpp:876-877)."""
        mode_changed = settings.render_mode != self.settings.render_mode
        self.settings = settings
        if mode_changed:
            self.reset()

    def set_render_mode(self, mode: RenderMode) -> None:
        self.set_settings(self.settings.replace(render_mode=mode))

    def set_debug_mode(self, mode: DebugRenderMode) -> None:
        """Debug-view change does not reset (Main.cpp:888-905)."""
        self.settings = self.settings.replace(debug_render_mode=mode)

    def set_material(self, index: int, material: Material) -> None:
        """Material edit resets (Main.cpp:263-265)."""
        self.scene.set_material(index, material)
        self.reset()

    def rebuild_bvh(self, obj_index, build_option) -> None:
        """UI-triggered rebuild (Source/BVH.cpp:182-185); snapshot swap
        means no race with in-flight frames."""
        self.scene.rebuild_bvh(obj_index, build_option)

    def set_sphere(self, obj_index: int, center, radius: float) -> None:
        """Live sphere edit resets the accumulator, exactly like the
        reference scene-tree widgets (Source/Primitives.cpp:385-398 set
        data.reset_accumulator on change)."""
        self.scene.set_sphere(obj_index, center, radius)
        self.reset()

    def set_plane(self, obj_index: int, point, normal) -> None:
        """Live plane edit + accumulator reset (Source/Primitives.cpp:400-415)."""
        self.scene.set_plane(obj_index, point, normal)
        self.reset()

    def set_paused(self, paused: bool) -> None:
        """Pause checkbox resets on toggle (Main.cpp:851-854)."""
        if paused != self.pause_rendering:
            self.pause_rendering = paused
            self.reset()

    # ---- checkpoint / resume ----

    def _fingerprint(self) -> str:
        """Checkpoint validity key: scene geometry/materials + camera +
        config + render mode.  Settings TOGGLES (max depth, NEE, cosine,
        RR) are deliberately excluded: in the reference they do NOT
        reset the live accumulator (Main.cpp:859-875 -- new samples just
        blend in), so a toggle must not invalidate a saved checkpoint
        either.  A render-mode change DOES reset (Main.cpp:876-877), so
        it stays in the key."""
        h = hashlib.sha256()
        dev = self.scene.device()
        for arr in (dev.nodes8, dev.tris9, dev.mat.albedo, dev.mat.emissive):
            h.update(np.asarray(arr).tobytes())
        h.update(
            repr((self.camera, self.config, self.settings.render_mode)).encode()
        )
        return h.hexdigest()[:16]

    def save_checkpoint(self, path: str) -> None:
        np.savez_compressed(
            path,
            accumulator=np.asarray(self._accumulator),
            num_accumulated=self.num_accumulated,
            sample_counter=self._sample_counter,
            total_energy=self.total_energy_received,
            fingerprint=self._fingerprint(),
        )
        log_info("Renderer", "checkpoint saved to {} ({} frames)", path, self.num_accumulated)

    def load_checkpoint(self, path: str) -> bool:
        """Resume accumulation; returns False (and resets) on a
        scene/settings fingerprint mismatch."""
        data = np.load(path, allow_pickle=False)
        if str(data["fingerprint"]) != self._fingerprint():
            log_warn("Renderer", "checkpoint fingerprint mismatch; starting fresh")
            self.reset()
            return False
        self._accumulator = jnp.asarray(data["accumulator"])
        self.num_accumulated = int(data["num_accumulated"])
        self._sample_counter = int(data["sample_counter"])
        self.total_energy_received = float(data["total_energy"])
        log_info("Renderer", "resumed at {} accumulated frames", self.num_accumulated)
        return True
