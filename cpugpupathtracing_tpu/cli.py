"""Command-line entry point.

The reference has no CLI (all knobs are compile-time constants or ImGui
state, SURVEY.md section 5); here every panel knob is a flag.  Renders N
progressive frames of a chosen scene and writes a PNG, printing the
stats-panel numbers (FPS, frame ms, traced rays, mean energy) per frame
or as a summary.

    python -m cpugpupathtracing_tpu.cli --scene reference --width 1280 \
        --height 720 --frames 64 --out out.png
"""

from __future__ import annotations

import argparse
import json
import sys

from cpugpupathtracing_tpu.config import (
    CameraConfig,
    DebugRenderMode,
    RenderConfig,
    RenderMode,
    RenderSettings,
)


def build_scene(name: str, gltf_path: str | None):
    from cpugpupathtracing_tpu.models import gltf as gltflib
    from cpugpupathtracing_tpu.models import mesh as meshlib
    from cpugpupathtracing_tpu.models.scene import make_reference_scene
    from cpugpupathtracing_tpu.models.whitted import make_whitted_scene

    if name == "reference":
        mesh = None
        if gltf_path:
            mesh = gltflib.load(gltf_path)
        return make_reference_scene(dragon_mesh=mesh)
    if name == "whitted":
        return make_whitted_scene()
    if name == "gltf":
        if not gltf_path:
            raise SystemExit("--gltf path required for --scene gltf")
        from cpugpupathtracing_tpu.models import materials as matlib
        from cpugpupathtracing_tpu.models.scene import Scene

        s = Scene()
        grey = s.add_material(matlib.Material.diffuse((0.7, 0.7, 0.7)))
        light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
        s.add_mesh("mesh", gltflib.load(gltf_path, apply_transforms=True), grey)
        s.add_plane("floor", (0.0, -3.0, 0.0), (0.0, 1.0, 0.0), grey)
        li = s.add_sphere("light", (10.0, 10.0, 10.0), 5.0, light)
        s.mark_light(li)
        return s
    raise SystemExit(f"unknown scene '{name}'")


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU wavefront path tracer")
    p.add_argument("--scene", default="reference",
                   choices=["reference", "whitted", "gltf"])
    p.add_argument("--gltf", default=None, help="glTF file for the mesh object")
    p.add_argument("--width", type=int, default=1280)   # reference default, Main.cpp:760
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--spp", type=int, default=1, help="samples per frame")
    p.add_argument("--max-depth", type=int, default=5)
    p.add_argument("--no-nee", action="store_true")
    p.add_argument("--no-cosine", action="store_true")
    p.add_argument("--no-rr", action="store_true")
    p.add_argument("--correct-pdf", action="store_true",
                   help="use corrected diffuse pdfs instead of reference-faithful")
    p.add_argument("--mode", default="advanced",
                   choices=["comparison", "bruteforce", "advanced", "whitted"])
    p.add_argument("--debug-view", default="none",
                   choices=["none", "ray-depth", "bvh-depth"])
    p.add_argument("--camera-pos", type=float, nargs=3, default=[0.0, 0.0, 8.0])
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--seed", type=lambda x: int(x, 0), default=0x12345678)
    p.add_argument("--out", default="render.png")
    p.add_argument("--checkpoint", default=None,
                   help="npz path: resume from it if present, save to it at exit")
    p.add_argument("--stats-json", action="store_true",
                   help="print one JSON stats line per frame")
    p.add_argument("--serve", type=int, default=None, metavar="PORT",
                   help="start the live HTTP viewer (progressive frame + "
                        "stats + WASD fly camera) and render until "
                        "interrupted; --frames still bounds the loop if set")
    args = p.parse_args(argv)

    from cpugpupathtracing_tpu.config import DiffusePdfMode
    from cpugpupathtracing_tpu.models.renderer import Renderer

    mode = {
        "comparison": RenderMode.COMPARISON,
        "bruteforce": RenderMode.BRUTE_FORCE,
        "advanced": RenderMode.ADVANCED,
        "whitted": RenderMode.WHITTED,
    }[args.mode]
    debug = {
        "none": DebugRenderMode.NONE,
        "ray-depth": DebugRenderMode.RAY_DEPTH,
        "bvh-depth": DebugRenderMode.BVH_DEPTH,
    }[args.debug_view]

    settings = RenderSettings(
        max_ray_depth=args.max_depth,
        next_event_estimation=not args.no_nee,
        cosine_weighted_diffuse=not args.no_cosine,
        russian_roulette=not args.no_rr,
        render_mode=mode,
        debug_render_mode=debug,
        diffuse_pdf_mode=(
            DiffusePdfMode.CORRECT if args.correct_pdf else DiffusePdfMode.REFERENCE
        ),
    )
    scene = build_scene(args.scene, args.gltf)
    r = Renderer(
        scene,
        camera=CameraConfig(pos=tuple(args.camera_pos), fov_deg=args.fov,
                            aspect=args.width / args.height),
        config=RenderConfig(width=args.width, height=args.height,
                            samples_per_frame=args.spp, seed=args.seed),
        settings=settings,
    )
    if args.checkpoint:
        import os

        if os.path.exists(args.checkpoint):
            r.load_checkpoint(args.checkpoint)

    if args.serve is not None:
        from cpugpupathtracing_tpu.viewer import LiveViewer

        viewer = LiveViewer(r, port=args.serve)
        viewer.start()
        viewer.serve_frames(args.frames if args.frames > 0 else None)
        r.save_png(args.out)
        print(f"wrote {args.out} ({r.num_accumulated} accumulated samples/pixel)",
              file=sys.stderr)
        viewer.close()
        return

    for i in range(args.frames):
        r.render_frame()
        if args.stats_json:
            print(json.dumps({
                "frame": i,
                "fps": round(r.stats.fps, 2),
                "frame_ms": round(r.stats.frame_time_ms, 2),
                "traced_rays": r.stats.traced_rays,
                "accumulated": r.num_accumulated,
                "mean_energy": round(r.mean_energy, 4),
            }))
        else:
            print(
                f"frame {i + 1}/{args.frames}: {r.stats.frame_time_ms:.1f} ms, "
                f"{r.stats.traced_rays} rays, mean energy {r.mean_energy:.3f}",
                file=sys.stderr,
            )

    r.save_png(args.out)
    print(f"wrote {args.out} ({r.num_accumulated} accumulated samples/pixel)",
          file=sys.stderr)
    if args.checkpoint:
        r.save_checkpoint(args.checkpoint)


if __name__ == "__main__":
    main()
