"""TPU-native wavefront path-tracing framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
Contingencyy/CPUGPUPathtracing (a CPU Monte-Carlo path tracer): progressive
accumulation, glTF ingestion, midpoint/SAH BVHs, Moller-Trumbore /
sphere / plane intersection, a probabilistic-lobe material model (Lambert
diffuse, pure specular, dielectrics with exact polarized Fresnel and
Beer's-law absorption), area-light soft shadows, and variance reduction via
next-event estimation, cosine-weighted importance sampling, and Russian
roulette.

Instead of the reference's per-pixel recursive loop on a thread pool
(reference: Source/Main.cpp:691-755, Source/ThreadPool.cpp), rendering here
is a batched wavefront pipeline over SoA ray arrays: ray-gen -> BVH
traversal -> masked shade/bounce, one fixed-depth loop under a single jit,
sharded over TPU chips with `shard_map`.
"""

from cpugpupathtracing_tpu.config import (
    RenderSettings,
    RenderMode,
    DebugRenderMode,
    BuildOption,
    DiffusePdfMode,
)

__version__ = "0.1.0"

__all__ = [
    "RenderSettings",
    "RenderMode",
    "DebugRenderMode",
    "BuildOption",
    "DiffusePdfMode",
    "__version__",
]
