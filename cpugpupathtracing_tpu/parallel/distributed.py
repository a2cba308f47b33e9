"""Multi-host (pod) entry point: jax.distributed + a global device mesh.

SURVEY.md section 2.3 maps the reference's thread-pool "communication"
(Source/ThreadPool.cpp:135-179 -- a shared work queue + spin barrier on
one shared-memory machine) to the TPU-native two-level fabric: chips
inside a slice talk over ICI via the collectives already emitted by
parallel/sharding.py; multiple HOSTS coordinate over DCN through
jax.distributed.  This module is the DCN half: process bring-up, the
global mesh spanning every process's chips, and the host-side gather
that assembles a full frame from lane-sharded shards.

Launch line (one command per host of a pod slice, e.g. v5e-16 = 4 hosts):

    CPUGPU_COORDINATOR=<host0>:8476 CPUGPU_NUM_PROCESSES=4 \
    CPUGPU_PROCESS_ID=<0..3> python -m cpugpupathtracing_tpu.cli ...

On Cloud TPU the three variables may be omitted entirely:
jax.distributed.initialize() autodetects the coordinator from the TPU
metadata.  Single-process runs (the common case, and this repo's CI) are
a strict no-op: nothing here requires a pod.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from cpugpupathtracing_tpu.utils.log import log_info, log_warn

_initialized = False


def maybe_initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Env-gated jax.distributed.initialize; call ONCE before any JAX
    computation (the backend must not be live yet -- same contract as
    jax.distributed.initialize itself).

    Resolution order: explicit arguments, then CPUGPU_COORDINATOR /
    CPUGPU_NUM_PROCESSES / CPUGPU_PROCESS_ID, then (when
    CPUGPU_DISTRIBUTED=1) JAX's own cloud autodetection.  Returns True
    when a multi-process runtime was brought up, False for the
    single-process no-op.  Idempotent: repeated calls return the first
    result instead of raising.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("CPUGPU_COORDINATOR")
    if num_processes is None and os.environ.get("CPUGPU_NUM_PROCESSES"):
        num_processes = int(os.environ["CPUGPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CPUGPU_PROCESS_ID"):
        process_id = int(os.environ["CPUGPU_PROCESS_ID"])
    autodetect = os.environ.get("CPUGPU_DISTRIBUTED") == "1"

    if coordinator is None and not autodetect:
        return False  # plain single-process run: nothing to do
    if num_processes is not None and num_processes <= 1 and not autodetect:
        log_info("Distributed", "num_processes=1: skipping jax.distributed")
        return False

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log_info(
        "Distributed",
        "process {}/{} up, {} local + {} global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.local_devices()),
        len(jax.devices()),
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write files / serve the viewer
    (the reference's single main thread, Source/Main.cpp:825)."""
    return jax.process_index() == 0


def global_mesh(axis: str = "tiles") -> Mesh:
    """Mesh over EVERY chip of every process, ICI-major: jax.devices()
    enumerates each process's chips contiguously, so the lane shards of
    parallel/sharding.render_frame_sharded land host-locally and the
    psum collectives ride ICI within a slice before crossing DCN."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def gather_image_to_host(pixels) -> np.ndarray:
    """Assemble a full frame on every host from a lane-sharded device
    array (the DCN analog of the reference's implicit shared-memory
    framebuffer).  Single-process arrays (sharded across local chips or
    not) transfer directly; multi-process arrays go through a host
    allgather over DCN."""
    if jax.process_count() == 1:
        return np.asarray(pixels)
    if not getattr(pixels, "is_fully_addressable", True):
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(pixels, tiled=True)
        )
    log_warn(
        "Distributed",
        "gather_image_to_host on a fully-addressable array in a "
        "multi-process run: returning the local copy",
    )
    return np.asarray(pixels)
