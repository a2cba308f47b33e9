"""Degenerate (process_count == 1) coverage for the multi-host entry
point (parallel/distributed.py).  A real pod cannot run here; these pin
the single-process contract -- no-op initialize, primary detection,
ICI-major global mesh, and the host gather -- so the DCN path's plumbing
stays importable and wired (SURVEY.md section 2.3 comm-backend row,
mapping Source/ThreadPool.cpp:135-179)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cpugpupathtracing_tpu.parallel import distributed as dist


def test_no_env_is_noop(monkeypatch):
    monkeypatch.delenv("CPUGPU_COORDINATOR", raising=False)
    monkeypatch.delenv("CPUGPU_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("CPUGPU_DISTRIBUTED", raising=False)
    assert dist.maybe_initialize_distributed() is False
    assert jax.process_count() == 1


def test_num_processes_one_is_noop(monkeypatch):
    monkeypatch.setenv("CPUGPU_COORDINATOR", "localhost:9999")
    monkeypatch.setenv("CPUGPU_NUM_PROCESSES", "1")
    monkeypatch.delenv("CPUGPU_DISTRIBUTED", raising=False)
    # must NOT dial the (nonexistent) coordinator for a 1-process run
    assert dist.maybe_initialize_distributed() is False


def test_primary_and_mesh():
    assert dist.is_primary() is True
    mesh = dist.global_mesh()
    assert mesh.axis_names == ("tiles",)
    assert mesh.devices.size == len(jax.devices()) == 8


def test_gather_image_single_process_sharded():
    mesh = dist.global_mesh()
    n = 64
    ref = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    sharded = jax.device_put(
        jnp.asarray(ref), NamedSharding(mesh, P("tiles"))
    )
    out = dist.gather_image_to_host(sharded)
    np.testing.assert_array_equal(out, ref)
