"""CPUGPU_SMEMTREE (SMEM entry side tables, round-4): the rendered
image must be BITWISE identical to the default kernels.

The side-table scheme only re-encodes WHERE the traversal control data
lives (2-word frames + SMEM entry reads instead of 9-slot frames +
node-row extracts; mode 48 additionally drops the entry columns from
the node rows, with NaN bounds standing in for the validity compare).
Hits are exact and per-lane RNG order is untouched, so a full render
through the forced packet path -- closest-hit AND occlusion-table
shadow traversals, megakernels included -- must reproduce the default
image bit for bit.

The kernel flags are read ONCE at import, so each variant renders in a
SEPARATE interpreter (same pattern as tools/fuzz_flags.sh).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # nightly tier: see tests/conftest.py

_RENDER_SNIPPET = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from cpugpupathtracing_tpu.config import (
    CameraConfig, RenderConfig, RenderMode, RenderSettings)
from cpugpupathtracing_tpu.models import materials as matlib
from cpugpupathtracing_tpu.models import mesh as meshlib
from cpugpupathtracing_tpu.models.renderer import Renderer
from cpugpupathtracing_tpu.models.scene import Scene

s = Scene()
white = s.add_material(matlib.Material.diffuse((0.8, 0.8, 0.8)))
glass = s.add_material(
    matlib.Material.dielectric((0.9, 0.9, 0.9), 0.1, 0.8, (0.1, 0.2, 0.2), 1.5))
light = s.add_material(matlib.Material.light((1.0, 0.95, 0.8), 10.0))
s.add_mesh("ball", meshlib.icosphere(subdivisions=1), glass)
s.add_mesh("floor", meshlib.ground_quad(half_extent=50.0, y=-2.0), white)
s.add_plane("backwall", (0.0, 0.0, -12.0), (0.0, 0.0, 1.0), white)
for li, c in enumerate([(6.0, 6.0, 6.0), (-6.0, 6.0, -4.0)]):
    s.mark_light(s.add_sphere(f"light{li}", c, 2.0, light))

dev = s.device()
# the variant under test must actually build its tables
import os
mode = os.environ.get("CPUGPU_SMEMTREE", "")
if mode:
    assert dev.pents is not None, "pents not built"
    if mode == "48":
        assert dev.pnodes48 is not None, "pnodes48 not built"

r = Renderer(
    s, camera=CameraConfig(pos=(0.0, 0.5, 7.0)),
    config=RenderConfig(width=64, height=36, seed=0x12345678),
    settings=RenderSettings(render_mode=RenderMode.ADVANCED, max_ray_depth=3),
)
r.render(2)
np.asarray(r.image_u32()).tofile(sys.argv[1])
"""


def _render(tmp_path, name, env_extra):
    out = tmp_path / f"{name}.u32"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CPUGPU_TPU_FORCE_PACKET"] = "1"
    # the production build gates side tables on >= 2048 nodes (small
    # trees measured a perf loss on chip); the BITWISE contract is what
    # this suite pins, so force the build on the tiny test tree
    env["CPUGPU_SMEMTREE_MIN_NODES"] = "1"
    env.update(env_extra)
    subprocess.run(
        [sys.executable, "-c", _RENDER_SNIPPET, str(out)],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    return np.fromfile(out, dtype=np.uint32)


@pytest.mark.parametrize("mode", ["1", "48"])
def test_smemtree_bitwise_golden(tmp_path, mode):
    base = _render(tmp_path, "base", {"CPUGPU_FRAMESTACK": "1",
                                      "CPUGPU_OCCL": "1"})
    got = _render(
        tmp_path, f"smem{mode}",
        {"CPUGPU_FRAMESTACK": "1", "CPUGPU_OCCL": "1",
         "CPUGPU_SMEMTREE": mode},
    )
    np.testing.assert_array_equal(
        base, got,
        err_msg=f"CPUGPU_SMEMTREE={mode} changed the image -- the "
                "hit-exactness contract is broken",
    )


def test_occl2_bitwise_golden(tmp_path):
    """CPUGPU_OCCL2 (2-row 28-record occlusion leaves): the occluded
    bit is an OR over the same triangle set, so the image is bitwise
    identical; composition with the SMEM side tables included."""
    flags = {"CPUGPU_FRAMESTACK": "1", "CPUGPU_CONDPUSH": "1",
             "CPUGPU_PIPELINED": "1", "CPUGPU_OCCL": "1",
             "CPUGPU_PACKET_TREE": "sweep_dp"}
    base = _render(tmp_path, "obase", flags)
    for name, extra in (
        ("occl2", {"CPUGPU_OCCL2": "1"}),
        ("occl2_smem", {"CPUGPU_OCCL2": "1", "CPUGPU_SMEMTREE": "1"}),
    ):
        got = _render(tmp_path, name, {**flags, **extra})
        np.testing.assert_array_equal(
            base, got, err_msg=f"{extra} changed the image")


def test_smemtree_pipelined_bitwise(tmp_path):
    """The picked production combo (framestack+condpush+pipelined+occl)
    with and without the side tables."""
    flags = {"CPUGPU_FRAMESTACK": "1", "CPUGPU_CONDPUSH": "1",
             "CPUGPU_PIPELINED": "1", "CPUGPU_OCCL": "1",
             "CPUGPU_PACKET_TREE": "sweep_dp"}
    base = _render(tmp_path, "pbase", flags)
    for mode in ("1", "48"):
        got = _render(tmp_path, f"psmem{mode}",
                      {**flags, "CPUGPU_SMEMTREE": mode})
        np.testing.assert_array_equal(
            base, got,
            err_msg=f"pipelined CPUGPU_SMEMTREE={mode} changed the image",
        )
