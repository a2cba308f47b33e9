"""Packet-tree quality lab: EXACT kernel iteration counts per
CPUGPU_PACKET_TREE variant, measured on CPU (interpret-mode slim kernel)
so tree experiments need no chip time.

The config-3 frame is ~85% packet-kernel iterations at ~1.07 us each
(round-3 census: 767k iterations/frame at 1080p), so iteration count is
the direct wall-time predictor; counts are deterministic functions of
(tables, rays) and identical on CPU and TPU.  This lab rebuilds the
benchmark scene under every device-tree variant (models/scene.py
_build_wide_cache) and replays the SAME four ray fans through each,
with the production sort schedule applied per fan (stable compaction at
the depth-0 boundary, 8-bit origin morton on scattered interior fans,
no sort for shadows -- the measured round-3 schedule).

Fans are the fan_lab.py recipes (geometrically faithful synthetic
bounces off real primary hits); hits are tree-independent, so one fan
set serves every variant.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/tree_lab.py
    TREELAB_W=256 TREELAB_H=144 ... (smaller/faster)
    TREELAB_MODES=,dp ... (subset)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax

if jax.config.jax_platforms not in ("cpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cpugpupathtracing_tpu.config import CameraConfig
from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models import scene as scenelib
from cpugpupathtracing_tpu.models.bvh8 import SLIM_EMPTY
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk

W = int(os.environ.get("TREELAB_W", "512"))
H = int(os.environ.get("TREELAB_H", "288"))
MODES = os.environ.get("TREELAB_MODES", ",dp,sweep,sweep_dp").split(",")

# full-frame census weights (1080p, tools/profile_mega_census.py):
# iterations per frame by phase -- used to weight the per-fan deltas
# into one frame-level estimate
CENSUS = {"primary": 24e3, "shadow": 210e3, "bounce": 264e3, "interior": 259e3}


def spread8(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton8(dev, o, d):
    q8 = jnp.clip(((o - dev.world_lo) * dev.world_inv_extent * 256.0)
                  .astype(jnp.int32), 0, 255)
    mor = (spread8(q8[:, 0]) | (spread8(q8[:, 1]) << 1)
           | (spread8(q8[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    return (octant << 24) | mor


def run_fan(dev, o, d, act, tmax, any_hit, key):
    if key is not None:
        perm = jnp.argsort(key)
        o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
    res = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, dev.pnodes, dev.pltris, dev.proots,
        active=a, any_hit=any_hit, count_depth=False, count_iters=True,
        interpret=True, width=dev.packet_width,
    ))(o, d, act, tmax)
    jax.block_until_ready(res)
    return int(np.asarray(res[-1]).sum())


def trace(dev, o, d, act, tmax, any_hit=False):
    res = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, dev.pnodes, dev.pltris, dev.proots,
        active=a, any_hit=any_hit, count_depth=False, interpret=True,
        width=dev.packet_width,
    ))(o, d, act, tmax)
    jax.block_until_ready(res)
    return res


def make_fans(dev):
    """fan_lab.py recipes at lab resolution; returns dict of
    (origin, direction, active, t_init, any_hit, sortkey_kind)."""
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    carr = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    bh, bw = camlib.block_shape(W, H)
    o0, d0, _ = camlib.blocked_lane_rays(carr, lane, W, H, bh, bw)
    t_init = jnp.full((n,), 1e34, jnp.float32)
    ones = jnp.ones((n,), jnp.int32)

    t, tri, obj, (nx, ny, nz), _, _ = trace(dev, o0, d0, ones, t_init)
    hitm = tri >= 0
    px = o0 + d0 * t[:, None]
    nrm = jnp.stack([nx, ny, nz], axis=1)

    kk = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(kk, 3)

    # depth-1 bounce fan: ground lanes cosine-hemisphere, dragon refract
    u = jax.random.normal(k1, (n, 3))
    hemi = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    hemi = jnp.where(jnp.sum(hemi * nrm, axis=1, keepdims=True) < 0,
                     -hemi, hemi)
    cosd = hemi + nrm
    cosd = cosd / jnp.maximum(
        jnp.linalg.norm(cosd, axis=1, keepdims=True), 1e-9)
    eta = 1.0 / 1.517
    ddn = jnp.sum(d0 * nrm, axis=1, keepdims=True)
    cosi = jnp.abs(jnp.clip(ddn, -1.0, 1.0))
    kk2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    refr = d0 * eta + (eta * cosi - jnp.sqrt(jnp.maximum(kk2, 0.0))) * (
        jnp.where(ddn < 0, nrm, -nrm))
    refr = refr / jnp.maximum(
        jnp.linalg.norm(refr, axis=1, keepdims=True), 1e-9)
    is_dragon = (obj == 0)[:, None]
    bd = jnp.where(is_dragon, refr, cosd)
    bo = px + bd * 1e-3
    bact = hitm.astype(jnp.int32)

    # depth-2 glass-interior fan
    iact = (hitm & (obj == 0)).astype(jnp.int32)
    io = px + refr * 1e-3
    t2, tri2, _, (n2x, n2y, n2z), _, _ = trace(dev, io, refr, iact, t_init)
    px2 = io + refr * t2[:, None]
    nrm2 = jnp.stack([n2x, n2y, n2z], axis=1)
    eta2 = 1.517
    ddn2 = jnp.sum(refr * nrm2, axis=1, keepdims=True)
    cosi2 = jnp.abs(jnp.clip(ddn2, -1.0, 1.0))
    k2v = 1.0 - eta2 * eta2 * (1.0 - cosi2 * cosi2)
    nref = jnp.where(ddn2 < 0, nrm2, -nrm2)
    refl2 = refr - 2.0 * jnp.sum(refr * nref, axis=1, keepdims=True) * nref
    refr2 = refr * eta2 + (
        eta2 * cosi2 - jnp.sqrt(jnp.maximum(k2v, 0.0))) * nref
    d2 = jnp.where(k2v < 0, refl2, refr2)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=1, keepdims=True), 1e-9)
    o2 = px2 + d2 * 1e-3
    act2 = (iact.astype(bool) & (tri2 >= 0)).astype(jnp.int32)

    # depth-0 NEE shadow fan (ground lanes)
    li = jax.random.bernoulli(k2, 0.5, (n,)).astype(jnp.int32)
    lc = jnp.where(li[:, None] == 0,
                   jnp.array([[10.0, 10.0, 10.0]]),
                   jnp.array([[-10.0, 10.0, -10.0]]))
    sph = jax.random.normal(k3, (n, 3))
    sph = sph / jnp.linalg.norm(sph, axis=1, keepdims=True)
    to_p = px - lc
    face = jnp.where(jnp.sum(sph * to_p, axis=1, keepdims=True) < 0,
                     -sph, sph)
    lp = lc + 5.0 * face
    sd = lp - px
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sd = sd / jnp.maximum(dist, 1e-9)
    so = px + sd * 1e-3
    stm = dist[:, 0] - 2e-3
    sact = (hitm & (obj == 1)).astype(jnp.int32)

    return {
        # name: (o, d, act, tmax, any_hit, sort)
        "primary": (o0, d0, ones, t_init, False, "none"),
        "bounce": (bo, bd, bact, t_init, False, "compact"),
        "interior": (o2, d2, act2, t_init, False, "morton8"),
        "shadow": (so, sd, sact, stm, True, "none"),
    }


def main():
    print(f"tree_lab {W}x{H} backend={jax.default_backend()}", flush=True)
    base_scene = scenelib.make_reference_scene()
    base_dev = base_scene.device()
    fans = make_fans(base_dev)
    print("fans ready", flush=True)

    results = {}
    for mode in MODES:
        scenelib.PACKET_TREE = mode  # fresh Scene per mode: no stale cache
        dev = scenelib.make_reference_scene().device()
        pn = np.asarray(dev.pnodes)
        ci = pn[:, 48:56].view(np.int32)
        fill = (ci != SLIM_EMPTY).sum() / pn.shape[0]
        row = {}
        for name, (o, d, act, tmax, any_hit, sort) in fans.items():
            key = None
            if sort == "compact":
                key = 1 - act
            elif sort == "morton8":
                key = ((1 - act) << 28) | morton8(dev, o, d)
            t0 = time.time()
            row[name] = run_fan(dev, o, d, act, tmax, any_hit, key)
            print(f"  [{mode or 'default'}] {name:9s} {row[name]:8d} it "
                  f"({time.time() - t0:.0f}s)", flush=True)
        results[mode] = (row, pn.shape[0], fill)

    basemode = MODES[0]
    base = results[basemode][0]
    print(f"\n{'variant':>10s} {'nodes':>6s} {'fill':>5s} "
          + "".join(f"{k:>10s}" for k in base)
          + f" {'frame est':>10s}")
    for mode, (row, nn, fill) in results.items():
        # frame-level estimate: scale each fan's census weight by the
        # variant's per-fan ratio vs the first (baseline) mode
        est = sum(CENSUS[k] * row[k] / max(base[k], 1) for k in CENSUS)
        est0 = sum(CENSUS.values())
        print(f"{mode or 'default':>10s} {nn:6d} {fill:5.2f} "
              + "".join(f"{row[k]:10d}" for k in base)
              + f" {est / est0 * 100:9.1f}%")


if __name__ == "__main__":
    main()
