"""Sort-key lab for incoherent fans: measure packet-kernel iteration
counts for realistic depth-1 bounce and NEE shadow fans on the config-3
scene under CANDIDATE coherence keys, to pick the wavefront sort key
(scene.reorder_key) and decide whether the shadow fan deserves its own
light-major permutation.

Fans are generated synthetically (jax PRNG) but geometrically faithful:
ground-plane hits scatter cosine-hemisphere, dragon hits refract
(eta = 1/1.517), shadow rays sample the two reference light spheres at
random like sample_light.  Iteration counts come from the slim packet
kernel's count_iters output -- exact, independent of timing noise.

    python tools/fan_lab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpugpupathtracing_tpu.models import camera as camlib
from cpugpupathtracing_tpu.models.scene import make_reference_scene
from cpugpupathtracing_tpu.ops import traverse_packet_slim as pk
from cpugpupathtracing_tpu.config import CameraConfig

W, H = 1920, 1080


def spread5(v):
    v = (v | (v << 8)) & 0x0300F
    v = (v | (v << 4)) & 0x030C3
    v = (v | (v << 2)) & 0x09249
    return v


def morton3(q):
    return spread5(q[:, 0]) | (spread5(q[:, 1]) << 1) | (spread5(q[:, 2]) << 2)


def quant(x, lo, inv_ext, bits):
    return jnp.clip(((x - lo) * inv_ext * (1 << bits)).astype(jnp.int32),
                    0, (1 << bits) - 1)


def keys(dev, o, d, extra=None):
    """Candidate sort keys. Returns dict name -> (N,) i32 key."""
    q5 = jnp.clip(((o - dev.world_lo) * dev.world_inv_extent * 32.0)
                  .astype(jnp.int32), 0, 31)
    mor = morton3(q5)
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    # finer direction bins: 2 extra bits/axis of direction in [-1,1]
    dq = jnp.clip(((d + 1.0) * 0.5 * 4.0).astype(jnp.int32), 0, 3)
    dmor = dq[:, 0] | (dq[:, 1] << 2) | (dq[:, 2] << 4)
    # 6-bit origin morton
    q6 = jnp.clip(((o - dev.world_lo) * dev.world_inv_extent * 64.0)
                  .astype(jnp.int32), 0, 63)

    def spread6(v):
        v = (v | (v << 16)) & 0x0030000F
        v = (v | (v << 8)) & 0x0300300F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    mor6 = spread6(q6[:, 0]) | (spread6(q6[:, 1]) << 1) | (spread6(q6[:, 2]) << 2)
    # 8-bit origin morton (24 bits): cells of ~0.08 units on the 20-unit
    # reference world -- resolves positions INSIDE the ~2.5-unit dragon
    def spread8(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    q8 = jnp.clip(((o - dev.world_lo) * dev.world_inv_extent * 256.0)
                  .astype(jnp.int32), 0, 255)
    mor8 = spread8(q8[:, 0]) | (spread8(q8[:, 1]) << 1) | (spread8(q8[:, 2]) << 2)
    out = {
        "current: oct|mor5": (octant << 15) | mor,
        "dirbins: oct|dmor6|mor5": (octant << 21) | (dmor << 15) | mor,
        "pos-major: mor5|oct": (mor << 3) | octant,
        "fine-pos: oct|mor6": (octant << 18) | mor6,
        "fine-pos: oct|mor8": (octant << 24) | mor8,
        "pos-major: mor8|oct": (mor8 << 3) | octant,
        "nosort": None,
    }
    if extra is not None:
        li = extra
        out["light|oct|mor5"] = (li << 18) | (octant << 15) | mor
        out["light|mor5"] = (li << 15) | mor
    return out


def quarter_bound(dev, o, d, act, tmax, any_hit, key):
    """Iteration bound for a 4-stack packet kernel (4 independent
    256-lane groups per 1024-lane sub-tile, stacks drained in lockstep):
    run the current kernel with only quarter g of each sub-tile live,
    then sum per-tile max over g -- the while-loop trip count such a
    kernel would pay, vs the union the shared-stack kernel pays."""
    if key is not None:
        perm = jnp.argsort(key)
        o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
    n = o.shape[0]
    pos = np.arange(n) % 1024
    per_q = []
    for g in range(4):
        mq = jnp.asarray((pos // 256) == g, jnp.int32)
        res = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
            (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
            t0, dev.pnodes, dev.pltris, dev.proots,
            active=a, any_hit=any_hit, count_depth=False, count_iters=True,
        ))(o, d, act * mq, tmax)
        jax.block_until_ready(res)
        per_q.append(np.asarray(res[-1]))
    per_q = np.stack(per_q)  # (4, tiles)
    mx, sm = per_q.max(axis=0), per_q.sum(axis=0)
    print(f"  4-stack bound: sum-of-max {int(mx.sum()):9d} it, "
          f"sum-of-sum {int(sm.sum()):9d} it (vs shared-stack union above)",
          flush=True)


def run_fan(dev, o, d, act, tmax, any_hit, label, key):
    n = o.shape[0]
    if key is not None:
        perm = jnp.argsort(key)
        o, d, act, tmax = o[perm], d[perm], act[perm], tmax[perm]
    f = jax.jit(lambda o, d, a, t0: pk.traverse_packet_slim(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t0, dev.pnodes, dev.pltris, dev.proots,
        active=a, any_hit=any_hit, count_depth=False, count_iters=True,
    ))
    res = f(o, d, act, tmax)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(3):
        res = f(o, d, act, tmax)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / 3
    iters = np.asarray(res[-1])  # count_iters output is the last element
    nact = int(np.asarray(act).sum())
    print(f"  {label:26s} {iters.sum():9d} it (max {iters.max():4d}) "
          f"{dt * 1e3:7.1f} ms  {nact / dt / 1e6:6.1f} Mrays/s",
          flush=True)
    return int(iters.sum())


def main():
    dev = make_reference_scene().device()
    print("backend:", jax.default_backend(), flush=True)
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    carr = camlib.to_arrays(CameraConfig(pos=(0.0, 0.0, 8.0), aspect=16 / 9))
    bh, bw = camlib.block_shape(W, H)
    o0, d0, pix = camlib.blocked_lane_rays(carr, lane, W, H, bh, bw)
    t_init = jnp.full((n,), 1e34, jnp.float32)
    ones = jnp.ones((n,), jnp.int32)

    # ---- primary hits ----
    t, tri, obj, (nx, ny, nz), _, _ = jax.jit(
        lambda: pk.traverse_packet_slim(
            (o0[:, 0], o0[:, 1], o0[:, 2]), (d0[:, 0], d0[:, 1], d0[:, 2]),
            t_init, dev.pnodes, dev.pltris, dev.proots,
            active=ones, count_depth=False,
        )
    )()
    jax.block_until_ready(t)
    hitm = tri >= 0
    px = o0 + d0 * t[:, None]
    nrm = jnp.stack([nx, ny, nz], axis=1)
    print(f"primary hits: {int(hitm.sum())} of {n}", flush=True)

    kk = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(kk, 4)

    # ---- depth-1 bounce fan ----
    # ground (obj=1): cosine hemisphere about the normal
    u = jax.random.normal(k1, (n, 3))
    hemi = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    hemi = jnp.where(jnp.sum(hemi * nrm, axis=1, keepdims=True) < 0, -hemi, hemi)
    cosd = hemi + nrm
    cosd = cosd / jnp.maximum(jnp.linalg.norm(cosd, axis=1, keepdims=True), 1e-9)
    # dragon (obj=0): refract eta=1/1.517
    eta = 1.0 / 1.517
    ddn = jnp.sum(d0 * nrm, axis=1, keepdims=True)
    cosi = jnp.abs(jnp.clip(ddn, -1.0, 1.0))
    kk2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    refr = d0 * eta + (eta * cosi - jnp.sqrt(jnp.maximum(kk2, 0.0))) * jnp.where(
        ddn < 0, nrm, -nrm
    )
    refr = refr / jnp.maximum(jnp.linalg.norm(refr, axis=1, keepdims=True), 1e-9)
    is_dragon = (obj == 0)[:, None]
    bd = jnp.where(is_dragon, refr, cosd)
    bo = px + bd * 1e-3
    bact = hitm.astype(jnp.int32)

    print("depth-1 bounce fan:", flush=True)
    kdict = keys(dev, bo, bd)
    # stable compaction: pack dead lanes WITHOUT reshuffling live ones
    # (lax.sort is stable) -- keeps the camera-blocked pixel locality
    # nosort wins with, plus the kernel's dead-tile skipping
    kdict["stable-compact: act"] = 1 - bact
    kdict["stable: act|spec"] = ((1 - bact) << 1) | is_dragon[:, 0].astype(jnp.int32)
    for lbl, key in kdict.items():
        run_fan(dev, bo, bd, bact, t_init, False, lbl, key)
    quarter_bound(dev, bo, bd, bact, t_init, False, None)

    # ---- depth-2 glass-interior fan (the census's 259k-iteration tail:
    # rays INSIDE the dragon after the entry refraction) ----
    iact = (hitm & (obj == 0)).astype(jnp.int32)
    io = px + refr * 1e-3
    t2, tri2, obj2, (n2x, n2y, n2z), _, _ = jax.jit(
        lambda o, d, a: pk.traverse_packet_slim(
            (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
            t_init, dev.pnodes, dev.pltris, dev.proots,
            active=a, count_depth=False,
        )
    )(io, refr, iact)
    jax.block_until_ready(t2)
    px2 = io + refr * t2[:, None]
    nrm2 = jnp.stack([n2x, n2y, n2z], axis=1)
    # exit refraction eta=1.517 (inside->out); TIR lanes reflect
    eta2 = 1.517
    ddn2 = jnp.sum(refr * nrm2, axis=1, keepdims=True)
    cosi2 = jnp.abs(jnp.clip(ddn2, -1.0, 1.0))
    k2v = 1.0 - eta2 * eta2 * (1.0 - cosi2 * cosi2)
    nref = jnp.where(ddn2 < 0, nrm2, -nrm2)
    refl2 = refr - 2.0 * jnp.sum(refr * nref, axis=1, keepdims=True) * nref
    refr2 = refr * eta2 + (eta2 * cosi2 - jnp.sqrt(jnp.maximum(k2v, 0.0))) * nref
    d2 = jnp.where(k2v < 0, refl2, refr2)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=1, keepdims=True), 1e-9)
    o2 = px2 + d2 * 1e-3
    act2 = (iact.astype(bool) & (tri2 >= 0)).astype(jnp.int32)
    ntir = int(np.asarray((k2v[:, 0] < 0) & act2.astype(bool)).sum())
    print(f"depth-2 interior fan ({int(act2.sum())} rays, {ntir} TIR):",
          flush=True)
    k2dict = keys(dev, o2, d2)
    k2dict["stable-compact: act"] = 1 - act2
    for lbl, key in k2dict.items():
        run_fan(dev, o2, d2, act2, t_init, False, lbl, key)
    quarter_bound(dev, o2, d2, act2, t_init, False, 1 - act2)

    # ---- depth-0 NEE shadow fan (ground lanes only) ----
    li = jax.random.bernoulli(k2, 0.5, (n,)).astype(jnp.int32)
    lc = jnp.where(li[:, None] == 0,
                   jnp.array([[10.0, 10.0, 10.0]]),
                   jnp.array([[-10.0, 10.0, -10.0]]))
    sph = jax.random.normal(k3, (n, 3))
    sph = sph / jnp.linalg.norm(sph, axis=1, keepdims=True)
    to_p = px - lc
    face = jnp.where(jnp.sum(sph * to_p, axis=1, keepdims=True) < 0, -sph, sph)
    lp = lc + 5.0 * face
    sd = lp - px
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sd = sd / jnp.maximum(dist, 1e-9)
    so = px + sd * 1e-3
    stm = (dist[:, 0] - 2e-3)
    sact = (hitm & (obj == 1)).astype(jnp.int32)
    print(f"depth-0 shadow fan ({int(sact.sum())} rays):", flush=True)
    sdict = keys(dev, so, sd, extra=li)
    sdict["stable-compact: sneed"] = 1 - sact
    for lbl, key in sdict.items():
        run_fan(dev, so, sd, sact, stm, True, lbl, key)
    quarter_bound(dev, so, sd, sact, stm, True, None)


if __name__ == "__main__":
    main()
