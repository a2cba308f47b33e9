"""Select the fastest PROVEN kernel-flag combo from the measure logs.

tools/run_r3_measure.sh benches config 3 under every candidate flag
combo (frame-stack / fused tables / pipelined body / nearest pop).
This script parses those logs, keeps only runs whose compiled parity
gates passed (bench re-proves hit exactness on the same binary), and
writes the winner's environment to bench_flags.json at the repo root.
bench.py applies that file via os.environ.setdefault at startup, so
the driver's end-of-round `python bench.py` picks up the best on-chip
configuration even if nobody is around to flip defaults by hand.

A combo must beat the default by >2% to be written (tunnel timing
noise is a few percent across ~10 s spans); explicit env vars on the
bench command line still override the file.

Usage: python tools/pick_bench_flags.py [/tmp/r3_measure]
"""

from __future__ import annotations

import json
import os
import sys

# logname -> env, mirroring run_r3_measure.sh's bench invocations
COMBOS = {
    "c3_default": {},
    "c3_full": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
    },
    "c3_full_ctzchain": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_CTZ_CHAIN": "1",
    },
    "c3_full_near": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_NEAREST": "1",
    },
    "c3_full_cp": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_CONDPUSH": "1",
    },
    "c3_framestack": {"CPUGPU_FRAMESTACK": "1"},
    "c3_pipe": {"CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1"},
    "c3_fs_fused": {"CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1"},
    "c3_fused": {"CPUGPU_FUSED": "1"},
    "c3_tree": {"CPUGPU_PACKET_TREE": "sweep_dp"},
    "c3_tree_full": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_PACKET_TREE": "sweep_dp",
    },
    "c3_tree_full_cp": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_FUSED": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PACKET_TREE": "sweep_dp",
    },
    # supplementary combos (tools/run_r3_supplement.sh): condpush and
    # nearest WITHOUT the fused/pipelined pair -- the full-combo crash
    # isolation left these unmeasured in the main queue
    "c3_fs_cp": {"CPUGPU_FRAMESTACK": "1", "CPUGPU_CONDPUSH": "1"},
    "c3_fs_near_cp": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_NEAREST": "1",
        "CPUGPU_CONDPUSH": "1",
    },
    "c3_tree_fs_cp": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_CONDPUSH": "1",
        "CPUGPU_PACKET_TREE": "sweep_dp",
    },
    "c3_w16_cp": {"CPUGPU_PACKET_TREE": "w16", "CPUGPU_CONDPUSH": "1"},
    # pipelined-SPLIT variants (round-3 second wave: the pipelined body
    # no longer needs the worker-crashing fused table)
    "c3_pipe2": {"CPUGPU_PIPELINED": "1"},
    "c3_fs_cp_pipe": {
        "CPUGPU_FRAMESTACK": "1", "CPUGPU_CONDPUSH": "1",
        "CPUGPU_PIPELINED": "1",
    },
    "c3_tree_pipe": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
    },
    "c3_w16_pipe": {"CPUGPU_PACKET_TREE": "w16", "CPUGPU_PIPELINED": "1"},
    "c3_w16_pipe_cp": {
        "CPUGPU_PACKET_TREE": "w16", "CPUGPU_PIPELINED": "1",
        "CPUGPU_CONDPUSH": "1",
    },
    # width-16 node rows (frame-stack + nearest are implied by the
    # width; fused/pipelined/condpush compose as usual)
    "c3_w16": {"CPUGPU_PACKET_TREE": "w16"},
    "c3_w16_full": {
        "CPUGPU_PACKET_TREE": "w16", "CPUGPU_FUSED": "1",
        "CPUGPU_PIPELINED": "1",
    },
    "c3_w16_full_cp": {
        "CPUGPU_PACKET_TREE": "w16", "CPUGPU_FUSED": "1",
        "CPUGPU_PIPELINED": "1", "CPUGPU_CONDPUSH": "1",
    },
    # SMEM entry side tables on top of the round-3 pick (round-4,
    # tools/run_r4_smem.sh: the round-4 WINNER at 6.76 Mrays/s)
    "c3_smem1": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_SMEMTREE": "1",
    },
    "c3_smem48": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_SMEMTREE": "48",
    },
    # 2-row fat occlusion leaves (round-4, measured LOSS 5.19)
    "c3_occl2": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_OCCL2": "1",
    },
    # occlusion-specialized any-hit tables on top of the picked combo
    # (round-3 third wave, tools/run_r3_occl.sh)
    "c3_occl": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1",
    },
    # leaf-14 closest-hit tables (round-3 fourth wave,
    # tools/run_r3_leaf14.sh): the megakernel's closest-hit traversal
    # also rides the 14-record tree, payload rows in parallel
    "c3_leaf14": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_LEAF14": "1",
    },
    # wider packet rows (round-3 fifth wave, tools/run_r3_rowx.sh):
    # each stack drives 2 or 4 sublanes -- offline union counts say
    # 0.66x / 0.52x frame iterations (tools/widerow_lab.py)
    "c3_rowx2": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_ROWX": "2",
    },
    "c3_rowx4": {
        "CPUGPU_PACKET_TREE": "sweep_dp", "CPUGPU_FRAMESTACK": "1",
        "CPUGPU_CONDPUSH": "1", "CPUGPU_PIPELINED": "1",
        "CPUGPU_OCCL": "1", "CPUGPU_ROWX": "4",
    },
}


def last_json_line(path: str):
    try:
        with open(path) as f:
            lines = f.read().splitlines()
    except OSError:
        return None
    for ln in reversed(lines):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return None


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_measure"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for name, env in COMBOS.items():
        rec = last_json_line(os.path.join(logdir, f"{name}.log"))
        if rec is None or "value" not in rec:
            continue
        extra = rec.get("extra", {})
        ok = extra.get("compiled_parity_ok")
        ok_i = extra.get("compiled_parity_instanced_ok")
        results.append(
            dict(name=name, env=env, mrays=float(rec["value"]),
                 parity=bool(ok) and bool(ok_i))
        )
    if not results:
        print("pick_bench_flags: no results parsed; nothing written")
        return
    base = next((r for r in results if r["name"] == "c3_default"), None)
    proven = [r for r in results if r["parity"]]
    for r in sorted(results, key=lambda r: -r["mrays"]):
        print(f"  {r['name']:>18}: {r['mrays']:6.2f} Mrays/s parity={r['parity']}")
    if not proven:
        print("pick_bench_flags: no parity-proven run; nothing written")
        return
    best = max(proven, key=lambda r: r["mrays"])
    floor = (base["mrays"] * 1.02) if base else 0.0
    chosen = best if best["mrays"] > floor else dict(
        name="c3_default", env={}, mrays=base["mrays"] if base else 0.0,
        parity=True,
    )
    out = os.path.join(repo, "bench_flags.json")
    with open(out, "w") as f:
        json.dump(
            dict(env=chosen["env"], source=chosen["name"],
                 mrays_measured=chosen["mrays"], logdir=logdir),
            f, indent=1,
        )
    print(f"pick_bench_flags: wrote {out} <- {chosen['name']} "
          f"({chosen['mrays']} Mrays/s)")


if __name__ == "__main__":
    main()
