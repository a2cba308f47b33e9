#!/bin/bash
# Random-scene fuzz (tests/test_fuzz_scenes.py) under every flagged
# kernel combo.  The flags are read ONCE at import, so each combo needs
# a fresh interpreter -- this cannot live inside the pytest suite.
# All six combos passed on 2026-08-18 (8 tests each, CPU interpret).
set -u
cd "$(dirname "$0")/.."
for combo in \
  "CPUGPU_FRAMESTACK=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1" \
  "CPUGPU_FUSED=1 CPUGPU_PIPELINED=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_NEAREST=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_CTZ_CHAIN=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1" \
  "CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1" \
  "CPUGPU_PACKET_TREE=sweep_dp" \
  "CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1" \
  "CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1" \
  "CPUGPU_PACKET_TREE=w16" \
  "CPUGPU_PACKET_TREE=w16 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1" \
  "CPUGPU_PACKET_TREE=w16 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1"; do
  echo "=== $combo ==="
  env PYTHONPATH= JAX_PLATFORMS=cpu $combo \
    python -m pytest tests/test_fuzz_scenes.py -q 2>&1 | tail -1
done
