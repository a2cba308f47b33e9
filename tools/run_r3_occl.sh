#!/bin/bash
# Occlusion-table wave: re-run the config-4 final bench (the first
# attempt raced a source edit), then the occl A/B -- iteration-count
# lab + full config-3 bench with CPUGPU_OCCL=1 against the recorded
# 5.37 Mrays/s picked-flags baseline (/tmp/r3_measure/final_c3.log).
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

if ! grep -q '"metric"' $OUT/final_c4.log 2>/dev/null; then
  echo "== final bench: config 4 (picked flags, 8 spp) =="
  timeout 3600 python bench.py --config 4 --spp 8 2>&1 | tee $OUT/final_c4.log || true
fi

if ! grep -q 'parity' $OUT/occl_lab.log 2>/dev/null; then
  echo "== occl_lab: shadow-fan iteration A/B =="
  timeout 3600 python tools/occl_lab.py 2>&1 | tee $OUT/occl_lab.log || true
fi

if ! grep -q '"metric"' $OUT/c3_occl.log 2>/dev/null; then
  echo "== bench: config 3 + CPUGPU_OCCL=1 (picked flags) =="
  CPUGPU_OCCL=1 timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/c3_occl.log || true
fi

echo "== occl wave done =="
