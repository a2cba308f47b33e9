#!/bin/bash
# Wider-packet-row wave (round-3 fifth wave): bench config 3 with
# CPUGPU_ROWX=2 then 4 on top of the picked combo against the recorded
# 5.4 Mrays/s baseline, re-pick flags, and refresh the other configs +
# census if the pick changes.  Offline union counts
# (tools/widerow_lab.py): frame iterations 0.66x (2x rows) / 0.52x
# (4x); the occl ns/it data says per-iteration cost is scalar-chain
# bound, so most of that should be wall-clock.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

PICK="CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PIPELINED=1 CPUGPU_OCCL=1"

for rx in 2 4; do
  if ! grep -q '"metric"' $OUT/c3_rowx$rx.log 2>/dev/null; then
    echo "== bench: config 3 + CPUGPU_ROWX=$rx (picked flags) =="
    env $PICK CPUGPU_ROWX=$rx \
      timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/c3_rowx$rx.log || true
  fi
done

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags5.log || true

if grep -q '"source": "c3_rowx' bench_flags.json 2>/dev/null; then
  RX=$(python -c "import json; print(json.load(open('bench_flags.json'))['env'].get('CPUGPU_ROWX','1'))")
  for c in 2 4 5; do
    if ! grep -q '"metric"' $OUT/rowx_c$c.log 2>/dev/null; then
      echo "== final bench: config $c (re-picked rowx flags) =="
      args=""
      [ "$c" = 4 ] && args="--spp 8"
      timeout 3600 python bench.py --config $c $args 2>&1 \
        | tee $OUT/rowx_c$c.log || true
    fi
  done
  if ! grep -q 'total:' $OUT/census_rowx.log 2>/dev/null; then
    env $PICK CPUGPU_ROWX=$RX \
      timeout 3600 python tools/profile_mega_census.py 2>&1 \
      | tee $OUT/census_rowx.log || true
  fi
fi

echo "== rowx wave done =="
