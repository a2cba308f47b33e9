#!/bin/bash
# Leaf-14 closest-hit wave (round-3 fourth wave): bench config 3 with
# CPUGPU_LEAF14=1 on top of the picked combo (sweep_dp + framestack +
# condpush + pipelined + occl) against the recorded 5.4 Mrays/s
# baseline (/tmp/r3_measure/c3_occl.log), re-pick flags, and -- if the
# pick changes -- refresh the config 4/5 numbers (config 5 flattens
# instances so the leaf-14 tables apply there too).
#
# Offline iteration counts (tools/leaf14_lab.py): -14% on the d1
# bounce fan, -22% on glass-interior fans, shadow unchanged (already
# on the occl tree).  The bench's parity gate now also proves the
# compiled occl any-hit + leaf-14 closest-hit kernels on the same
# binary (tools/tpu_parity_gate.py).
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

PICK="CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PIPELINED=1"

if ! grep -q '"metric"' $OUT/c3_leaf14.log 2>/dev/null; then
  echo "== bench: config 3 + CPUGPU_LEAF14=1 (picked flags + occl) =="
  env $PICK CPUGPU_OCCL=1 CPUGPU_LEAF14=1 \
    timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/c3_leaf14.log || true
fi

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags4.log || true

# if leaf14 won the pick, refresh the configs it also affects
if grep -q '"source": "c3_leaf14"' bench_flags.json 2>/dev/null; then
  for c in 4 5; do
    if ! grep -q '"metric"' $OUT/leaf14_c$c.log 2>/dev/null; then
      echo "== final bench: config $c (re-picked leaf14 flags) =="
      args=""
      [ "$c" = 4 ] && args="--spp 8"
      timeout 3600 python bench.py --config $c $args 2>&1 \
        | tee $OUT/leaf14_c$c.log || true
    fi
  done
  # census under leaf14 for the README iteration table
  if ! grep -q 'total:' $OUT/census_leaf14.log 2>/dev/null; then
    env $PICK CPUGPU_OCCL=1 CPUGPU_LEAF14=1 \
      timeout 3600 python tools/profile_mega_census.py 2>&1 \
      | tee $OUT/census_leaf14.log || true
  fi
fi

echo "== leaf14 wave done =="
