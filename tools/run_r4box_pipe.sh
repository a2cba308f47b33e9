#!/bin/bash
# Pipelined-split wave, re-run on the fresh box (the original
# /tmp/r3_measure logs were lost with the previous machine, and bench
# timings are only comparable within one box/tunnel).  Re-establish the
# baseline + sweep_dp reference points HERE, then the pipelined A/Bs,
# then re-pick flags and refresh the five-config round numbers.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

NOFLAGS="CPUGPU_FRAMESTACK= CPUGPU_FUSED= CPUGPU_PIPELINED= CPUGPU_NEAREST= CPUGPU_CTZ_CHAIN= CPUGPU_CONDPUSH= CPUGPU_PACKET_TREE="

bench() {  # bench <logname> <config> [env assignments...]
  local log=$1 cfg=$2; shift 2
  if grep -q '"metric"' $OUT/$log.log 2>/dev/null; then
    echo "== bench: $log already done, skipping =="
    return
  fi
  echo "== bench: $log (config $cfg: $*) =="
  if ! env $NOFLAGS "$@" timeout 3600 python bench.py --config $cfg 2>&1 | tee $OUT/$log.log; then
    echo "bench $log FAILED" | tee -a $OUT/failures.log
  fi
}

# reference points on THIS box
bench c3_default    3
bench c3_tree       3 CPUGPU_PACKET_TREE=sweep_dp

# pipelined-split A/Bs
bench c3_pipe2      3 CPUGPU_PIPELINED=1
bench c3_tree_pipe  3 CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PIPELINED=1

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags3.log || true

# refresh the five-config round numbers under the picked flags
for c in 1 2 3 5; do
  if ! grep -q '"metric"' $OUT/final_c$c.log 2>/dev/null; then
    echo "== final bench: config $c (picked flags) =="
    timeout 3600 python bench.py --config $c 2>&1 | tee $OUT/final_c$c.log || true
  fi
done
if ! grep -q '"metric"' $OUT/final_c4.log 2>/dev/null; then
  echo "== final bench: config 4 (picked flags, 8 spp) =="
  timeout 3600 python bench.py --config 4 --spp 8 2>&1 | tee $OUT/final_c4.log || true
fi

echo "== pipe wave (fresh box) done =="
