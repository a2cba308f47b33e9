#!/bin/bash
# Round-3 supplementary A/Bs: combos the main queue left unmeasured
# once the fused/pipelined full combos crashed the TPU worker on-chip
# (condpush + nearest WITHOUT the fused pair, w16 + condpush).  Run
# AFTER tools/run_r3_measure.sh's section-1 benches; re-picks flags.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

NOFLAGS="CPUGPU_FRAMESTACK= CPUGPU_FUSED= CPUGPU_PIPELINED= CPUGPU_NEAREST= CPUGPU_CTZ_CHAIN= CPUGPU_CONDPUSH= CPUGPU_PACKET_TREE="

bench() {
  local log=$1; shift
  echo "== bench: $log ($*) =="
  if ! env $NOFLAGS "$@" timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/$log.log; then
    echo "bench $log FAILED" | tee -a $OUT/failures.log
  fi
}

bench c3_fs_cp       CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1
bench c3_fs_near_cp  CPUGPU_FRAMESTACK=1 CPUGPU_NEAREST=1 CPUGPU_CONDPUSH=1
bench c3_tree_fs_cp  CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PACKET_TREE=sweep_dp
bench c3_w16_cp      CPUGPU_PACKET_TREE=w16 CPUGPU_CONDPUSH=1

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags2.log || true

# refresh the headline number under the (possibly new) picked flags
timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/final2_c3.log || true
echo "== supplement done =="
