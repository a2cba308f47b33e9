#!/bin/bash
# Round-3 third wave: pipelined-SPLIT A/Bs (the software-pipelined body
# re-targeted at the split tables after the fused table proved
# worker-lethal on the deployed toolchain). Run after run_r3_rest.sh's
# benches; re-picks flags, refreshes the headline, then the probes and
# labs the rest queue would have run.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

NOFLAGS="CPUGPU_FRAMESTACK= CPUGPU_FUSED= CPUGPU_PIPELINED= CPUGPU_NEAREST= CPUGPU_CTZ_CHAIN= CPUGPU_CONDPUSH= CPUGPU_PACKET_TREE="

bench() {  # bench <logname> <config> [env...]
  local log=$1 cfg=$2; shift 2
  echo "== bench: $log (config $cfg: $*) =="
  if ! env $NOFLAGS "$@" timeout 3600 python bench.py --config $cfg 2>&1 | tee $OUT/$log.log; then
    echo "bench $log FAILED" | tee -a $OUT/failures.log
  fi
}

bench c3_pipe2       3 CPUGPU_PIPELINED=1
bench c3_fs_cp_pipe  3 CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PIPELINED=1
bench c3_tree_pipe   3 CPUGPU_PACKET_TREE=sweep_dp CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PIPELINED=1

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags3.log || true

# refresh the headline + config-5 numbers under the final picked flags
timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/final3_c3.log || true
timeout 3600 python bench.py --config 5 2>&1 | tee $OUT/final3_c5.log || true

# fused crash repro probes (benches all done; crashes now harmless)
echo "== mk_probe: fused repro =="
env $NOFLAGS CPUGPU_FUSED=1 timeout 1800 python tools/mk_probe.py 2>&1 \
  | tee $OUT/probe_fused.log || true
echo "== mk_probe: default sanity =="
env $NOFLAGS timeout 1800 python tools/mk_probe.py 2>&1 \
  | tee $OUT/probe_default.log || true

# attribution labs with whatever time remains
echo "== floor probe =="
timeout 3600 python tools/floor_probe.py 2>&1 | tee $OUT/floor_probe.log || true
echo "== kernel lab2 matrix =="
timeout 10800 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2.log || true
echo "== census c3 =="
timeout 3600 python tools/profile_mega_census.py 3 2>&1 | tee $OUT/census_c3.log || true

echo "== pipe wave done =="
