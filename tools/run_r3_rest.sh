#!/bin/bash
# Round-3 measurement queue, corrected remainder. Replaces the tail of
# run_r3_measure.sh after the on-chip isolation proved CPUGPU_FUSED=1
# alone crashes the TPU worker at runtime (every fused combo is
# skipped; see c3_fused.log / c3_full*.log). Order: the remaining
# useful section-1 A/Bs -> supplementary condpush/nearest combos ->
# pick flags -> c1 whitted A/B -> c5 (non-fused variants) -> final
# five-config sweep under picked flags -> fused crash probes (crashes
# can no longer contaminate benches) -> attribution labs.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

NOFLAGS="CPUGPU_FRAMESTACK= CPUGPU_FUSED= CPUGPU_PIPELINED= CPUGPU_NEAREST= CPUGPU_CTZ_CHAIN= CPUGPU_CONDPUSH= CPUGPU_PACKET_TREE="

# wait for the orphaned in-flight c3_tree bench to settle
for i in $(seq 1 120); do
  grep -q '"metric"\|Error\|FAILED' $OUT/c3_tree.log 2>/dev/null && break
  sleep 15
done

bench() {  # bench <logname> <config> [env assignments...]
  local log=$1 cfg=$2; shift 2
  echo "== bench: $log (config $cfg: $*) =="
  if ! env $NOFLAGS "$@" timeout 3600 python bench.py --config $cfg 2>&1 | tee $OUT/$log.log; then
    echo "bench $log FAILED" | tee -a $OUT/failures.log
  fi
}

# remaining useful section-1 A/Bs (non-fused only)
bench c3_w16         3 CPUGPU_PACKET_TREE=w16
bench c3_w16_cp      3 CPUGPU_PACKET_TREE=w16 CPUGPU_CONDPUSH=1
bench c3_fs_cp       3 CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1
bench c3_fs_near_cp  3 CPUGPU_FRAMESTACK=1 CPUGPU_NEAREST=1 CPUGPU_CONDPUSH=1
bench c3_tree_fs_cp  3 CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1 CPUGPU_PACKET_TREE=sweep_dp

python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags.log || true

# c1 whitted kernel A/B
bench c1_wkernel     1
env $NOFLAGS CPUGPU_NO_WHITTED_KERNEL=1 timeout 3600 python bench.py --config 1 2>&1 \
  | tee $OUT/c1_nokernel.log || true

# config 5 (flattened instancing; w16 WITHOUT the fused pair)
bench c5_default     5
bench c5_framestack  5 CPUGPU_FRAMESTACK=1 CPUGPU_CONDPUSH=1
bench c5_w16         5 CPUGPU_PACKET_TREE=w16

# final numbers: all five configs under the PICKED flags
for c in 1 2 3 5; do
  echo "== final bench: config $c (picked flags) =="
  timeout 3600 python bench.py --config $c 2>&1 | tee $OUT/final_c$c.log || true
done
echo "== final bench: config 4 (picked flags, 8 spp) =="
timeout 3600 python bench.py --config 4 --spp 8 2>&1 | tee $OUT/final_c4.log || true

# fused crash repro probes (small wavefront, one compile each); these
# may crash the worker -- that is the point, and benches are done
echo "== mk_probe: fused repro =="
env $NOFLAGS CPUGPU_FUSED=1 timeout 1800 python tools/mk_probe.py 2>&1 \
  | tee $OUT/probe_fused.log || true
echo "== mk_probe: fused+pipelined repro =="
env $NOFLAGS CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 timeout 1800 python tools/mk_probe.py 2>&1 \
  | tee $OUT/probe_fused_pipe.log || true
echo "== mk_probe: default sanity =="
env $NOFLAGS timeout 1800 python tools/mk_probe.py 2>&1 \
  | tee $OUT/probe_default.log || true

# attribution labs (long; each independently timed out)
echo "== floor probe =="
timeout 3600 python tools/floor_probe.py 2>&1 | tee $OUT/floor_probe.log || true
echo "== lab3: 16-wide kernel ns/iter =="
timeout 7200 python tools/profile_lab3.py 2>&1 | tee $OUT/lab3.log || true
echo "== kernel lab2 matrix =="
timeout 10800 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2.log || true
echo "== census c3 =="
timeout 3600 python tools/profile_mega_census.py 3 2>&1 | tee $OUT/census_c3.log || true

echo "== rest done =="
