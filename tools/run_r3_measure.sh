#!/bin/bash
# Round-3 on-chip measurement queue (run when the TPU tunnel is back).
# Outputs land in /tmp/r3_measure/. Each step is independently resumable.
# DECISIVE production A/Bs run FIRST (they pick the default flags for
# BENCH_r03); attribution labs follow.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

# NOTE: bench.py applies bench_flags.json (written by pick_bench_flags
# below) via setdefault.  The script is resumable, so a bench_flags.json
# from an earlier pass could otherwise leak into these A/Bs via the
# setdefault: bench() pins EVERY known flag empty first, then the
# per-run assignments override (later `env` assignments win).
NOFLAGS="CPUGPU_FRAMESTACK= CPUGPU_FUSED= CPUGPU_PIPELINED= CPUGPU_NEAREST= CPUGPU_CTZ_CHAIN= CPUGPU_CONDPUSH= CPUGPU_PACKET_TREE="

bench() {  # bench <logname> [env assignments...]
  local log=$1; shift
  echo "== bench: $log ($*) =="
  if ! env $NOFLAGS "$@" timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/$log.log; then
    echo "bench $log FAILED" | tee -a $OUT/failures.log
  fi
}

# 1. decisive production A/Bs on config 3
bench c3_default      $NOFLAGS
bench c3_full         CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1
# if the frame-stack compile failed (scalar popcount?), retry with the
# compare-chain ctz before concluding anything
if grep -q "FAILED\|Error" $OUT/c3_full.log 2>/dev/null; then
  bench c3_full_ctzchain CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CTZ_CHAIN=1
fi
bench c3_full_near    CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_NEAREST=1
bench c3_full_cp      CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1
bench c3_framestack   CPUGPU_FRAMESTACK=1
bench c3_pipe         CPUGPU_FUSED=1 CPUGPU_PIPELINED=1
bench c3_fs_fused     CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1
bench c3_fused        CPUGPU_FUSED=1
# device-tree variant (tools/tree_lab.py: sweep_dp = -11% frame
# iterations offline; DP fill 6.5/8 makes the linear push loop pricier,
# which the frame stack makes fill-independent -- test both pairings)
bench c3_tree         CPUGPU_PACKET_TREE=sweep_dp
bench c3_tree_full    CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_PACKET_TREE=sweep_dp
bench c3_tree_full_cp CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1 CPUGPU_PACKET_TREE=sweep_dp
# width-16 production tables (tools/tree_lab16.py: ~85% of sweep_dp
# frame iterations offline; frame-stack + nearest implied by the width;
# Mosaic compile time of the 16-child slab unroll is itself a risk --
# a FAILED line here means the doubled body blew the compiler budget)
bench c3_w16          CPUGPU_PACKET_TREE=w16
bench c3_w16_full     CPUGPU_PACKET_TREE=w16 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1
bench c3_w16_full_cp  CPUGPU_PACKET_TREE=w16 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 CPUGPU_CONDPUSH=1

# pick the fastest parity-proven combo NOW (the queue may be cut short
# if the tunnel drops again): bench.py and the driver's end-of-round
# bench will apply it from bench_flags.json
python tools/pick_bench_flags.py $OUT 2>&1 | tee $OUT/pick_flags.log || true

# 1b. whole-frame Whitted kernel on config 1 (Mosaic compile risk:
# first time this kernel meets the real compiler; NO_WHITTED_KERNEL is
# the baseline). If the kernel run fails, record it -- the TPU gate in
# scene.whitted_kernel_active must then grow a compile-tested guard.
echo "== bench: c1 whitted kernel A/B =="
env $NOFLAGS timeout 3600 python bench.py --config 1 2>&1 \
  | tee $OUT/c1_wkernel.log || true
env $NOFLAGS CPUGPU_NO_WHITTED_KERNEL=1 timeout 3600 python bench.py --config 1 2>&1 \
  | tee $OUT/c1_nokernel.log || true

# 2. config 5 (flattened instancing rides the same flags)
echo "== bench: c5 default and full =="
env $NOFLAGS timeout 3600 python bench.py --config 5 2>&1 \
  | tee $OUT/c5_default.log || true
env $NOFLAGS CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 \
  timeout 3600 python bench.py --config 5 2>&1 | tee $OUT/c5_full.log || true
# flattened scenes keep width 16 (the TLAS rows widen on splice), so
# config 5 can ride the W16 tables directly
env $NOFLAGS CPUGPU_PACKET_TREE=w16 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 \
  timeout 3600 python bench.py --config 5 2>&1 | tee $OUT/c5_w16.log || true

# 2b. final numbers: all five configs under the PICKED flags
# (bench.py reads bench_flags.json; config 4 = config 3 at 8 spp).
# These are the round-end README numbers -- run them before the long
# attribution labs in case the tunnel drops again.
for c in 1 2 3 5; do
  echo "== final bench: config $c (picked flags) =="
  timeout 3600 python bench.py --config $c 2>&1 | tee $OUT/final_c$c.log || true
done
echo "== final bench: config 4 (picked flags, 8 spp) =="
timeout 3600 python bench.py --config 4 --spp 8 2>&1 | tee $OUT/final_c4.log || true

# 3. per-iteration attribution
echo "== floor probe (incl. fctrl frame-stack stage) =="
timeout 3600 python tools/floor_probe.py 2>&1 | tee $OUT/floor_probe.log || true

# 4. kernel lab2 matrix on the real bounce fan (iterations + leaf fraction)
echo "== kernel lab2: framestack / fused / gated leaf / pipelined / nearest =="
timeout 10800 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2.log || true

echo "== lab2 GROUPS=8 staging A/B (framestack variants only) =="
LAB2_GROUPS=8 LAB2_ONLY=framestack timeout 7200 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2_g8.log || true

# 4b. 16-wide lab kernel: the one number that needs the chip is
# ns/iteration (tools/tree_lab16.py already proved parity + counted
# iterations offline: W16 tables, doubled slab, same scalar chain)
echo "== lab3: 16-wide kernel ns/iter =="
timeout 7200 python tools/profile_lab3.py 2>&1 | tee $OUT/lab3.log || true

# 5. census: per-depth iterations after the any-hit row flush
echo "== census c3 =="
timeout 3600 python tools/profile_mega_census.py 3 2>&1 | tee $OUT/census_c3.log || true

echo "== done =="
