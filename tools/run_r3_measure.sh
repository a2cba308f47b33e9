#!/bin/bash
# Round-3 on-chip measurement queue (run when the TPU tunnel is back).
# Outputs land in /tmp/r3_measure/. Each step is independently resumable.
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd /root/repo

echo "== 1. floor probe (per-iteration attribution) =="
timeout 3600 python tools/floor_probe.py 2>&1 | tee $OUT/floor_probe.log

echo "== 2. kernel lab2: framestack / fused decode / gated leaf on the bounce fan =="
timeout 7200 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2.log

echo "== 2b. staging amortization: GROUPS=8 re-run, framestack variants only =="
LAB2_GROUPS=8 LAB2_ONLY=framestack timeout 7200 python tools/profile_lab2.py 2>&1 | tee $OUT/lab2_g8.log

echo "== 3. production A/B: config 3, linear stack =="
timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/bench_c3_linear.log

echo "== 4. production A/B: config 3, frame stack =="
CPUGPU_FRAMESTACK=1 timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/bench_c3_framestack.log

echo "== 4b. production A/B: config 3, frame stack + fused tables =="
CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/bench_c3_fs_fused.log

echo "== 4c. production A/B: config 3, fused + pipelined body (linear stack) =="
CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/bench_c3_pipe.log

echo "== 4d. production A/B: config 3, frame stack + fused + pipelined =="
CPUGPU_FRAMESTACK=1 CPUGPU_FUSED=1 CPUGPU_PIPELINED=1 timeout 3600 python bench.py --config 3 2>&1 | tee $OUT/bench_c3_fs_pipe.log

echo "== 5. census: per-depth iterations after the any-hit row flush =="
timeout 3600 python tools/profile_mega_census.py 3 2>&1 | tee $OUT/census_c3.log

echo "== 6. config 5 bench (instanced/TLAS regression check) =="
timeout 3600 python bench.py --config 5 2>&1 | tee $OUT/bench_c5.log

echo "== done =="
