#!/bin/bash
# Round-4 on-chip A/B queue: the SMEM entry side-table campaign
# (CPUGPU_SMEMTREE, the row-load-floor attack) on configs 3 and 2,
# plus the config-2 no-sort probe.  Each arm is a full bench.py run
# (picked flags + the variant env), so every number is a >=10 s
# pipelined span with the compiled parity gates re-proven on the same
# binaries.  Serialized: one tunneled chip.  Logs one JSON line per
# arm into /tmp/r4_smem/<arm>.json.
set -u
cd /root/repo
OUT=/tmp/r4_smem
mkdir -p $OUT

run() {
  local name=$1; shift
  echo "=== $name ($(date +%T)) cfg=${CFG:-3} spp=${SPP:-1} env: $* ==="
  env "$@" timeout 7200 python bench.py --config "${CFG:-3}" \
    --spp "${SPP:-1}" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "exit=$? $(cat "$OUT/$name.json" 2>/dev/null | head -c 300)"
}

# config 3 (headline): side tables (dense 1-D SMEM layout), both modes,
# and the 2-row fat shadow leaves
CFG=3 run c3_smem1  CPUGPU_SMEMTREE=1
CFG=3 run c3_smem48 CPUGPU_SMEMTREE=48
CFG=3 run c3_occl2  CPUGPU_OCCL2=1

# config 4 (8 spp): the substep driver reuses config 3's warm 1-spp
# executable -- per-ray must now match config 3 by construction
CFG=3 SPP=8 run c4_substeps

# config 2 (small-BVH glTF): baseline rerun (executable cached),
# side tables, and the no-sort probe (sorts ~27 ms of the 118 ms frame)
CFG=2 run c2_base
CFG=2 run c2_smem1  CPUGPU_SMEMTREE=1
CFG=2 run c2_nosort CPUGPU_NO_SORT=1

# config 5 (TLAS animated, flattened): inherit the side tables
CFG=5 run c5_base
CFG=5 run c5_smem1  CPUGPU_SMEMTREE=1

# combined winners (read singles first; kept last so a manual stop can
# re-point them)
CFG=3 run c3_smem1_occl2 CPUGPU_SMEMTREE=1 CPUGPU_OCCL2=1

echo "queue done $(date +%T)"
