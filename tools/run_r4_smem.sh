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
  echo "=== $name ($(date +%T)) env: $* ==="
  env "$@" timeout 7200 python bench.py --config "${CFG:-3}" \
    > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "exit=$? $(cat "$OUT/$name.json" 2>/dev/null | head -c 300)"
}

# config 3 (headline): side tables, both modes
CFG=3 run c3_smem1  CPUGPU_SMEMTREE=1
CFG=3 run c3_smem48 CPUGPU_SMEMTREE=48

# config 2: inherit the winner-agnostic probes
CFG=2 run c2_base
CFG=2 run c2_smem1  CPUGPU_SMEMTREE=1
CFG=2 run c2_smem48 CPUGPU_SMEMTREE=48

echo "queue done $(date +%T)"
