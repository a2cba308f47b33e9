#!/bin/bash
# Poll the axon TPU tunnel; when a device probe succeeds, run the round-3
# measurement queue (tools/run_r3_measure.sh).  Status lines land in
# /tmp/tunnel_wait.log; measurement logs in /tmp/r3_measure/.
set -u
cd /root/repo
LOG=/tmp/tunnel_wait.log
: > $LOG
while true; do
  if timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
      >> $LOG 2>&1; then
    echo "$(date +%T) tunnel UP" >> $LOG
    bash tools/run_r3_measure.sh >> $LOG 2>&1
    echo "$(date +%T) measurement queue DONE" >> $LOG
    exit 0
  fi
  echo "$(date +%T) tunnel still down" >> $LOG
  sleep 120
done
