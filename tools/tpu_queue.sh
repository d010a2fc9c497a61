#!/bin/bash
# Serial TPU job queue runner (committed this time — the /tmp copy died with
# the round-2 and round-3 VMs). One job at a time on the one-process axon
# tunnel; CLAUDE.md "Serialize TPU jobs" rule.
#
#   mkdir -p /tmp/tpuq/done
#   nohup bash tools/tpu_queue.sh > /tmp/tpuq/runner.log 2>&1 &
#   echo $! > /tmp/tpuq/runner.pid
#
# Jobs are bash scripts /tmp/tpuq/NN_name.job, run in NN order; moved to
# /tmp/tpuq/done/ after. Drop-in while running is safe (glob re-evaluated
# each loop). Stop: kill $(cat /tmp/tpuq/runner.pid) — and the live job's
# own pid if one is mid-flight (each job should write its pid somewhere).
set -u
QDIR=/tmp/tpuq
mkdir -p "$QDIR/done"
while true; do
  next=$(ls "$QDIR"/*.job 2>/dev/null | sort | head -1 || true)
  if [ -z "${next:-}" ]; then
    sleep 20
    continue
  fi
  name=$(basename "$next")
  echo "[$(date -u +%H:%M:%S)] START $name"
  bash "$next" > "$QDIR/done/${name%.job}.log" 2>&1
  rc=$?
  mv "$next" "$QDIR/done/$name"
  echo "[$(date -u +%H:%M:%S)] DONE  $name rc=$rc"
done
