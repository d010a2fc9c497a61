#!/bin/bash
# Serial CPU (host f64) job queue — nice 19 so a live TPU job's dispatch
# loop keeps the core when it wants it. Same protocol as tools/tpu_queue.sh.
#   nohup bash tools/cpu_queue.sh > /tmp/cpuq/runner.log 2>&1 &
#   echo $! > /tmp/cpuq/runner.pid
set -u
QDIR=/tmp/cpuq
mkdir -p "$QDIR/done"
while true; do
  next=$(ls "$QDIR"/*.job 2>/dev/null | sort | head -1 || true)
  if [ -z "${next:-}" ]; then
    sleep 20
    continue
  fi
  name=$(basename "$next")
  echo "[$(date -u +%H:%M:%S)] START $name"
  nice -n 19 bash "$next" > "$QDIR/done/${name%.job}.log" 2>&1
  rc=$?
  mv "$next" "$QDIR/done/$name"
  echo "[$(date -u +%H:%M:%S)] DONE  $name rc=$rc"
done
