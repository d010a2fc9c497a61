#!/bin/bash
# Round-end quiesce: stop BOTH job-queue runners and every process they
# spawned, so the driver's post-round bench.py gets the axon tunnel and the
# one host core to itself (VERDICT r3 weak#1: a live queue job contaminated
# BENCH_r03 — headline 193.8 vs 206, assembly 3064 ms vs 312).
#
#   bash tools/quiesce.sh
#
# Why a tree walk: queue jobs wrap training in tools/watchdog_run.py, which
# starts the trainer with start_new_session=True — killing the runner's
# process group alone leaves the TPU job alive and holding the tunnel. The
# trainer is still a CHILD of the watchdog though, so walking ppid links
# from each runner pid reaches everything. Never pkill -f (CLAUDE.md).
set -u

descendants() {  # print all descendant pids of $1, depth-first
  local pid=$1 child
  for child in $(ps -eo pid=,ppid= | awk -v p="$pid" '$2==p{print $1}'); do
    descendants "$child"
    echo "$child"
  done
}

for q in /tmp/tpuq /tmp/cpuq; do
  [ -f "$q/runner.pid" ] || continue
  rpid=$(cat "$q/runner.pid")
  if ! kill -0 "$rpid" 2>/dev/null; then
    echo "$q: runner $rpid already gone"
    continue
  fi
  # runner first so it cannot start the next job, then children deepest-first.
  # Re-snapshot in a short loop (ADVICE r4): a watchdog child mid-restart can
  # spawn a trainer AFTER the first snapshot; iterate until the set is empty.
  kill "$rpid" 2>/dev/null
  for attempt in 1 2 3 4 5; do
    kids=$(descendants "$rpid")
    [ -z "$kids" ] && break
    for pid in $kids; do kill "$pid" 2>/dev/null; done
    sleep 3
    for pid in $kids; do kill -9 "$pid" 2>/dev/null; done
    sleep 1
  done
  kill -0 "$rpid" 2>/dev/null && kill -9 "$rpid" 2>/dev/null
  echo "$q: killed runner $rpid + descendants (last set:" $kids ")"
done

# park unstarted jobs so a restarted runner can't pick them up mid-bench
for q in /tmp/tpuq /tmp/cpuq; do
  mkdir -p "$q/parked"
  mv "$q"/*.job "$q/parked/" 2>/dev/null
done

sleep 2
left=$(ps -eo pid=,comm=,args= | grep -E 'ns_run|hole_run|stretch_run|td_cascade|watchdog_run|build_ns_cache|gen_warm|ns_mu_ab|ns_refine' | grep -v grep || true)
if [ -n "$left" ]; then
  echo "WARNING: survivors still running:"
  echo "$left"
  exit 1
fi
echo "quiesced: no queue processes left"
