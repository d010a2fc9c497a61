"""Stall watchdog for unattended TPU training runs.

Motivation (runs/r4/RESULTS.md, wsup16k_fb wedge): a scan-block dispatch's
RPC reply was lost by the axon tunnel and the trainer blocked forever in
``block_until_ready`` — 0.3% CPU, ESTAB socket, nothing queued — while a
fresh process could use the chip fine. ``jax.block_until_ready`` has no
timeout, so in-process recovery is impossible; the honest fix is
process-level: watch the run's JSONL eval log (the trainer flushes it every
``eval_every`` epochs) and kill + restart the command when the log stops
moving for much longer than the expected eval cadence.

    python tools/watchdog_run.py --watch runs/r4/foo.jsonl --stall-sec 2400 \
        --max-restarts 2 -- python tools/ns_run.py --log runs/r4/foo.jsonl ...

The wrapped command must be restart-tolerant: either idempotent from
scratch (the default recipes are — a restart costs the progress since
launch) or resumable via its own --ckpt-dir/--resume flags, in which case
pass those in the command. Restarts append a JSON line to ``--watch`` +
``.watchdog`` so the event is part of the run's committed evidence.

No reference counterpart (the reference has no failure detection at all);
SURVEY.md section 5 "failure detection/recovery".
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def _mtime(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except FileNotFoundError:
        return 0.0


def _kill_tree(proc: subprocess.Popen) -> None:
    """SIGTERM then SIGKILL the child's process group (never pkill -f)."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, 10.0), (signal.SIGKILL, 5.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        deadline = time.time() + grace
        while time.time() < deadline:
            if proc.poll() is not None:
                return
            time.sleep(0.5)


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--watch", required=True,
                    help="file the run appends to every eval (JSONL log)")
    ap.add_argument("--stall-sec", type=float, default=2400.0,
                    help="no-write window that counts as a stall; set to "
                         ">=3x the expected eval-row cadence")
    ap.add_argument("--grace-sec", type=float, default=900.0,
                    help="extra allowance before the FIRST write (setup + "
                         "compile + first eval window)")
    ap.add_argument("--max-restarts", type=int, default=2)
    ap.add_argument("--poll-sec", type=float, default=30.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (append: -- python tools/... )")

    events = args.watch + ".watchdog"
    restarts = 0
    while True:
        start = time.time()
        # new session => own process group, so _kill_tree cannot hit us
        proc = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    return 0
                break  # crashed: counts against max-restarts too
            m = _mtime(args.watch)
            ref = max(m, start)
            budget = args.stall_sec + (args.grace_sec if m < start else 0.0)
            if time.time() - ref > budget:
                stalled = True
                _kill_tree(proc)
                break
            time.sleep(args.poll_sec)
        restarts += 1
        ev = {
            "ts": time.time(),
            "event": "stall-restart" if stalled else "crash-restart",
            "rc": proc.returncode,
            "restart": restarts,
            "of": args.max_restarts,
        }
        with open(events, "a") as f:
            f.write(json.dumps(ev) + "\n")
        print(f"watchdog: {ev}", flush=True)
        if restarts > args.max_restarts:
            print("watchdog: restart budget exhausted", flush=True)
            return 1


if __name__ == "__main__":
    sys.exit(main())
