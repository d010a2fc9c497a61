"""tools/watchdog_run.py: stall detection + bounded restart.

The wrapped dummy writes one line to the watched file then sleeps forever
(the wsup16k_fb wedge signature: process alive, log frozen). The watchdog
must kill + restart it, record the event, and exit 1 once the restart
budget is exhausted. A clean-exit dummy must pass through with rc 0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "tools", "watchdog_run.py")


def _run(tmp_path, dummy_body: str, **wd):
    dummy = tmp_path / "dummy.py"
    dummy.write_text(dummy_body)
    watch = tmp_path / "run.jsonl"
    argv = [sys.executable, WATCHDOG, "--watch", str(watch)]
    for k, v in wd.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    argv += ["--", sys.executable, str(dummy), str(watch)]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=120)
    return proc, watch


def test_stalled_run_is_restarted_then_budget_exhausted(tmp_path):
    proc, watch = _run(
        tmp_path,
        "import sys, time\n"
        "open(sys.argv[1], 'a').write('row\\n')\n"
        "time.sleep(3600)\n",
        # grace covers interpreter startup (~6 s when the single host core
        # is contended); the stall clock starts once the first row lands
        stall_sec=3, grace_sec=45, max_restarts=1, poll_sec=0.2,
    )
    assert proc.returncode == 1
    events = [json.loads(l) for l in open(str(watch) + ".watchdog")]
    assert [e["event"] for e in events] == ["stall-restart", "stall-restart"]
    assert events[-1]["restart"] == 2
    # each (re)start wrote its row before stalling
    assert open(watch).read().count("row") == 2


def test_clean_exit_passes_through(tmp_path):
    proc, watch = _run(
        tmp_path,
        "import sys\nopen(sys.argv[1], 'a').write('row\\n')\n",
        stall_sec=5, grace_sec=5, max_restarts=1, poll_sec=0.2,
    )
    assert proc.returncode == 0
    assert not os.path.exists(str(watch) + ".watchdog")


def test_crash_is_restarted(tmp_path):
    proc, watch = _run(
        tmp_path,
        "import sys\nopen(sys.argv[1], 'a').write('row\\n')\nsys.exit(3)\n",
        stall_sec=30, grace_sec=30, max_restarts=1, poll_sec=0.2,
    )
    assert proc.returncode == 1
    events = [json.loads(l) for l in open(str(watch) + ".watchdog")]
    assert all(e["event"] == "crash-restart" and e["rc"] == 3 for e in events)
