"""tools/watchdog_run.py — stall detection + restart for unattended runs
(SURVEY.md section 5 failure detection; born from the r4 wsup16k_fb wedge
where a lost axon RPC reply blocked ``block_until_ready`` forever)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "tools", "watchdog_run.py")


def _run(tmp_path, child_src, **flags):
    log = tmp_path / "run.jsonl"
    child = tmp_path / "child.py"
    child.write_text(child_src)
    cmd = [sys.executable, WATCHDOG, "--watch", str(log)]
    for k, v in flags.items():
        cmd += [f"--{k.replace('_', '-')}", str(v)]
    cmd += ["--", sys.executable, str(child), str(log)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    return proc, log


def test_healthy_child_passes_through(tmp_path):
    # generous windows: interpreter startup alone can exceed 5 s when the
    # single host core is contended by queue jobs (r5 flake)
    proc, log = _run(
        tmp_path,
        "import sys\nopen(sys.argv[1], 'a').write('{\"epoch\": 1}\\n')\n",
        stall_sec=30, grace_sec=30, poll_sec=0.2, max_restarts=1,
    )
    assert proc.returncode == 0, proc.stderr
    assert not os.path.exists(str(log) + ".watchdog")


def test_stalled_child_restarted_then_budget_exhausted(tmp_path):
    # child writes one row then hangs forever -> stall kill, one restart,
    # second stall exhausts max-restarts=1 -> rc 1 + two recorded events
    proc, log = _run(
        tmp_path,
        "import sys, time\n"
        "open(sys.argv[1], 'a').write('{\"epoch\": 1}\\n')\n"
        "time.sleep(600)\n",
        stall_sec=1, grace_sec=0, poll_sec=0.2, max_restarts=1,
    )
    assert proc.returncode == 1, (proc.stdout, proc.stderr)
    events = [json.loads(l) for l in open(str(log) + ".watchdog")]
    assert [e["event"] for e in events] == ["stall-restart", "stall-restart"]
    assert events[-1]["restart"] == 2


def test_crashing_child_counts_against_budget(tmp_path):
    proc, log = _run(
        tmp_path,
        "import sys\nsys.exit(3)\n",
        stall_sec=30, grace_sec=30, poll_sec=0.2, max_restarts=1,
    )
    assert proc.returncode == 1
    events = [json.loads(l) for l in open(str(log) + ".watchdog")]
    assert all(e["event"] == "crash-restart" and e["rc"] == 3 for e in events)
