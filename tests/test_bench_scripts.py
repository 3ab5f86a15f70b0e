"""Guard the bench harness's subprocess script strings.

bench.py's host controls (_CONTROL_SCRIPT, _BANDWIDTH_SCRIPT) are Python
source embedded in strings and only ever executed inside the scaling
recording — a syntax error or API drift there would first surface
~30 minutes into a driver bench run and void the round's artifact.
Compile them at test time and smoke-run each with minimal work."""

from __future__ import annotations

import subprocess
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_scripts_compile():
    bench = _bench()
    compile(bench._CONTROL_SCRIPT, "<control>", "exec")
    compile(bench._BANDWIDTH_SCRIPT, "<bandwidth>", "exec")


def test_control_script_runs_minimal():
    bench = _bench()
    proc = subprocess.run(
        [sys.executable, "-c", bench._CONTROL_SCRIPT, "2", "1"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert float(proc.stdout.strip().splitlines()[-1]) > 0


def test_bandwidth_script_runs_minimal():
    bench = _bench()
    proc = subprocess.run(
        [sys.executable, "-c", bench._BANDWIDTH_SCRIPT, "2", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert float(proc.stdout.strip().splitlines()[-1]) > 0


def test_rotate_window_planner_consistency():
    """The verification-window planner must parse the live registration
    order, agree with the CORRECTNESS artifacts on never-green queries,
    and keep every never-green query inside the suggested window."""
    sys.path.insert(0, "/root/repo/tools")
    import rotate_window as rw

    names = rw.registration_order()
    assert len(names) == len(set(names)) >= 80
    hist = rw.history()
    order = rw.suggest(names, hist)
    assert sorted(order) == sorted(names)
    never = [
        n for n in names
        if not any(s == "green" for s in hist.get(n, {}).values())
    ]
    assert all(order.index(n) < rw.WINDOW for n in never)
