"""Calm-window watcher for the scaling recordings (BASELINE.md protocol
v5): Recordings D/E were launched only after two consecutive STREAM-triad
probes measured a pinned 2->8-core speedup >= 2.3x — that threshold marks
a host phase where the shared memory bus is quiet enough for the engine's
bandwidth-bound stages to scale. This tool makes that ad-hoc watcher a
committed, repeatable step.

One probe = bench._BANDWIDTH_SCRIPT (fixed-total-work a=b+2.5*c triads,
~96 MB working set per worker, >> LLC) run back-to-back pinned to 2 then
8 cores; speedup = t2/t8.

Usage:
    python tools/triad_probe.py            # one probe, print speedup
    python tools/triad_probe.py --watch    # probe every 120s until two
                                           # consecutive >= 2.3x, then exit 0
    python tools/triad_probe.py --watch --threshold 2.3 --interval 120 \
        --max-probes 30
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _BANDWIDTH_SCRIPT  # noqa: E402


def probe_once(items: int = 64) -> dict | None:
    have_taskset = shutil.which("taskset") is not None
    out: dict[int, float] = {}
    for cores in (2, 8):
        cmd = [sys.executable, "-c", _BANDWIDTH_SCRIPT, str(cores), str(items)]
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            return None
        out[cores] = float(proc.stdout.strip().splitlines()[-1])
    return {
        "t2": round(out[2], 3),
        "t8": round(out[8], 3),
        "speedup": round(out[2] / out[8], 3),
        "gbps2": round(102.4 / out[2], 1),
        "gbps8": round(102.4 / out[8], 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", action="store_true")
    ap.add_argument("--threshold", type=float, default=2.3)
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--max-probes", type=int, default=30)
    args = ap.parse_args()

    if not args.watch:
        r = probe_once()
        print(json.dumps(r))
        sys.exit(0 if r and r["speedup"] >= args.threshold else 1)

    consecutive = 0
    for i in range(args.max_probes):
        r = probe_once()
        print(json.dumps({"probe": i, **(r or {"error": "probe failed"})}),
              flush=True)
        if r and r["speedup"] >= args.threshold:
            consecutive += 1
            if consecutive >= 2:
                print("CALM WINDOW: two consecutive probes >= "
                      f"{args.threshold}x — launch the recording now",
                      flush=True)
                sys.exit(0)
        else:
            consecutive = 0
        time.sleep(args.interval)
    print("no calm window found within the probe budget", flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
