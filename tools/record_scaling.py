"""Record ONLY the scaling evidence into BENCH.json, preserving the rest
of the artifact from the last full bench run.

The full bench suite burns ~5 minutes before the scaling rounds start; on
this host, calm bus phases (STREAM-triad 2->8-core speedup >= 2.3x) last
minutes, not hours — this runner spends the whole window on the
measurement that needs it. Usage:

    python tools/record_scaling.py            # 240k LSH + 40k exact
    SPARK_GRAFT_SCALING_REPEATS=4 python tools/record_scaling.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.json"
    )
    with open(bench_path) as f:
        out = json.load(f)

    scaling = bench._measure_scaling()
    out["scaling"] = scaling
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING_EXACT") != "1":
        out["scaling_exact"] = bench._measure_scaling(40_000, max_rounds_override=3)
    for key in ("scaling", "scaling_exact"):
        out.get(key, {}).pop("carried_from_previous_run", None)

    with open(bench_path, "w") as f:
        json.dump(out, f, indent=1)
    hist_path = os.path.join(os.path.dirname(bench_path), "SCALING_HISTORY.jsonl")
    rec = {"source": "tools/record_scaling.py"}
    for key in ("scaling", "scaling_exact"):
        if key in out:
            rec[key] = out[key]
    with open(hist_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(
        json.dumps(
            {
                k: out[k].get("efficiency")
                for k in ("scaling", "scaling_exact")
                if k in out
            }
        )
    )
    print(f"# scaling recorded -> {bench_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
