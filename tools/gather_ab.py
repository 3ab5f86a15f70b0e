"""Same-phase A/B of the LSH kernel's vector-gather mode (exchange vs
broadcast) on the 240k-row scaling input: interleaved pinned runs of the
identical candidate-stage job, one knob change at a time — the evidence
run for config.lsh_gather (the kernel exchange drops the n_bands-fold
vector duplication; on a bandwidth-bound host fewer shuffled bytes is
directly wall time, BASELINE.md protocol v5).

Usage: python tools/gather_ab.py        # GATHER_AB_ROWS / _ROUNDS / _CORES env
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepblocker_spark.fixtures import repo_file_table  # noqa: E402

ROWS = int(os.environ.get("GATHER_AB_ROWS", "240000"))
ROUNDS = int(os.environ.get("GATHER_AB_ROUNDS", "2"))
CORES = int(os.environ.get("GATHER_AB_CORES", "8"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = (
    "import sys, time, json\n"
    "sys.path.insert(0, %r)\n"
    "from deepblocker_spark.session import get_spark\n"
    "from bench import _scaling_job\n"
    "cores = int(sys.argv[1]); gather = sys.argv[2]\n"
    "spark = get_spark(f'gatherab-{cores}-{gather}', master=f'local[{cores}]',\n"
    "                  shuffle_partitions=64, arrow_max_records=10_000,\n"
    "                  extra_conf={'spark.speculation': 'true',\n"
    "                              'spark.speculation.interval': '2s',\n"
    "                              'spark.speculation.multiplier': '2.0',\n"
    "                              'spark.speculation.quantile': '0.9',\n"
    "                              'spark.driver.memory': '4g',\n"
    "                              'spark.sql.adaptive.advisoryPartitionSizeInBytes': '16m',\n"
    "                              'spark.sql.adaptive.coalescePartitions.parallelismFirst': 'false'})\n"
    "_scaling_job(spark, %r, limit=500, rows_hint=500, pairing='lsh', gather=gather)\n"
    "t0 = time.perf_counter()\n"
    "res = _scaling_job(spark, %r, rows_hint=%d, pairing='lsh', gather=gather)\n"
    "dt = time.perf_counter() - t0\n"
    "spark.stop()\n"
    "print(json.dumps({'t': dt, 'pairs': res['pairs']}))\n"
)


def main() -> None:
    n_clusters = max(ROWS // 3, 1)
    pdf, _ = repo_file_table(n_clusters=n_clusters, max_dups=5, seed=42)
    pdf = pdf.drop(columns=["_cluster"])
    tmp = tempfile.mkdtemp(prefix="gather-ab-")
    pq = os.path.join(tmp, "repo_files.parquet")
    pdf.to_parquet(pq)
    print(f"# {len(pdf)} rows -> {pq}", file=sys.stderr)

    script = SCRIPT % (REPO, pq, pq, len(pdf))
    have_taskset = shutil.which("taskset") is not None
    cpus = ",".join(str(i) for i in range(CORES))

    def run(gather: str) -> dict:
        cmd = [sys.executable, "-c", script, str(CORES), gather]
        if have_taskset:
            cmd = ["taskset", "-c", cpus] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)

    out = {"rows": ROWS, "cores": CORES, "rounds": []}
    for i in range(ROUNDS):
        a = run("exchange")
        b = run("broadcast")
        assert a["pairs"] == b["pairs"], (a, b)
        out["rounds"].append(
            {"exchange_s": round(a["t"], 2), "broadcast_s": round(b["t"], 2),
             "speedup": round(a["t"] / b["t"], 3), "pairs": a["pairs"]}
        )
        print(json.dumps(out["rounds"][-1]), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
