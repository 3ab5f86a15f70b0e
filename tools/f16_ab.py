"""Same-phase A/B of LSH embedding-transport precision (f32 vs f16) on the
240k-row scaling input: interleaved pinned local[2]/local[8] runs of the
identical candidate-stage job, one dtype change at a time. Evidence for
the lsh_emb_dtype knob (BASELINE.md protocol v5: the kernel/merge stages
are memory-bandwidth-bound, so halving the exchange bytes should cut wall
time at both levels and raise the 2->8 scaling ratio)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepblocker_spark.fixtures import repo_file_table  # noqa: E402

ROWS = int(os.environ.get("F16_AB_ROWS", "240000"))
ROUNDS = int(os.environ.get("F16_AB_ROUNDS", "2"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = (
    "import sys, time, json\n"
    "sys.path.insert(0, %r)\n"
    "from deepblocker_spark.session import get_spark\n"
    "from bench import _scaling_job\n"
    "cores = int(sys.argv[1]); dtype = sys.argv[2]\n"
    "spark = get_spark(f'f16ab-{cores}-{dtype}', master=f'local[{cores}]',\n"
    "                  shuffle_partitions=64, arrow_max_records=10_000,\n"
    "                  extra_conf={'spark.speculation': 'true',\n"
    "                              'spark.speculation.interval': '2s',\n"
    "                              'spark.speculation.multiplier': '2.0',\n"
    "                              'spark.speculation.quantile': '0.9',\n"
    "                              'spark.driver.memory': '4g',\n"
    "                              'spark.sql.adaptive.advisoryPartitionSizeInBytes': '16m',\n"
    "                              'spark.sql.adaptive.coalescePartitions.parallelismFirst': 'false'})\n"
    "_scaling_job(spark, %r, limit=500, rows_hint=500, pairing='lsh', emb_dtype=dtype)\n"
    "t0 = time.perf_counter()\n"
    "res = _scaling_job(spark, %r, rows_hint=%d, pairing='lsh', emb_dtype=dtype)\n"
    "dt = time.perf_counter() - t0\n"
    "spark.stop()\n"
    "print(json.dumps({'t': dt, 'pairs': res['pairs']}))\n"
)


def main() -> None:
    n_clusters = max(ROWS // 3, 1)
    pdf, _ = repo_file_table(n_clusters=n_clusters, max_dups=5, seed=42)
    pdf = pdf.drop(columns=["_cluster"])
    tmp = tempfile.mkdtemp(prefix="f16ab-")
    pq = os.path.join(tmp, "repo_files.parquet")
    pdf.to_parquet(pq)
    rows = len(pdf)
    print(f"# input: {rows} rows", file=sys.stderr)
    script = SCRIPT % (REPO, pq, pq, rows)

    def run(cores: int, dtype: str) -> float | None:
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
               script, str(cores), dtype]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
        if proc.returncode != 0:
            print(f"# FAILED {cores}/{dtype}: {proc.stderr[-400:]}", file=sys.stderr)
            return None
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"# local[{cores}] {dtype}: {payload['t']:.1f}s "
              f"({payload['pairs']} pairs)", file=sys.stderr)
        return payload["t"]

    results: dict[str, list] = {"f32": [], "f16": []}
    for rnd in range(ROUNDS):
        for dtype in ("f32", "f16"):
            t2 = run(2, dtype)
            t8 = run(8, dtype)
            if t2 and t8:
                results[dtype].append(
                    {"round": rnd + 1, "local2": round(t2, 2),
                     "local8": round(t8, 2),
                     "speedup": round(t2 / t8, 3),
                     "efficiency": round(t2 / t8 / 4, 3)}
                )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
