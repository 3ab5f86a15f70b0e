"""Per-stage scaling profile for the 240k-row LSH blocking job.

Runs the same pinned job bench.py's scaling section measures, once per
parallelism level, and prints each completed stage's wall time, executor
CPU, and shuffle bytes from the Spark UI REST API — so the lo/hi wall
ratio can be computed PER STAGE (BASELINE.md protocol: the spine vs the
bucket-kernel vs the top-K merge). Usage:

    taskset -c 0-1 python tools/stage_profile.py 2 /path/input.parquet 240286
    taskset -c 0-7 python tools/stage_profile.py 8 /path/input.parquet 240286

(The caller pins; pairing the two outputs by stage name/shape gives the
per-stage ratios recorded in BASELINE.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    parquet_path = sys.argv[2]
    rows = int(sys.argv[3])

    from bench import _scaling_job
    from deepblocker_spark.session import get_spark

    spark = get_spark(
        f"stage-profile-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64, arrow_max_records=10_000,
        extra_conf={
            "spark.speculation": "true",
            "spark.speculation.interval": "2s",
            "spark.speculation.multiplier": "2.0",
            "spark.speculation.quantile": "0.9",
            "spark.driver.memory": "4g",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(4060 + cores),
        },
    )
    _scaling_job(spark, parquet_path, limit=500, rows_hint=500, pairing="lsh")

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.load(resp)

    marker = max((s["stageId"] for s in stages()), default=-1)
    t0 = time.perf_counter()
    res = _scaling_job(spark, parquet_path, rows_hint=rows, pairing="lsh")
    wall = round(time.perf_counter() - t0, 3)

    out = []
    for s in sorted(stages(), key=lambda s: s["stageId"]):
        if s["stageId"] <= marker:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        done = s.get("completionTime")
        stage_wall = None
        if sub and done:
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            import datetime as dt

            stage_wall = round(
                (dt.datetime.strptime(done, fmt)
                 - dt.datetime.strptime(sub, fmt)).total_seconds(), 3)
        out.append({
            "id": s["stageId"],
            "name": s.get("name", "")[:70],
            "tasks": s.get("numCompleteTasks"),
            "wall": stage_wall,
            "cpu_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
            "write": s.get("shuffleWriteBytes", 0),
            "read": s.get("shuffleReadBytes", 0),
            "input": s.get("inputBytes", 0),
        })
    spark.stop()
    print(json.dumps({"cores": cores, "wall": wall, "pairs": res["pairs"],
                      "stages": out}))


if __name__ == "__main__":
    main()
