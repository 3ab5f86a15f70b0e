"""SparkSession factory with the engine's standard configuration.

Arrow execution, AQE (incl. skew-join handling), and sane shuffle sizing are
on by default — these are the free wins SURVEY.md §4 calls out. All values
can be overridden for the local[8]-vs-local[32] scaling protocol
(BASELINE.md, sandbox scaling section).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deepblocker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 10_000,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    # numpy's MADV_HUGEPAGE is pathologically slow on this kernel (see
    # deepblocker_spark/__init__.py). The JVM must carry the var so its
    # forked python workers inherit it before they import numpy.
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    # One BLAS thread per python worker: Spark already parallelizes across
    # workers; letting every worker spin up a full OpenBLAS thread pool
    # oversubscribes cores quadratically (measured local[32] 2x SLOWER than
    # local[8] on the matmul-heavy top-K join before this).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow-vectorized pandas UDF transfer (input_hint: no per-row Python)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        # AQE: runtime coalescing, skew-join splitting (SURVEY.md §4 skew row)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 12g default (was 8g, round 6): the driver's bench runs this single
        # JVM at local[32] — 32 concurrent tasks' execution memory, every
        # broadcast relation, and all cached frames share one heap, and the
        # round-5 driver bench died in a GC-adjacent
        # BlockInfoManager/TorrentBroadcast storm (VERDICT r5 #1/#2). More
        # headroom means fewer full GCs, which means fewer
        # ContextCleaner-triggered concurrent block removals. Sandbox has
        # 128 GiB; env-overridable, and the bench's pinned scaling
        # subprocesses still set their own 4g explicitly.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # Two JVM fixes for this environment, found the hard way:
        # (1) ReservedCodeCacheSize: the default 48-240MB code cache fills
        #     under Spark's per-query generated classes, HotSpot then
        #     DISABLES the JIT ("CodeCache is full. Compiler has been
        #     disabled") and every stage runs interpreted — the source of
        #     10-40x run-to-run slowdowns observed while profiling.
        # (2) TieredStopAtLevel=1 (C1 only): C2 compile storms never
        #     amortize for short-lived local jobs here (40s -> 3.7s
        #     first-run for an identical query). Drop on a real cluster.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
