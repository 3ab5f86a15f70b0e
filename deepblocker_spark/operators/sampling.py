"""Deterministic stratified corpus sampling (training-data curation).

A 100 TB corpus pipeline re-balances strata (language, source, quality
band) by DOWN-SAMPLING each stratum at its own rate. Doing that with
``df.sample`` is non-reproducible across runs/partitionings; the standard
scale trick is a content-keyed hash cutoff: keep a row iff a stable hash
of its id falls below the stratum's cutoff. Same input row → same
decision, on any cluster, in any engine (the DuckDB oracle reproduces the
exact row set). No reference counterpart (no sampling in
/root/reference — this is pipeline scope beyond it).

Mechanics: md5(id) is uniform on [0, 16^32); comparing its first
``digits`` hex chars lexicographically against a ``digits``-long hex
cutoff keeps a fraction of rows equal to cutoff/16^digits, with
1/16^digits rate resolution (default 6 → ~6e-8). Everything is JVM
Column expressions on the scan — no shuffle, no UDF; the rates table is
a broadcast join on the strata columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_to_cutoff(rate: float, digits: int = 6) -> str:
    """Hex cutoff string such that P(substr(md5(x),1,digits) < cutoff) ==
    round(rate * 16**digits) / 16**digits. rate >= 1 maps to 'g', which is
    lexicographically above every hex string (hex digits are 0-9a-f)."""
    if not 0.0 <= rate:
        raise ValueError(f"rate must be >= 0, got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(round(rate * 16**digits)), f"0{digits}x")


def stratified_hash_sample(
    df: DataFrame,
    strata_cols: list[str],
    rates: dict,
    id_col: str,
    digits: int = 6,
) -> DataFrame:
    """Keep each row of ``df`` with its stratum's probability,
    deterministically keyed on md5(``id_col``). ``rates`` maps a stratum
    value (scalar for one strata column, tuple for several) to a rate in
    [0, 1]; strata absent from ``rates`` are dropped (rate 0).

    -> ``df``'s columns unchanged, filtered. One scan + one broadcast
    join; the sampling predicate is a JVM string comparison, so it rides
    whole-stage codegen and the scan's column pruning.
    """
    if not rates:
        raise ValueError("rates must be non-empty")
    rows = []
    for key, rate in rates.items():
        key_t = key if isinstance(key, tuple) else (key,)
        if len(key_t) != len(strata_cols):
            raise ValueError(f"stratum {key!r} arity != {strata_cols}")
        rows.append((*key_t, rate_to_cutoff(rate, digits)))
    spark = df.sparkSession
    cutoffs = spark.createDataFrame(rows, [*strata_cols, "_cutoff"])
    keyed = df.withColumn(
        "_hkey", F.substring(F.md5(F.col(id_col).cast("string")), 1, digits)
    )
    out = keyed.join(F.broadcast(cutoffs), strata_cols).filter(
        F.col("_hkey") < F.col("_cutoff")
    )
    return out.drop("_hkey", "_cutoff")
