"""Local stand-in for the driver's DuckDB oracle gate: runs every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given sf
dir, comparing row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        ",".join(norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def driver_canon_ok(pdf: pd.DataFrame) -> bool:
    """Emulate the DRIVER's canonicalization (pandas sort_values over all
    columns): it crashes on unhashable/unsortable cells (lists, arrays) —
    the round-4 ensemble_blocking red row. A query can hash fine here yet
    red-row in the driver, so flag it locally."""
    try:
        pdf.sort_values(by=sorted(pdf.columns), ignore_index=True)
        return True
    except Exception:
        return False


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from deepblocker_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows, cols={sorted(spdf.columns)}")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        h1, h2 = frame_hash(spdf), frame_hash(opdf)
        ok_hash = h1 == h2
        ok_canon = driver_canon_ok(spdf)
        if not ok_canon:
            print(f"FAIL {name}: driver canonicalizer would crash "
                  "(unsortable column, e.g. array) — flatten it")
        status = "OK  " if (ok_rows and ok_cols and ok_hash and ok_canon) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(spdf)}/{len(opdf)} cols_ok={ok_cols} hash {h1}/{h2}"
        )
        if not ok_cols:
            print(f"     spark cols {sorted(spdf.columns)} vs oracle {sorted(opdf.columns)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
