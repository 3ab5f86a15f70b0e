"""Temporal joins — the as-of join the brief names as a canonical
"operator Spark lacks", built as a composition of existing DataFrame ops
(union + window), not a custom physical operator.

Why union+window and not a join: the naive formulation is a range
self-join (``l.ts >= r.ts`` → pick max) which Catalyst can only execute
as a broadcast-nested-loop or a sort-merge over an exploded inequality —
both O(rows_l × rows_r) per key. The union pattern instead tags each
side, unions them into one frame, and runs ONE window per key ordered by
(ts, side): every left row's match is the last right-side row seen so
far, found in a single sort within its key partition. Cost: one shuffle
(the window exchange), O(n log n) per key, no pair explosion — the shape
that survives 100 TB of events. Ties and duplicates are deterministic:
at equal timestamps the right row is visible to the left row (inclusive
match, DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics), and among
right rows sharing (key, ts) the one with the greatest ``right_tie``
wins.

Reference scope note: qcri/DeepBlocker has no temporal operators; this
belongs to the brief's target-only categories (SURVEY.md §2.2) alongside
sessionization and windowed aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    carry: Sequence[str] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
    right_tie: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the ``carry`` columns of the
    single right row with the nearest ``right_ts`` at-or-before
    (``direction="backward"``) / at-or-after (``"forward"``) the left
    row's ``left_ts``, within the same ``on`` key. Left-outer semantics:
    unmatched left rows keep NULL carries. Output: all left columns, then
    ``carry`` (right side's values), then ``_matched_ts``.

    ``tolerance_us`` (optional): discard matches farther than this many
    microseconds from the left timestamp (pandas ``merge_asof``'s
    ``tolerance``) — applied AFTER the nearest match is found, so it
    never substitutes a farther row.

    ``right_tie``: column that breaks ties among right rows sharing
    (key, ts); the greatest value wins. Defaults to the first carry
    column. Required for a deterministic result when (on, right_ts) is
    not unique on the right.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    carry = list(carry)
    tie = right_tie or (carry[0] if carry else None)

    # One struct per side: the left row rides whole; the right payload
    # (carry + matched ts) rides as a single nullable struct so
    # last(..., ignorenulls) can never mix values from different rows.
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    # Types flow through untouched: any orderable timestamp flavor
    # (TIMESTAMP, TIMESTAMP_NTZ, DATE) or plain numeric epoch works, and
    # _matched_ts comes out in right_ts's own type.
    r_payload = F.struct(
        *[F.col(c) for c in carry],
        F.col(right_ts).alias("_matched_ts"),
    ).alias("_r")

    l2 = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(on)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_tie"),
        l_struct,
        F.lit(None).cast(
            right.select(r_payload).schema["_r"].dataType.simpleString()
        ).alias("_r"),
    )
    r2 = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(on)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie).cast("double") if tie is not None else F.lit(0.0)).alias("_tie"),
        F.lit(None).cast(
            left.select(l_struct).schema["_l"].dataType.simpleString()
        ).alias("_l"),
        r_payload,
    )

    keys = [f"_k{i}" for i in range(len(on))]
    if direction == "backward":
        # right rows at the same _ts sort BEFORE the left row (inclusive
        # >=); among equal right rows the greatest tie sorts last → wins.
        order = [F.asc("_ts"), F.asc("_side"), F.asc_nulls_last("_tie")]
    else:
        order = [F.desc("_ts"), F.asc("_side"), F.asc_nulls_last("_tie")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        # NTZ-safe: the session-timezone shift from the cast cancels in the
        # difference; numeric epoch columns subtract directly.
        def _micros(c: Column, is_numeric: bool) -> Column:
            return c.cast("long") if is_numeric else F.unix_micros(c.cast("timestamp"))

        numeric = left.schema[left_ts].dataType.typeName() in (
            "long", "integer", "double", "float", "decimal", "short",
        )
        gap = F.abs(
            _micros(F.col("_ts"), numeric)
            - _micros(F.col("_m._matched_ts"), numeric)
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(int(tolerance_us)), F.col("_m"))
        )

    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(c) for c in carry]
    out_cols.append(F.col("_m._matched_ts").alias("_matched_ts"))
    return matched.select(*out_cols)
