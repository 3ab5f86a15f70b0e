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


def _bin_val(c: Column, numeric: bool) -> Column:
    """Binning coordinate: numeric columns bin on their RAW value (no
    long-cast — fractional values must not truncate); timestamp flavors
    bin on microsecond epoch (NTZ-safe via the cast — the session-
    timezone shift is the same constant on every row, so bin
    co-membership is unaffected). Containment itself is always checked
    on the raw columns, never on this mapping."""
    return c if numeric else F.unix_micros(c.cast("timestamp"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    on: Sequence[str] = (),
    bin_width_us: int | float = 3_600_000_000,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Range/interval join: inner-join each point row to every interval
    row whose closed range [lo_col, hi_col] contains ``point_ts`` (and
    whose ``on`` keys match, if given). Output: all point columns, then
    all interval columns (caller pre-aliases collisions).

    Why not ``points.join(intervals, lo <= t & t <= hi)``: Catalyst
    executes a pure inequality join as BroadcastNestedLoop — O(P×I) work
    regardless of selectivity, a scale-killer the moment neither side
    broadcasts. Here both sides map to width-``bin_width_us`` bins
    (points to one bin each; intervals exploded over every bin they
    overlap), meet in an ordinary hash equi-join on (keys…, bin), and a
    codegen containment filter removes the bin-boundary false positives.
    Work is proportional to actual bin co-occurrence — the same
    inverted-index shape as the shingle joins, and the batch analogue of
    Flink's interval join. Each matching pair emerges exactly once (a
    point has one bin; an interval covers it once), so no dedup pass.

    ``bin_width_us`` trades explode factor against join selectivity —
    set it near the typical interval length. An interval spanning more
    than ``max_bins_per_interval`` bins raises (no silent truncation):
    widen the bins or split the interval.

    Timestamps may be TIMESTAMP/NTZ or plain numeric epochs; numeric
    inputs are binned as-is (``bin_width_us`` then shares their unit).
    """
    on = list(on)
    numeric_p = points.schema[point_ts].dataType.typeName() in (
        "long", "integer", "double", "float", "decimal", "short",
    )
    numeric_i = intervals.schema[lo_col].dataType.typeName() in (
        "long", "integer", "double", "float", "decimal", "short",
    )
    if not bin_width_us > 0:
        raise ValueError(f"bin_width_us must be > 0, got {bin_width_us}")
    w = bin_width_us  # numeric inputs may use fractional widths

    p_us = _bin_val(F.col(point_ts), numeric_p)
    pts = points.withColumn("_bin", F.floor(p_us / w))

    lo_us = _bin_val(F.col(lo_col), numeric_i)
    hi_us = _bin_val(F.col(hi_col), numeric_i)
    lo_bin, hi_bin = F.floor(lo_us / w), F.floor(hi_us / w)
    guard = F.when(
        hi_bin - lo_bin >= max_bins_per_interval,
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans >= "),
                F.lit(str(max_bins_per_interval)),
                F.lit(" bins (lo="), F.col(lo_col).cast("string"),
                F.lit(", hi="), F.col(hi_col).cast("string"),
                F.lit(") — widen bin_width_us or split the interval"),
            )
        ).cast("long"),
    ).otherwise(hi_bin)
    ivs = intervals.filter(hi_us >= lo_us).withColumn(
        "_bin", F.explode(F.sequence(lo_bin, guard))
    )

    cond = [pts["_bin"] == ivs["_bin"]]
    cond += [pts[k] == ivs[k] for k in on]
    # containment on the RAW columns (numerics and timestamps both compare
    # natively) — the bin mapping is only a meeting coordinate
    joined = pts.join(ivs, cond).filter(
        (pts[point_ts] >= ivs[lo_col]) & (pts[point_ts] <= ivs[hi_col])
    )
    keep = [pts[c] for c in points.columns]
    keep += [ivs[c] for c in intervals.columns if c not in on]
    return joined.select(*keep)


def numeric_distance_pairs(
    df: DataFrame,
    id_col: str,
    value_col: str,
    eps: float,
    bin_width: float | None = None,
) -> DataFrame:
    """Numeric ε-distance self-join: -> (a, b, a_value, b_value, diff) for
    every pair with |value_a − value_b| <= eps and a < b — the numeric-
    attribute blocking primitive (price bands, coordinates, lengths)
    expressed through :func:`interval_join`: each row is both a point and
    a [v−eps, v+eps] interval; the symmetric condition finds every pair
    in both directions, so a < b keeps each exactly once. Inherits the
    bin-equi-join plan — no nested loop, work ∝ bin co-occupancy. NULL
    values drop (no NULL-matches-everything surprises). ``bin_width``
    defaults to 2·eps (each interval spans ≤ 3 bins)."""
    if not eps >= 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    # eps == 0 means exact-equality pairs: equal values share a bin under
    # ANY width, so use 1.0 (a microscopic width would overflow the floor)
    w = bin_width if bin_width is not None else (2.0 * eps if eps > 0 else 1.0)
    pts = df.select(F.col(id_col).alias("a"), F.col(value_col).alias("a_value"))
    ivs = df.select(
        F.col(id_col).alias("b"),
        F.col(value_col).alias("b_value"),
        (F.col(value_col) - F.lit(eps)).alias("_lo"),
        (F.col(value_col) + F.lit(eps)).alias("_hi"),
    )
    out = interval_join(pts, ivs, "a_value", "_lo", "_hi", bin_width_us=w)
    return (
        out.filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", "a_value", "b_value",
            F.abs(F.col("a_value") - F.col("b_value")).alias("diff"),
        )
    )


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

    # the tie keeps its NATIVE type (a double-cast would NULL out string
    # ties and silently break determinism); left rows carry a typed NULL
    tie_type = (
        right.schema[tie].dataType.simpleString() if tie is not None else "double"
    )
    l2 = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(on)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        l_struct,
        F.lit(None).cast(
            right.select(r_payload).schema["_r"].dataType.simpleString()
        ).alias("_r"),
    )
    r2 = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(on)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie) if tie is not None else F.lit(0.0)).alias("_tie"),
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
