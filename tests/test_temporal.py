"""as-of join semantics: inclusive nearest match, direction, tolerance,
tie determinism, left-outer NULLs, multi-key isolation."""

from datetime import datetime

import pytest

from deepblocker_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:00:05"), 101.0),
            (1, _ts("2024-01-01T10:00:10"), 102.0),
            (2, _ts("2024-01-01T10:00:03"), 50.0),
        ],
        ["uid", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:59:59"), "early"),   # before any quote
            (1, _ts("2024-01-01T10:00:05"), "exact"),   # == quote ts (inclusive)
            (1, _ts("2024-01-01T10:00:07"), "mid"),
            (1, _ts("2024-01-01T10:01:00"), "late"),
            (2, _ts("2024-01-01T10:00:04"), "other"),   # must not see uid=1 quotes
        ],
        ["uid", "ts", "tag"],
    )
    return quotes, trades


def test_asof_backward_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on=["uid"], carry=["px"])
    got = {r.tag: r.px for r in out.collect()}
    assert got == {
        "early": None,      # no quote at-or-before -> left-outer NULL
        "exact": 101.0,     # equal ts matches (inclusive)
        "mid": 101.0,
        "late": 102.0,
        "other": 50.0,      # key isolation
    }
    assert out.count() == trades.count()  # left-preserving


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on=["uid"], carry=["px"], direction="forward")
    got = {r.tag: r.px for r in out.collect()}
    assert got == {
        "early": 100.0,
        "exact": 101.0,     # inclusive both directions
        "mid": 102.0,
        "late": None,       # nothing after
        "other": None,      # uid 2's only quote is BEFORE its trade
    }


def test_asof_tolerance_discards_not_substitutes(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on=["uid"], carry=["px"], tolerance_us=3_000_000)
    got = {r.tag: r.px for r in out.collect()}
    # "late" is 50s past the nearest quote: dropped, NOT replaced by a
    # farther-but-different row; "mid" is 2s away: kept.
    assert got["late"] is None and got["mid"] == 101.0


def test_asof_tie_greatest_wins(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:01"), "t")], ["uid", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 7, "a"),
            (1, _ts("2024-01-01T10:00:00"), 9, "b"),  # greatest tie wins
            (1, _ts("2024-01-01T10:00:00"), 8, "c"),
        ],
        ["uid", "ts", "pri", "val"],
    )
    out = asof_join(
        left, right, on=["uid"], carry=["val", "pri"], right_tie="pri"
    ).collect()
    assert (out[0].val, out[0].pri) == ("b", 9)


def test_asof_matched_ts_and_all_left_cols(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on=["uid"], carry=["px"])
    assert out.columns == ["uid", "ts", "tag", "px", "_matched_ts"]
    row = {r.tag: r for r in out.collect()}["late"]
    assert row._matched_ts == _ts("2024-01-01T10:00:10")


def test_asof_plan_is_one_window_no_join(spark, quotes_trades):
    quotes, trades = quotes_trades
    plan = asof_join(trades, quotes, on=["uid"], carry=["px"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, never a join
    assert plan.count("Window") >= 1


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

def test_interval_join_containment_and_bin_boundaries(spark):
    from deepblocker_spark.operators.temporal import interval_join

    # numeric mode, bin width 10: points/intervals straddling bin edges
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 25), (6, 9)],
        ["pid", "t"],
    )
    ivs = spark.createDataFrame(
        [(100, 10, 20),   # closed [10,20]: catches 10, 19, 20 — not 9, 25
         (200, 24, 26),
         (300, 30, 29)],  # inverted: dropped
        ["iid", "lo", "hi"],
    )
    out = interval_join(pts, ivs, "t", "lo", "hi", bin_width_us=10)
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(2, 100), (3, 100), (4, 100), (5, 200)]


def test_interval_join_keys_isolate(spark):
    from deepblocker_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([("a", 1, 15), ("b", 2, 15)], ["k", "pid", "t"])
    ivs = spark.createDataFrame([("a", 9, 10, 20)], ["k", "iid", "lo", "hi"])
    out = interval_join(pts, ivs, "t", "lo", "hi", on=["k"], bin_width_us=100)
    assert [(r.k, r.pid, r.iid) for r in out.collect()] == [("a", 1, 9)]


def test_interval_join_each_pair_once(spark):
    from deepblocker_spark.operators.temporal import interval_join

    # interval spans many bins; the contained point must appear exactly once
    pts = spark.createDataFrame([(1, 55)], ["pid", "t"])
    ivs = spark.createDataFrame([(9, 0, 100)], ["iid", "lo", "hi"])
    out = interval_join(pts, ivs, "t", "lo", "hi", bin_width_us=10)
    assert out.count() == 1


def test_interval_join_oversized_interval_raises(spark):
    import pytest as _pytest

    from deepblocker_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([(1, 5)], ["pid", "t"])
    ivs = spark.createDataFrame([(9, 0, 10_000)], ["iid", "lo", "hi"])
    out = interval_join(
        pts, ivs, "t", "lo", "hi", bin_width_us=10, max_bins_per_interval=100
    )
    with _pytest.raises(Exception, match="widen bin_width_us"):
        out.collect()


def test_interval_join_timestamps(spark):
    from deepblocker_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"))], ["pid", "t"]
    )
    ivs = spark.createDataFrame(
        [(7, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
         (8, _ts("2024-01-01T11:00:01"), _ts("2024-01-01T12:00:00"))],
        ["iid", "lo", "hi"],
    )
    out = interval_join(pts, ivs, "t", "lo", "hi")
    assert [r.iid for r in out.collect()] == [7]


def test_interval_join_plan_is_equi_join(spark):
    from deepblocker_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([(1, 5)], ["pid", "t"])
    ivs = spark.createDataFrame([(9, 0, 10)], ["iid", "lo", "hi"])
    plan = interval_join(
        pts, ivs, "t", "lo", "hi", bin_width_us=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_fractional_values_exact(spark):
    from deepblocker_spark.operators.temporal import interval_join

    # doubles must NOT truncate: 10.5 is outside [10.6, 11.0] but a
    # long-cast of all three would admit it (10 >= 10 and 10 <= 11)
    pts = spark.createDataFrame([(1, 10.5), (2, 10.7)], ["pid", "t"])
    ivs = spark.createDataFrame([(9, 10.6, 11.0)], ["iid", "lo", "hi"])
    out = interval_join(pts, ivs, "t", "lo", "hi", bin_width_us=1)
    assert [r.pid for r in out.collect()] == [2]


def test_numeric_distance_pairs(spark):
    from deepblocker_spark.operators.temporal import numeric_distance_pairs

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.4), (3, 10.5), (4, 20.0), (5, None)],
        "id long, v double",
    )
    out = numeric_distance_pairs(df, "id", "v", eps=0.5)
    got = sorted((r.a, r.b, round(r.diff, 6)) for r in out.collect())
    # closed ball: |10.0-10.5| == eps kept; each pair once; NULL drops
    assert got == [(1, 2, 0.4), (1, 3, 0.5), (2, 3, 0.1)]


def test_numeric_distance_pairs_matches_brute_force(spark):
    import random

    from deepblocker_spark.operators.temporal import numeric_distance_pairs

    rng = random.Random(11)
    rows = [(i, rng.uniform(0, 50)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, v double")
    eps = 1.25
    got = sorted((r.a, r.b) for r in numeric_distance_pairs(df, "id", "v", eps).collect())
    want = sorted(
        (a, b)
        for i, (a, va) in enumerate(rows)
        for b, vb in rows[i + 1:]
        if abs(va - vb) <= eps
    )
    assert got == want


def test_asof_string_tie_keeps_native_type(spark):
    from deepblocker_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:01"))], ["uid", "ts"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "apple"),
            (1, _ts("2024-01-01T10:00:00"), "zebra"),   # greatest string wins
            (1, _ts("2024-01-01T10:00:00"), "mango"),
        ],
        ["uid", "ts", "val"],
    )
    out = asof_join(left, right, on=["uid"], carry=["val"], right_tie="val")
    assert out.collect()[0].val == "zebra"


def test_numeric_distance_eps_zero_exact_equality(spark):
    from deepblocker_spark.operators.temporal import numeric_distance_pairs

    df = spark.createDataFrame(
        [(1, 3.5), (2, 3.5), (3, 3.500001), (4, 9.0)], "id long, v double"
    )
    got = sorted((r.a, r.b) for r in numeric_distance_pairs(df, "id", "v", eps=0.0).collect())
    assert got == [(1, 2)]
