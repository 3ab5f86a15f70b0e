"""Bucketed-table co-located join (SURVEY.md §2.2 partitioning row): writing
both sides bucketed on the join key lets the sort-merge join run with NO
shuffle exchange — the physical plan itself is the assertion."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark):
    # spark.sql.warehouse.dir is a static conf; bucketed tables land in the
    # session's default warehouse — drop + clean up afterwards. Broadcast
    # joins are disabled so the plan exposes the bucketed sort-merge join
    # (at real scale neither side would be broadcastable anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    import shutil

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"drop table if exists {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("b_lineitem"))

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"]).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    plan = _plan(joined)
    # co-located: the join itself needs no shuffle of either side
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, join_section

    # and the result matches the plain (shuffled) join
    plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
