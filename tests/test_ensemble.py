"""Blocking-ensemble union with provenance."""

from __future__ import annotations

import pytest

from deepblocker_spark.operators.ensemble import ensemble_pairs


def _pairs(spark, rows, extra_col=False):
    schema = "a long, b long" + (", score double" if extra_col else "")
    return spark.createDataFrame(rows, schema)


def test_union_with_sorted_provenance(spark):
    lsh = _pairs(spark, [(1, 2), (3, 4)])
    key = _pairs(spark, [(2, 1), (5, 6)])  # reversed orientation: same pair
    got = {
        (r["a"], r["b"]): (tuple(r["sources"]), r["n_sources"])
        for r in ensemble_pairs({"lsh": lsh, "key": key}).collect()
    }
    assert got == {
        (1, 2): (("key", "lsh"), 2),
        (3, 4): (("lsh",), 1),
        (5, 6): (("key",), 1),
    }


def test_extra_columns_dropped_and_duplicates_collapse(spark):
    scored = _pairs(spark, [(1, 2, 0.9), (1, 2, 0.8)], extra_col=True)
    got = ensemble_pairs({"s": scored}).collect()
    assert len(got) == 1
    assert got[0]["sources"] == ["s"] and got[0]["n_sources"] == 1


def test_empty_mapping_raises(spark):
    with pytest.raises(ValueError):
        ensemble_pairs({})
