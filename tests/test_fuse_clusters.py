"""Field-level survivorship fusion — hand case + independent pandas
recomputation with deterministic tie-breaks."""

from __future__ import annotations

import pandas as pd
import pytest

from deepblocker_spark.operators.cluster import fuse_clusters


def _frames(spark):
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "id long, component long",
    )
    records = spark.createDataFrame(
        [
            (1, "aa", "en", 7),
            (2, "bbbb", "en", 3),
            (3, "cccc", "fr", 9),   # 'cccc' ties 'bbbb' on length -> larger value wins
            (4, None, "de", 1),
            (5, "x", "de", 2),
            (6, "zz", None, 5),
        ],
        "id long, text string, lang string, n long",
    )
    return clusters, records


def test_rules_hand_case(spark):
    clusters, records = _frames(spark)
    out = {
        r["component"]: r.asDict()
        for r in fuse_clusters(
            clusters, records,
            {"text": "longest", "lang": "mode", "n": "max"},
        ).collect()
    }
    assert out[10] == {"component": 10, "n_members": 3, "text": "cccc",
                       "lang": "en", "n": 9}
    assert out[20] == {"component": 20, "n_members": 2, "text": "x",
                       "lang": "de", "n": 2}
    # singleton with NULL lang: mode over zero non-null values -> NULL
    assert out[30] == {"component": 30, "n_members": 1, "text": "zz",
                       "lang": None, "n": 5}


def test_first_rule_smallest_member_id(spark):
    clusters, records = _frames(spark)
    out = {
        r["component"]: r["lang"]
        for r in fuse_clusters(clusters, records, {"lang": "first"}).collect()
    }
    assert out == {10: "en", 20: "de", 30: None}


def test_pandas_crosscheck_random(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    n = 300
    pdf = pd.DataFrame({
        "id": range(n),
        "component": rng.integers(0, 40, n),
        "text": [
            "".join(rng.choice(list("abc"), size=rng.integers(1, 8)))
            for _ in range(n)
        ],
        "val": rng.integers(0, 5, n),
    })
    clusters = spark.createDataFrame(pdf[["id", "component"]])
    records = spark.createDataFrame(pdf[["id", "text", "val"]])
    got = {
        r["component"]: (r["n_members"], r["text"], r["val"])
        for r in fuse_clusters(
            clusters, records, {"text": "longest", "val": "mode"}
        ).collect()
    }
    want = {}
    for comp, g in pdf.groupby("component"):
        longest = max(g["text"], key=lambda v: (len(v), v))
        counts = g["val"].value_counts()
        top = counts.max()
        mode = min(v for v, c in counts.items() if c == top)
        want[comp] = (len(g), longest, mode)
    assert got == want


def test_unknown_rule_raises(spark):
    clusters, records = _frames(spark)
    with pytest.raises(ValueError):
        fuse_clusters(clusters, records, {"text": "newest"})
