"""Model persistence (O33) and CSV source parity (O1/O2) tests."""

from __future__ import annotations

import numpy as np
import pytest

from deepblocker_spark.operators.encoders import (
    NumpyAutoEncoder,
    NumpyCTTModel,
    load_autoencoder,
    load_ctt,
    save_model,
)
from deepblocker_spark.operators.preprocess import MERGED_TEXT, preprocess_table


def test_autoencoder_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ae = NumpyAutoEncoder(12, (8, 4), seed=1)
    ae.train(rng.normal(size=(50, 12)), num_epochs=3, batch_size=16)
    path = str(tmp_path / "ae.npz")
    save_model(ae, path)
    loaded = load_autoencoder(path, 12, (8, 4))
    x = rng.normal(size=(7, 12))
    np.testing.assert_array_equal(ae.encode(x), loaded.encode(x))


def test_ctt_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    m = NumpyCTTModel(12, (8, 4), seed=2)
    m.train(rng.normal(size=(40, 12)), rng.normal(size=(40, 12)),
            rng.integers(0, 2, size=40), num_epochs=3, batch_size=16)
    path = str(tmp_path / "ctt.npz")
    save_model(m, path)
    loaded = load_ctt(path, 12, (8, 4))
    x = rng.normal(size=(5, 12))
    np.testing.assert_array_equal(m.summarize(x), loaded.summarize(x))


def test_load_shape_mismatch_raises(tmp_path):
    ae = NumpyAutoEncoder(12, (8, 4), seed=3)
    path = str(tmp_path / "ae.npz")
    save_model(ae, path)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_autoencoder(path, 16, (8, 4))


def test_csv_source_parity(spark, tmp_path):
    """Reference input format (main.py:14-15): CSV with header. The same
    preprocess semantics must hold when reading CSV instead of parquet —
    including nulls (empty CSV fields) -> ' ' -> never 'nan'."""
    csv_path = str(tmp_path / "tableA.csv")
    with open(csv_path, "w") as f:
        f.write("id,title,manufacturer,price\n")
        f.write('1,"Apple iPhone",Apple,999.0\n')
        f.write("2,,Samsung,\n")
        f.write('3,"Pixel 9",,599.5\n')
    df = spark.read.csv(csv_path, header=True, inferSchema=True)
    out = {r["id"]: r[MERGED_TEXT] for r in
           preprocess_table(df, ["title", "manufacturer", "price"]).collect()}
    assert out[1] == "Apple iPhone Apple 999.0"
    assert out[2] == "  Samsung  "
    assert out[3] == "Pixel 9   599.5"
    # CSV sink roundtrip (O2): candidates written and re-read losslessly
    cands = spark.createDataFrame([(1, 2, 0.9)], ["l_id", "r_id", "sim"])
    sink = str(tmp_path / "cands_csv")
    cands.write.mode("overwrite").csv(sink, header=True)
    back = spark.read.csv(sink, header=True, inferSchema=True)
    assert [tuple(r) for r in back.collect()] == [(1, 2, 0.9)]


def test_repo_table_round_trips_every_lake_format(spark, tmp_path):
    """load_repo_table reads parquet / orc / json-lines / csv with
    identical rows and identical durable keys — the id/content_sha
    invariant is format-independent. Unknown formats are rejected."""
    import pytest

    from deepblocker_spark.sources.repo_files import load_repo_table

    rows = [
        ("r1", "a/b.py", "c1", "py", "print('hi, world')"),
        ("r1", "a/c.py", "c2", "py", "x = 1\ny = 2"),
        ("r2", "d.md", "c3", "md", "# title, with commas"),
        ("r2", "e.md", "c4", "md", None),  # null content -> sha('')
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    loaded = {}
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        w = src.write.mode("overwrite")
        if fmt == "csv":
            w = w.options(header=True)
        w.format(fmt).save(p)
        loaded[fmt] = sorted(
            (r.id, r.content_sha, r.repo, r.path, r.commit, r.lang)
            for r in load_repo_table(spark, p, fmt=fmt).collect()
        )
    assert loaded["parquet"] == loaded["orc"] == loaded["json"] == loaded["csv"]
    assert len(loaded["parquet"]) == 4
    with pytest.raises(ValueError):
        load_repo_table(spark, str(tmp_path / "parquet"), fmt="avro")

def test_with_durable_id_spreads_narrow_scan(spark, tmp_path):
    """Round-6 optimization: a single-file single-row-group input scans as
    ONE working task, and the two per-row sha256 projections would run
    inside it. with_durable_id therefore spreads a scan narrower than
    defaultParallelism with one round-robin exchange BEFORE hashing —
    values (the content-derived keys) must be identical with and without
    the spread, and a source already at least as wide as the cluster must
    not gain an exchange."""
    import pandas as pd

    from deepblocker_spark.sources.repo_files import with_durable_id

    pdf = pd.DataFrame(
        {
            "repo": [f"r{i % 7}" for i in range(500)],
            "path": [f"p/{i}.py" for i in range(500)],
            "commit": [f"c{i}" for i in range(500)],
            "lang": ["py"] * 500,
            "content": [f"line {i}\n" * 3 for i in range(500)],
        }
    )
    p = str(tmp_path / "one_file.parquet")
    pdf.to_parquet(p)  # pandas default: one file, one row group
    src = spark.read.parquet(p)
    par = spark.sparkContext.defaultParallelism

    spread = with_durable_id(src)
    plain = with_durable_id(src, spread=False)
    # the spread engages exactly when the scan is narrower than the cluster
    if src.rdd.getNumPartitions() < par:
        assert spread.rdd.getNumPartitions() == par
    # row values are placement-independent: identical keys either way
    key = lambda r: (r.id, r.content_sha, r.repo, r.path, r.commit)
    assert sorted(map(key, spread.collect())) == sorted(map(key, plain.collect()))
    # an already-wide source must not pay an exchange
    wide = with_durable_id(src.repartition(par))
    assert wide.rdd.getNumPartitions() == par
