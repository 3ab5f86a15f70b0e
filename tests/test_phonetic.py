"""NARA Soundex (functions/phonetic.py): known published values, engine
parity (the Spark Column chain vs the DuckDB oracle SQL built from the
same spec), and the phonetic key-blocking composition."""

from __future__ import annotations

import duckdb
import pytest

from deepblocker_spark.functions.phonetic import soundex_col, soundex_sql

# NARA's published examples plus the rule-exercising classics:
#  - Tymczak: vowel separates equal codes -> coded twice
#  - Pfister: first letter's code absorbs the adjacent same-code letter
#  - Ashcraft: H between S and C -> coded once (the H/W rule)
#  - Lee/Dodd: zero-padding and vowel-separated doubles
KNOWN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "VanDeusen": "V532",
    "Dodd": "D300",
    "Schmidt": "S530",
    "Schneider": "S536",
}
EDGE = ["", "123", "h", "W", "hw", "aaa", "o'Brien", "McAuliffe", "de la Cruz"]


def _spark_soundex(spark, names):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    return {r["name"]: r["sx"] for r in df.select("name", soundex_col("name").alias("sx")).collect()}


def test_soundex_known_values(spark):
    got = _spark_soundex(spark, list(KNOWN))
    assert got == KNOWN


def test_soundex_engine_parity(spark):
    names = list(KNOWN) + EDGE
    got = _spark_soundex(spark, names)
    con = duckdb.connect()
    con.execute("create table t(name varchar)")
    con.executemany("insert into t values (?)", [(n,) for n in names])
    duck = dict(con.execute(f"select name, {soundex_sql('name')} as sx from t").fetchall())
    assert got == duck


def test_soundex_null_on_letterless_input(spark):
    got = _spark_soundex(spark, ["", "123", "!?"])
    assert set(got.values()) == {None}


def test_phonetic_key_blocking_pairs(spark):
    # homophones block together; a NULL key (letterless name) forms no block
    from deepblocker_spark.operators.dedup import key_blocking_pairs

    rows = [(1, "Robert"), (2, "Rupert"), (3, "Ashcraft"), (4, "Ashcroft"),
            (5, "Tymczak"), (6, "123")]
    df = spark.createDataFrame(rows, "pid long, name string")
    keyed = df.select("pid", soundex_col("name").alias("sx"))
    pairs = {(r["a"], r["b"], r["sx"]) for r in
             key_blocking_pairs(keyed, ["sx"], id_col="pid").collect()}
    assert pairs == {(1, 2, "R163"), (3, 4, "A261")}
