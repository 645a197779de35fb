"""Analyzer chain: tokenizer + stopword filter + minimal plural stemmer
(analysis/tokenizer.py analyze_col / analyze_py / duckdb_analyze)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import (
    ENGLISH_STOPWORDS,
    analyze_col,
    analyze_py,
    duckdb_analyze,
)


def test_stop_and_stem_hand_cases(spark):
    rows = [
        (0, "The tables and parts of this bus are classes"),
        (1, "is was bus basis mass"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.toks
        for r in df.select(
            "id", analyze_col("text", stopwords=ENGLISH_STOPWORDS, stem=True).alias("toks")
        ).collect()
    }
    # stopwords (the, and, of, this, are, is, was) removed; tables→table,
    # parts→part, classes→classe (len rule only — documented minimal rule);
    # bus/mass/basis guarded (us/ss/is), was is a stopword anyway
    assert got[0] == ["table", "part", "bus", "classe"]
    assert got[1] == ["bus", "basis", "mass"]
    assert got[2] == []


def test_three_way_parity_spark_python_duckdb(spark):
    rng = random.Random(99)
    vocab = ["tables", "bus", "the", "class", "mass", "dogs", "is", "axis",
             "genus", "as", "s", "cats", "miss", "a1s", "xs"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(80)]
    df = spark.createDataFrame(rows, "id long, text string")
    for kwargs in (
        {"stopwords": ENGLISH_STOPWORDS, "stem": True},
        {"stopwords": None, "stem": True},
        {"stopwords": ["bus", "cats"], "stem": False},
    ):
        got_spark = {
            r.id: list(r.toks)
            for r in df.select("id", analyze_col("text", **kwargs).alias("toks")).collect()
        }
        got_py = {i: analyze_py(t, **kwargs) for i, t in rows}
        con = duckdb.connect()
        con.execute("create table t(id bigint, text varchar)")
        con.executemany("insert into t values (?, ?)", rows)
        expr = duckdb_analyze("text", **kwargs)
        got_duck = {i: list(v) for i, v in con.execute(f"select id, {expr} from t").fetchall()}
        assert got_spark == got_py == got_duck, kwargs
