"""Replicates the driver's correctness gate at sf0.001: every queries()
entry is executed on Spark and compared (row count + sorted-by-name columns
+ order-insensitive values) against its oracle_sql() on DuckDB."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _all_query_names():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_names", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return sorted(m.queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, entry_mod, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = duck.execute(oracle).df()
    assert len(sdf) == len(odf), f"row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    s, o = _norm(sdf), _norm(odf)
    for c in s.columns:
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            assert np.allclose(
                s[c].astype(float), o[c].astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"col {c} float mismatch"
        else:
            assert (s[c].astype(str).values == o[c].astype(str).values).all(), f"col {c} mismatch"


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["rank", "doc_id", "score"]
