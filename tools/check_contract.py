"""Local mimic of the driver's correctness gate: run each __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB at the same SF,
compare row count, sorted-by-name schema, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                # rtol absorbs double-accumulation-order ULP drift on
                # large-magnitude sums (5e10-scale money aggregates at the
                # 10x soak); real bugs diverge at >=1e-6 relative
                bad = ~np.isclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
            else:
                bad = a.astype(str).values != b.astype(str).values
            nbad = int(bad.sum())
            if nbad:
                i = list(bad).index(True)
                problems.append(
                    f"col {c}: {nbad} mismatches; first at sorted row {i}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}"
                )
    # dtype report (informational)
    dt = {c: (str(sdf[c].dtype), str(odf[c].dtype)) for c in sorted(sdf.columns) if str(sdf[c].dtype) != str(odf[c].dtype)}
    if dt:
        problems.append(f"dtype diffs (informational): {dt}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from neural_search_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"\nRESULT FAIL {name}: spark query raised", flush=True)
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"\nRESULT OK? {name}: rows-only ({len(sdf)} rows, no oracle)", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"\nRESULT FAIL {name}: oracle SQL raised", flush=True)
            traceback.print_exc()
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        real = [p for p in problems if not p.startswith("dtype diffs")]
        if real:
            print(f"\nRESULT FAIL {name}:", flush=True)
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            note = "; ".join(p for p in problems if p.startswith("dtype diffs"))
            print(f"\nRESULT PASS {name} ({len(sdf)} rows){' — ' + note if note else ''}", flush=True)
    print(f"\n{n_fail} failures", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
