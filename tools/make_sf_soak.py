"""Generate the sf1-scale soak dataset (round-5 task: VERDICT r4 #7).

Replicates /root/testdata/sf0.1 10× into a target dir with shifted keys —
documents 5k→50k (text perturbed per replica so duplicate clusters stay
sf0.1-sized instead of growing 10× denser, which would quadratically blow
up the dedup-pair ORACLES, not the engine), embeddings 2k→20k, events
100k→1M, lineitem 600k→6M with l_orderkey/o_orderkey shifted consistently.
Dimension tables copy as-is (FKs remain valid). n_chars is recomputed so
the column keeps its length(text) meaning. Both Spark and the DuckDB
oracle read the same generated parquet, so the contract's rows/schema/
value-hash comparison is exactly as strict as at sf0.01 — just 10× wider,
which is what flushes overflow/bucket-width/window-edge scale bugs.

Usage: python tools/make_sf_soak.py [out_dir] [reps]
Then:  python tools/check_contract.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# key column to shift per replicated table; offsets chosen > max key
SHIFTS = {
    "documents": [("doc_id", 100_000)],
    "embeddings": [("vec_id", 10_000)],
    "events": [("event_id", 1_000_000)],
    "lineitem": [("l_orderkey", 1_000_000)],
    "orders": [("o_orderkey", 1_000_000)],
}
COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfsoak"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"copied {t}", flush=True)
    for t, shifts in SHIFTS.items():
        src = f"{SRC}/{t}.parquet"
        cols = [r[0] for r in con.execute(f"describe select * from '{src}'").fetchall()]
        selects = []
        for r in range(reps):
            exprs = []
            for c in cols:
                shift = next((off for sc, off in shifts if sc == c), None)
                if shift is not None:
                    exprs.append(f"{c} + {r * shift} as {c}")
                elif t == "documents" and c == "text" and r > 0:
                    # perturb replicas so near-dup clusters keep sf0.1 size
                    exprs.append(f"text || ' rep{r}' as text")
                elif t == "documents" and c == "n_chars" and r > 0:
                    exprs.append(f"n_chars + {len(f' rep{r}')} as n_chars")
                else:
                    exprs.append(c)
            selects.append(f"select {', '.join(exprs)} from '{src}'")
        union = " union all ".join(selects)
        con.execute(f"copy ({union}) to '{out}/{t}.parquet' (format parquet)")
        n = con.execute(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(f"wrote {t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
