"""CPU accounting for the segments encode job: wall vs utime/stime of the
whole process tree (JVM + python workers), split JVM vs python.

Usage: python tools/profile_cpu.py <cores> [turns]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLK = os.sysconf("SC_CLK_TCK")


def tree_cpu() -> dict[str, float]:
    """Sum utime+stime over every live process on the box owned by this
    session's java/python (good enough: the sandbox runs nothing else big)."""
    ju = js = pu = ps_ = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
        except OSError:
            continue
        ut, st = int(parts[11]) / CLK, int(parts[12]) / CLK
        if comm == "java":
            ju += ut
            js += st
        elif comm.startswith("python"):
            pu += ut
            ps_ += st
    return {"java_u": ju, "java_s": js, "py_u": pu, "py_s": ps_}


def main() -> None:
    cores = int(sys.argv[1])
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.store import build_index
    from neural_search_spark.index import segments as S

    spark = get_spark("profile-cpu", master=f"local[{cores}]", shuffle_partitions=64)
    base = f"/dev/shm/prof_cpu_{cores}"
    shutil.rmtree(base, ignore_errors=True)
    tr = synthesize_transcripts(
        spark, n_convs=turns // 10, turns_per_conv=10, tokens_per_turn=24, partitions=64
    )
    build_index(spark, tr, base, source_fingerprint="prof", resume=False)
    postings = spark.read.parquet(os.path.join(base, "postings"))
    term_stats = spark.read.parquet(os.path.join(base, "term_stats"))
    doclens = spark.read.parquet(os.path.join(base, "doclens"))
    m = doclens.agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(m["N"]), float(m["avgdl"])
    full = S.build_segments(postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats)
    full.count()  # warm
    out = {"cores": cores}
    for name in ("full_encode", "full_encode2"):
        c0, t0 = tree_cpu(), time.time()
        full.count()
        wall, c1 = time.time() - t0, tree_cpu()
        out[name] = {
            "wall": round(wall, 2),
            **{k: round(c1[k] - c0[k], 1) for k in c1},
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
