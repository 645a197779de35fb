"""Poor-man's JVM profiler: run the encode job while sampling thread stacks
with jstack, then print the most common RUNNABLE frames.

Usage: python tools/profile_jstack.py <cores> [turns]
"""
from __future__ import annotations

import collections
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.store import build_index
    from neural_search_spark.index import segments as S

    spark = get_spark("profile-jstack", master=f"local[{cores}]", shuffle_partitions=64)
    base = f"/dev/shm/prof_js_{cores}"
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

    pid = os.getpid()  # local mode: the JVM is a child of this process? no — py4j launches it
    # find the java pid: child of this process tree
    out = subprocess.run(["pgrep", "-f", "profile-jstack"], capture_output=True, text=True)
    jpid = None
    for cand in out.stdout.split():
        try:
            with open(f"/proc/{cand}/comm") as f:
                if f.read().strip() == "java":
                    jpid = cand
        except OSError:
            pass
    if jpid is None:
        out = subprocess.run(["pgrep", "-x", "java"], capture_output=True, text=True)
        jpid = out.stdout.split()[-1]
    print(f"sampling java pid {jpid}", file=sys.stderr)

    frames: collections.Counter = collections.Counter()
    top2: collections.Counter = collections.Counter()
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            r = subprocess.run(["jstack", jpid], capture_output=True, text=True)
            cur_state, stack = None, []
            for line in r.stdout.splitlines():
                if line.startswith('"'):
                    if cur_state == "RUNNABLE" and stack:
                        frames[stack[0]] += 1
                        top2["; ".join(stack[:3])] += 1
                    cur_state, stack = None, []
                elif "java.lang.Thread.State: RUNNABLE" in line:
                    cur_state = "RUNNABLE"
                elif line.strip().startswith("at ") and cur_state == "RUNNABLE" and len(stack) < 3:
                    s = line.strip()[3:].split("(")[0]
                    # skip uninteresting roots
                    stack.append(s)
            if cur_state == "RUNNABLE" and stack:
                frames[stack[0]] += 1
                top2["; ".join(stack[:3])] += 1
            time.sleep(0.2)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    t0 = time.time()
    full.count()
    wall = time.time() - t0
    stop.set()
    t.join(timeout=5)
    print(f"wall: {wall:.1f}s", file=sys.stderr)
    print("== top leaf frames ==")
    for f_, c in frames.most_common(25):
        print(f"{c:5d}  {f_}")
    print("== top 3-frame stacks ==")
    for f_, c in top2.most_common(15):
        print(f"{c:5d}  {f_}")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
