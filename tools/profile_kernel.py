"""Contention curve of the _encode_chunk kernel outside Spark.

Each worker process encodes the same synthetic sorted posting stream
(n_rows split into 65536-row Arrow-batch-sized chunks, like mapInArrow
delivers). Reports wall at 1, 8, 32 concurrent processes.

Usage: python tools/profile_kernel.py [rows_per_proc]
"""
from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Process, Queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_chunks(n_rows: int, batch: int = 65536):
    rng = np.random.default_rng(7)
    # ~2400 postings per term, sorted by (tid, salt, doc)
    n_terms = max(1, n_rows // 2400)
    tids = np.sort(rng.integers(-(2**62), 2**62, n_terms, dtype=np.int64).repeat(2400))[:n_rows]
    tid2 = tids + 13
    salts = np.zeros(n_rows, dtype=np.int64)
    docs = np.empty(n_rows, dtype=np.int64)
    # increasing docIDs within each term
    docs = rng.integers(0, 2_000_000, n_rows, dtype=np.int64)
    # sort within term groups
    order = np.lexsort((docs, tids))
    tids, tid2, docs = tids[order], tid2[order], docs[order]
    tfs = rng.integers(1, 5, n_rows, dtype=np.int64)
    dls = np.full(n_rows, 24, dtype=np.int64)
    chunks = []
    for i in range(0, n_rows, batch):
        sl = slice(i, i + batch)
        chunks.append(
            {"_tid": tids[sl], "_tid2": tid2[sl], "salt": salts[sl],
             "docID": docs[sl], "tf": tfs[sl], "dl": dls[sl]}
        )
    return chunks


def worker(chunks, q):
    from neural_search_spark.index.segments import _encode_chunk

    t0 = time.time()
    for c in chunks:
        _encode_chunk(c, 24.0, 128)
    q.put(time.time() - t0)


def run(nproc: int, chunks) -> float:
    q: Queue = Queue()
    ps = [Process(target=worker, args=(chunks, q)) for _ in range(nproc)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.time() - t0


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    chunks = make_chunks(rows)
    out = {"rows_per_proc": rows}
    for n in (1, 8, 32):
        w = run(n, chunks)
        out[f"wall_{n}"] = round(w, 2)
        out[f"rows_per_sec_{n}"] = round(n * rows / w)
        print(f"  {n} procs: {w:.2f}s  ({n*rows/w:,.0f} rows/s aggregate)", file=sys.stderr)
    out["eff_8_32"] = round(out["rows_per_sec_32"] / (4 * out["rows_per_sec_8"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
