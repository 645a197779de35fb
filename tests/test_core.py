from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
from neural_search_spark.index import build_index_tables
from neural_search_spark.query.bm25 import bm25_topk

from tests import oracle


def test_tokenizer_matches_python(spark, transcripts):
    from neural_search_spark.analysis.tokenizer import tokenize_col

    rows = transcripts.select("text", tokenize_col("text").alias("toks")).limit(50).collect()
    for r in rows:
        assert r["toks"] == tokenize_py(r["text"])


def test_docids_stable_and_contiguous(transcripts):
    rows = transcripts.select("conv_id", "turn_idx", "docID").collect()
    n = len(rows)
    by_key = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["docID"] for r in by_key] == list(range(n))


def test_per_turn_text_equality_invariant(spark):
    """BASELINE.json:16 — per-turn text equality under stable (conv_id,
    turn_idx) ordering: two independent docID assignments of the same data
    (different partitioning) map identical (conv_id, turn_idx) → identical
    (docID, text)."""
    a = assign_doc_ids(synthesize_transcripts(spark, 10, 5, seed=42, partitions=2))
    b = assign_doc_ids(synthesize_transcripts(spark, 10, 5, seed=42, partitions=7), num_partitions=3)
    ra = {(r["conv_id"], r["turn_idx"]): (r["docID"], r["text"]) for r in a.collect()}
    rb = {(r["conv_id"], r["turn_idx"]): (r["docID"], r["text"]) for r in b.collect()}
    assert ra == rb
    # unique token tok{i} appears exactly once, in the row whose docID == i
    for (_, _), (doc_id, text) in ra.items():
        assert f"tok{doc_id}" in text.split()


def _local_docs(transcripts) -> dict[int, str]:
    return {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}


def test_index_tables_match_oracle(transcripts, index_tables):
    docs = _local_docs(transcripts)
    postings_o, doclens_o, n_o, avgdl_o = oracle.build_oracle_index(docs)

    got_doclens = {r["docID"]: r["dl"] for r in index_tables.doclens.collect()}
    assert got_doclens == doclens_o

    got_postings = {(r["term"], r["docID"]): r["tf"] for r in index_tables.postings.collect()}
    exp_postings = {(t, d): tf for t, m in postings_o.items() for d, tf in m.items()}
    assert got_postings == exp_postings

    got_stats = {r["term"]: r["df"] for r in index_tables.term_stats.collect()}
    assert got_stats == {t: len(m) for t, m in postings_o.items()}

    m = index_tables.meta.first()
    assert m["N"] == n_o
    assert m["avgdl"] == pytest.approx(avgdl_o, rel=1e-12)


@pytest.mark.parametrize(
    "terms",
    [
        ["the", "spark", "query"],
        {"data": 2.0, "index": 1.0, "zzz_missing": 3.0},
        ["tok5"],  # unique token → exactly one hit
        ["cache", "heap", "scan", "the"],
    ],
)
def test_bm25_topk_rank_identical_to_oracle(transcripts, index_tables, terms):
    docs = _local_docs(transcripts)
    exp = oracle.topk(oracle.bm25_scores(docs, terms), 10)
    got = bm25_topk(
        index_tables.postings, index_tables.doclens, index_tables.term_stats,
        index_tables.meta, terms, k=10,
    ).collect()
    assert [r["docID"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_bm25_prefilter_keeps_global_stats(transcripts, index_tables):
    """Pre-filter restricts candidates but idf/avgdl stay global (reference
    query/HybridQuery.java:43-60 FILTER semantics)."""
    docs = _local_docs(transcripts)
    allowed = {d for d in docs if d % 2 == 0}
    exp_all = oracle.bm25_scores(docs, ["the", "data"])
    exp = oracle.topk({d: s for d, s in exp_all.items() if d in allowed}, 10)
    pre = transcripts.select("docID").filter(F.col("docID") % 2 == 0)
    got = bm25_topk(
        index_tables.postings, index_tables.doclens, index_tables.term_stats,
        index_tables.meta, ["the", "data"], k=10, prefilter=pre,
    ).collect()
    assert [r["docID"] for r in got] == [d for d, _ in exp]
