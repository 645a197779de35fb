"""Positional postings + exact phrase query (query/phrase.py) and the
n-gram decontamination op (ops/dedup.py ngram_contamination)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import build_index_tables
from neural_search_spark.ops.dedup import ngram_contamination
from neural_search_spark.query.dsl import QueryEngine, QueryValidationError
from neural_search_spark.query.phrase import (
    build_positional_postings,
    phrase_match,
    phrase_scores,
    phrase_topk,
)

DOCS = [
    (0, "a b a b a"),
    (1, "a b c a b c"),
    (2, "b a b"),
    (3, "c c c"),
    (4, "a"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "docID long, text string").persist()


@pytest.fixture(scope="module")
def positional(docs):
    return build_positional_postings(docs).persist()


def test_positional_fast_path_matches_declarative(docs):
    fast = {
        (r.term, r.docID): (list(r.positions), r.tf, r.dl)
        for r in build_positional_postings(docs).collect()
    }
    slow = {
        (r.term, r.docID): (list(r.positions), r.tf, r.dl)
        for r in build_positional_postings(docs, one_row_per_doc=False).collect()
    }
    assert fast == slow
    assert fast[("a", 0)] == ([0, 2, 4], 3, 5)
    assert fast[("b", 2)] == ([0, 2], 2, 3)


def test_phrase_match_counts_and_overlaps(positional):
    # "a b": doc0 at bases {0, 2}, doc1 at {0, 3}, doc2 at {1}
    got = {r.docID: r.ptf for r in phrase_match(positional, ["a", "b"]).collect()}
    assert got == {0: 2, 1: 2, 2: 1}
    # repeated-term phrase "a b a" needs all 3 offsets: only doc0 (bases 0, 2)
    got = {r.docID: r.ptf for r in phrase_match(positional, ["a", "b", "a"]).collect()}
    assert got == {0: 2}
    # phrase absent everywhere
    assert phrase_match(positional, ["c", "a", "c"]).count() == 0


def test_phrase_scores_hand_oracle(docs, positional):
    tabs = build_index_tables(docs)
    got = {r.docID: r.score for r in phrase_scores(positional, tabs.term_stats, tabs.meta, ["a", "b"]).collect()}
    n, avgdl = 5, (5 + 6 + 3 + 3 + 1) / 5
    idf = lambda d: math.log(1 + (n - d + 0.5) / (d + 0.5))  # noqa: E731
    s_idf = idf(4) + idf(3)  # df(a)=4, df(b)=3

    def score(ptf, dl):
        return s_idf * ptf / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    exp = {0: score(2, 5), 1: score(2, 6), 2: score(1, 3)}
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d] == pytest.approx(s, abs=1e-12)
    # unindexed term in the phrase → empty, not an error
    assert phrase_scores(positional, tabs.term_stats, tabs.meta, ["a", "zzz"]).count() == 0


def test_phrase_randomized_vs_python_oracle(spark):
    rng = random.Random(7)
    vocab = list("abcdef")
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))) for i in range(60)]
    df = spark.createDataFrame(rows, "docID long, text string")
    pos = build_positional_postings(df)
    for phrase in (["a", "b"], ["c", "a", "c"], ["a", "a"], ["f"]):
        got = {r.docID: r.ptf for r in phrase_match(pos, phrase).collect()}
        exp = {}
        for i, text in rows:
            toks = text.split()
            c = sum(
                1
                for p in range(len(toks) - len(phrase) + 1)
                if toks[p : p + len(phrase)] == phrase
            )
            if c:
                exp[i] = c
        assert got == exp, phrase


def test_dsl_match_phrase_and_hybrid(docs, positional):
    tabs = build_index_tables(docs)
    eng = QueryEngine(tables=tabs, docs=docs, positional=positional)
    r = eng.search({"match_phrase": {"text": "a b"}}, k=3).collect()
    assert [x.docID for x in r] == [0, 1, 2]  # doc0: ptf 2/dl 5 beats doc1: 2/6
    # boost scales linearly
    r2 = eng.search({"match_phrase": {"text": {"query": "a b", "boost": 2.0}}}, k=3).collect()
    assert r2[0].score == pytest.approx(2 * r[0].score)
    # composes inside hybrid (generic per-subquery path)
    h = eng.search(
        {"hybrid": {"queries": [{"match_phrase": {"text": "a b"}}, {"match": {"text": "c"}}]}},
        k=5,
    )
    assert h.count() > 0
    # engine without a positional index refuses match_phrase
    eng2 = QueryEngine(tables=tabs, docs=docs)
    with pytest.raises(QueryValidationError):
        eng2.search({"match_phrase": {"text": "a b"}})


def test_phrase_topk_tie_break(docs, positional):
    tabs = build_index_tables(docs)
    top = phrase_topk(positional, tabs.term_stats, tabs.meta, ["a", "b"], k=2).collect()
    assert [t.docID for t in top] == [0, 1]


def test_ngram_contamination(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z w"), (3, "q b c d q")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, "b c d q")], "doc_id long, text string")
    got = {r.id: r.matched_ngrams for r in ngram_contamination(corpus, bench, n=3).collect()}
    # bench 3-grams: {"b c d", "c d q"}; doc1 matches "b c d";
    # doc3 matches both; doc2 none
    assert got == {1: 1, 3: 2}
    # short-doc fallback: a <n-token doc matches only on its exact token string
    corpus2 = spark.createDataFrame([(7, "b c"), (8, "b c d q")], "doc_id long, text string")
    got2 = {
        r.id: r.matched_ngrams
        for r in ngram_contamination(corpus2, bench, n=13).collect()
    }
    assert got2 == {8: 1}
