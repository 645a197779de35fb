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


def _brute_span_near(rows, terms, slop, in_order):
    """Python reference for span_near_match's set semantics."""
    from itertools import product

    exp = {}
    for i, text in rows:
        toks = text.split()
        pos = {t: [p for p, x in enumerate(toks) if x == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            continue
        anchors = set()
        if in_order:
            q = len(terms)
            for combo in product(*(pos[t] for t in terms)):
                if all(combo[j] > combo[j - 1] for j in range(1, q)) and (
                    combo[-1] - combo[0] - (q - 1) <= slop
                ):
                    anchors.add(combo[0])
        else:
            q = len(terms)
            for combo in product(*(pos[t] for t in terms)):
                if max(combo) - min(combo) - (q - 1) <= slop:
                    anchors.add(min(combo))
        if anchors:
            exp[i] = len(anchors)
    return exp


def test_span_near_hand_cases(positional):
    from neural_search_spark.query.phrase import span_near_match

    # in-order "a ... c" slop=1: doc1 "a b c a b c" → a@0-c@2 (span 1),
    # a@3-c@5 (span 1); doc0/2/3/4 lack coverage or order
    got = {r.docID: r.sntf for r in span_near_match(positional, ["a", "c"], slop=1).collect()}
    assert got == {1: 2}
    # slop=0 in-order == exact phrase ("a b": doc0 ptf2, doc1 ptf2, doc2 ptf1)
    got0 = {r.docID: r.sntf for r in span_near_match(positional, ["a", "b"], slop=0).collect()}
    assert got0 == {0: 2, 1: 2, 2: 1}
    # unordered "c a" slop=0: adjacency either direction in doc1 (c@2,a@3)
    gotu = {
        r.docID: r.sntf
        for r in span_near_match(positional, ["c", "a"], slop=0, in_order=False).collect()
    }
    assert gotu == {1: 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        span_near_match(positional, ["a", "a"], slop=1, in_order=False)
    with _pt.raises(ValueError):
        span_near_match(positional, ["a"], slop=-1)


def test_span_near_randomized_vs_python_oracle(spark):
    from neural_search_spark.query.phrase import span_near_match

    rng = random.Random(13)
    vocab = list("abcde")
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "docID long, text string")
    pos = build_positional_postings(df)
    cases = [
        (["a", "b"], 0, True),
        (["a", "b"], 3, True),
        (["a", "b", "c"], 2, True),
        (["a", "a", "b"], 4, True),  # repeated term, in-order
        (["a", "b"], 2, False),
        (["a", "b", "c"], 3, False),
    ]
    for terms, slop, in_order in cases:
        got = {
            r.docID: r.sntf
            for r in span_near_match(pos, terms, slop=slop, in_order=in_order).collect()
        }
        assert got == _brute_span_near(rows, terms, slop, in_order), (terms, slop, in_order)


def test_span_near_scores_and_topk(docs, positional):
    from neural_search_spark.query.phrase import span_near_scores, span_near_topk

    tabs = build_index_tables(docs)
    got = {
        r.docID: r.score
        for r in span_near_scores(positional, tabs.term_stats, tabs.meta, ["a", "c"], slop=1).collect()
    }
    n, avgdl = 5, (5 + 6 + 3 + 3 + 1) / 5
    idf = lambda d: math.log(1 + (n - d + 0.5) / (d + 0.5))  # noqa: E731
    s_idf = idf(4) + idf(2)  # df(a)=4, df(c)=2
    exp = s_idf * 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 6 / avgdl))
    assert set(got) == {1} and got[1] == pytest.approx(exp, abs=1e-12)
    top = span_near_topk(positional, tabs.term_stats, tabs.meta, ["a", "b"], k=2, slop=0).collect()
    assert [t.docID for t in top] == [0, 1]
    # unindexed term → empty
    assert span_near_scores(positional, tabs.term_stats, tabs.meta, ["a", "zzz"]).count() == 0


def test_dsl_span_near_and_sloppy_match_phrase(docs, positional):
    tabs = build_index_tables(docs)
    eng = QueryEngine(tables=tabs, docs=docs, positional=positional)
    # "a c" slop=1 in-order: only doc1 (a@0-c@2, a@3-c@5)
    r = eng.search({"span_near": {"field": "text", "terms": ["a", "c"], "slop": 1}}, k=5).collect()
    assert [x.docID for x in r] == [1]
    # match_phrase with slop routes to the same matcher
    r2 = eng.search({"match_phrase": {"text": {"query": "a c", "slop": 1}}}, k=5).collect()
    assert [(x.docID, x.score) for x in r2] == [(x.docID, x.score) for x in r]
    # unordered finds the reversed pair too
    r3 = eng.search(
        {"span_near": {"field": "text", "terms": ["c", "a"], "slop": 0, "in_order": False}}, k=5
    ).collect()
    assert [x.docID for x in r3] == [1]
    # engine without a positional index refuses span_near
    eng2 = QueryEngine(tables=tabs, docs=docs)
    with pytest.raises(QueryValidationError):
        eng2.search({"span_near": {"field": "text", "terms": ["a", "c"], "slop": 1}})


# ---------------------------------------------------------------------------
# match_phrase_prefix (MultiPhraseQuery prefix rewrite)
# ---------------------------------------------------------------------------

PP_DOCS = [
    (0, "new york city"),
    (1, "the new yorker magazine"),
    (2, "old york city"),
    (3, "new yank none"),
    (4, "brand new yospace"),
]


@pytest.fixture(scope="module")
def pp_docs(spark):
    return spark.createDataFrame(PP_DOCS, "docID long, text string").persist()


@pytest.fixture(scope="module")
def pp_positional(pp_docs):
    return build_positional_postings(pp_docs).persist()


def test_phrase_prefix_match_and_truncation(pp_docs, pp_positional):
    from neural_search_spark.query.phrase import phrase_prefix_scores

    tabs = build_index_tables(pp_docs)
    # "new yor" → fixed=[new], expansions(yor*) = {york, yorker} term-asc
    got = {
        r.docID
        for r in phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["new", "yor"]
        ).collect()
    }
    assert got == {0, 1}
    # max_expansions=1 keeps only the FIRST dictionary term ('york')
    got1 = {
        r.docID
        for r in phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["new", "yor"], max_expansions=1
        ).collect()
    }
    assert got1 == {0}
    # no dictionary term matches the prefix → empty
    assert (
        phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["new", "zzz"]
        ).count()
        == 0
    )
    # unindexed FIXED term → empty
    assert (
        phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["zzz", "yor"]
        ).count()
        == 0
    )
    # single-token query = pure prefix, scored as 1-slot multi-phrase
    solo = {
        r.docID
        for r in phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["yor"]
        ).collect()
    }
    assert solo == {0, 1, 2}


def test_phrase_prefix_scores_hand_oracle(pp_docs, pp_positional):
    from neural_search_spark.query.phrase import phrase_prefix_scores

    tabs = build_index_tables(pp_docs)
    got = {
        r.docID: r.score
        for r in phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["new", "yor"]
        ).collect()
    }
    n, avgdl = 5, (3 + 4 + 3 + 3 + 3) / 5
    idf = lambda d: math.log(1 + (n - d + 0.5) / (d + 0.5))  # noqa: E731
    # MultiPhraseQuery idf: one addend per fixed position + one per EXPANSION
    s_idf = idf(4) + idf(2) + idf(1)  # df(new)=4, df(york)=2, df(yorker)=1

    def score(ptf, dl):
        return s_idf * ptf / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert set(got) == {0, 1}
    assert got[0] == pytest.approx(score(1, 3), abs=1e-12)
    assert got[1] == pytest.approx(score(1, 4), abs=1e-12)


def test_dsl_match_phrase_prefix(pp_docs, pp_positional):
    from neural_search_spark.query.phrase import phrase_prefix_scores

    tabs = build_index_tables(pp_docs)
    eng = QueryEngine(tables=tabs, docs=pp_docs, positional=pp_positional)
    r = eng.search(
        {"match_phrase_prefix": {"text": {"query": "new yor"}}}, k=5
    ).collect()
    direct = {
        x.docID: x.score
        for x in phrase_prefix_scores(
            pp_positional, tabs.term_stats, tabs.meta, ["new", "yor"]
        ).collect()
    }
    assert {x.docID: x.score for x in r} == direct
    # no positional index → validation error
    eng2 = QueryEngine(tables=tabs, docs=pp_docs)
    with pytest.raises(QueryValidationError):
        eng2.search({"match_phrase_prefix": {"text": {"query": "new yor"}}})
    with pytest.raises(QueryValidationError):
        eng.search({"match_phrase_prefix": {"text": {"query": "new yor",
                                                     "max_expansions": 0}}})
