"""Multi-term queries (prefix/wildcard/fuzzy) + minimum_should_match vs
pure-Python oracles over the session transcripts fixture."""

from __future__ import annotations

import re

import pytest

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.query.bm25 import bm25_score_all
from neural_search_spark.query.multiterm import (
    TooManyClauses,
    auto_fuzziness,
    literal_prefix,
    multiterm_score_all,
    regex_literal_prefix,
    wildcard_to_regex,
)

from tests import oracle


# ---------------------------------------------------------------------------
# pure helpers
# ---------------------------------------------------------------------------


def test_wildcard_to_regex_escapes_metachars():
    assert wildcard_to_regex("a*b") == "^a.*b$"
    assert wildcard_to_regex("a?b") == "^a.b$"
    # regex metachars in the pattern are literals in Lucene wildcards
    rx = wildcard_to_regex("a.b+*")
    assert re.fullmatch(rx[1:-1], "a.b+xyz")
    assert not re.fullmatch(rx[1:-1], "aXb+xyz")


def test_literal_prefix():
    assert literal_prefix("abc*def") == "abc"
    assert literal_prefix("*abc") == ""
    assert literal_prefix("ab?c") == "ab"


def test_regex_literal_prefix():
    assert regex_literal_prefix("dat.*") == "dat"
    assert regex_literal_prefix("abc") == "abc"
    assert regex_literal_prefix("s(o|pa)r[tk]") == "s"
    assert regex_literal_prefix("ab?c") == "a"  # quantified char excluded
    assert regex_literal_prefix("ab*") == "a"
    assert regex_literal_prefix("[sd]ort") == ""
    assert regex_literal_prefix(r"a\.b") == "a.b"  # escaped punct is literal
    assert regex_literal_prefix(r"a\db") == "a"  # class shorthand stops it
    assert regex_literal_prefix(r"a\.?b") == "a"  # quantified escape stops
    # top-level alternation: NO prefix is required of every match — pushdown
    # on 'sort' would silently drop the 'spark' branch (ADVICE r4, high).
    assert regex_literal_prefix("sort|spark") == ""
    assert regex_literal_prefix("sort|sparse|spill") == ""
    assert regex_literal_prefix(r"sort\|spark") == "sort|spark"  # escaped: literal
    assert regex_literal_prefix("so(rt|ck)") == "so"  # grouped alternation is fine
    assert regex_literal_prefix("abc[x|y]z") == "abc"  # '|' inside class is literal


def test_auto_fuzziness_bands():
    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1
    assert auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2


# ---------------------------------------------------------------------------
# python-side expansion oracle
# ---------------------------------------------------------------------------


def _corpus(transcripts) -> dict[int, str]:
    return {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand_py(docs: dict[int, str], kind: str, value: str, fuzz=None, plen=0) -> set[str]:
    vocab = {t for text in docs.values() for t in tokenize_py(text)}
    if kind == "prefix":
        return {t for t in vocab if t.startswith(value)}
    if kind == "wildcard":
        rx = re.compile(wildcard_to_regex(value)[1:-1])
        return {t for t in vocab if rx.fullmatch(t)}
    if kind == "regexp":
        rx = re.compile("(?:" + value + ")")
        return {t for t in vocab if rx.fullmatch(t)}
    f = auto_fuzziness(value) if fuzz in (None, "AUTO") else int(fuzz)
    out = {t for t in vocab if _lev(t, value) <= f}
    if plen:
        out = {t for t in out if t.startswith(value[:plen])}
    return out


def _const_expected(docs: dict[int, str], terms: set[str], boost: float) -> dict[int, float]:
    return {
        d: boost for d, text in docs.items() if terms & set(tokenize_py(text))
    }


def _collect_scores(df) -> dict[int, float]:
    return {r["docID"]: r["score"] for r in df.collect()}


@pytest.mark.parametrize(
    "kind,value,kw",
    [
        ("prefix", "s", {}),
        ("prefix", "sc", {}),
        ("wildcard", "s*an", {}),
        ("wildcard", "?ap", {}),  # no literal prefix → no pushable cond
        ("fuzzy", "span", {"fuzziness": 1}),
        ("fuzzy", "dat", {"fuzziness": "AUTO"}),  # AUTO(3)=1 → data
        ("fuzzy", "stack", {"fuzziness": 2, "prefix_length": 2}),
        ("regexp", "s(o|pa)r[tk]", {}),  # sort | spark
        ("regexp", "dat.*", {}),  # literal prefix 'dat' pushes into the scan
        # top-level alternation: prefix pushdown must be DISABLED, else the
        # 'spark' branch is silently dropped (ADVICE r4, high severity)
        ("regexp", "sort|spark", {}),
    ],
)
def test_constant_score_matches_python_expansion(
    transcripts, index_tables, kind, value, kw
):
    docs = _corpus(transcripts)
    terms = _expand_py(docs, kind, value, kw.get("fuzziness"), kw.get("prefix_length", 0))
    assert terms, f"test query {kind} {value!r} must match something"
    expected = _const_expected(docs, terms, 2.5)
    got = _collect_scores(
        multiterm_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, kind, value, boost=2.5, **kw,
        )
    )
    assert got == expected


def test_constant_score_empty_expansion(index_tables):
    got = multiterm_score_all(
        index_tables.postings, index_tables.doclens, index_tables.term_stats,
        index_tables.meta, "prefix", "zzzznope",
    )
    assert got.count() == 0


def test_constant_score_semijoin_path_identical(transcripts, index_tables):
    # inlist_limit=0 forces the distributed semi-join regime; results must
    # be identical to the IN-list path
    a = _collect_scores(
        multiterm_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, "prefix", "s",
        )
    )
    b = _collect_scores(
        multiterm_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, "prefix", "s", inlist_limit=0,
        )
    )
    assert a == b and a


def test_scoring_boolean_matches_bm25_oracle(transcripts, index_tables):
    docs = _corpus(transcripts)
    terms = _expand_py(docs, "prefix", "sc")
    expected = oracle.bm25_scores(docs, {t: 1.5 for t in terms})
    got = _collect_scores(
        multiterm_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, "prefix", "sc", boost=1.5, rewrite="scoring_boolean",
        )
    )
    assert set(got) == set(expected)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_scoring_boolean_too_many_clauses(index_tables):
    with pytest.raises(TooManyClauses):
        multiterm_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, "prefix", "s", rewrite="scoring_boolean", max_clauses=2,
        )


# ---------------------------------------------------------------------------
# minimum_should_match
# ---------------------------------------------------------------------------


def _msm_expected(docs, weights, msm, clause_counts=None):
    scores = oracle.bm25_scores(docs, weights)
    counts = clause_counts or {t: 1 for t in weights}
    out = {}
    for d, s in scores.items():
        toks = set(tokenize_py(docs[d]))
        matched = sum(c for t, c in counts.items() if t in toks)
        if matched >= msm:
            out[d] = s
    return out


def test_min_should_match_filters_but_keeps_scores(transcripts, index_tables):
    docs = _corpus(transcripts)
    weights = {"sort": 1.0, "merge": 1.0, "heap": 1.0}
    expected = _msm_expected(docs, weights, 2)
    some_single = _msm_expected(docs, weights, 1)
    assert len(expected) < len(some_single), "msm=2 must actually filter"
    got = _collect_scores(
        bm25_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, weights, min_should_match=2,
        )
    )
    assert set(got) == set(expected)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_min_should_match_duplicate_clauses(transcripts, index_tables):
    # query "merge merge heap": the duplicated term is TWO Lucene clauses,
    # so a doc containing only "merge" meets msm=2
    docs = _corpus(transcripts)
    weights = {"merge": 2.0, "heap": 1.0}
    counts = {"merge": 2, "heap": 1}
    expected = _msm_expected(docs, weights, 2, counts)
    got = _collect_scores(
        bm25_score_all(
            index_tables.postings, index_tables.doclens, index_tables.term_stats,
            index_tables.meta, weights, min_should_match=2, clause_counts=counts,
        )
    )
    assert set(got) == set(expected)
    only_merge = [
        d for d, text in docs.items()
        if "merge" in tokenize_py(text) and "heap" not in tokenize_py(text)
    ]
    assert only_merge and all(d in got for d in only_merge)


# ---------------------------------------------------------------------------
# DSL integration
# ---------------------------------------------------------------------------


def test_dsl_multiterm_kinds(engine, transcripts):
    docs = _corpus(transcripts)
    for q, kind, value, kw in [
        ({"prefix": {"text": {"value": "sc", "boost": 2.0}}}, "prefix", "sc", {}),
        ({"wildcard": {"text": {"value": "s*an"}}}, "wildcard", "s*an", {}),
        ({"fuzzy": {"text": {"value": "dat", "fuzziness": 1}}}, "fuzzy", "dat",
         {"fuzziness": 1}),
        ({"regexp": {"text": {"value": "s(o|pa)r[tk]", "boost": 1.5}}},
         "regexp", "s(o|pa)r[tk]", {}),
    ]:
        terms = _expand_py(docs, kind, value, kw.get("fuzziness"))
        boost = q[kind]["text"].get("boost", 1.0)
        expected = _const_expected(docs, terms, boost)
        hits = engine.search(q, k=len(docs)).collect()
        assert {r["docID"]: r["score"] for r in hits} == expected


def test_dsl_match_minimum_should_match(engine, transcripts, index_tables):
    docs = _corpus(transcripts)
    q = {"match": {"text": {"query": "sort merge heap", "minimum_should_match": 2}}}
    expected = _msm_expected(docs, {"sort": 1.0, "merge": 1.0, "heap": 1.0}, 2)
    hits = engine.search(q, k=len(docs)).collect()
    got = {r["docID"]: r["score"] for r in hits}
    assert set(got) == set(expected)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, rel=1e-9)
