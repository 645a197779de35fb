"""Best-window fragment highlighting (ops/highlight.py)."""

from __future__ import annotations

import pytest

from neural_search_spark.ops.highlight import highlight

DOCS = [
    (0, "x x spark x x x x x x x x x spark join spark x"),
    (1, "join alone here"),
    (2, "nothing matches in this one"),
    (3, "spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "docID long, text string")


def test_highlight_best_window_and_tags(docs):
    got = {r.id: (r.n_hits, r.fragment) for r in
           highlight(docs, ["spark", "join"], frag_size=5, lead=1).collect()}
    # doc0 hits at 2, 12, 13, 14: window [12,17) has 3 hits, beats [2,7);
    # fragment starts at 12-1=11
    assert got[0] == (4, "x <em>spark</em> <em>join</em> <em>spark</em> x")
    # doc1: single hit at 0, lead clamps to 0
    assert got[1] == (1, "<em>join</em> alone here")
    # doc3: whole doc shorter than frag_size
    assert got[3] == (1, "<em>spark</em>")
    # non-matching doc excluded
    assert 2 not in got


def test_highlight_tie_prefers_earliest(spark):
    df = spark.createDataFrame([(0, "a x x x a")], "docID long, text string")
    got = highlight(df, ["a"], frag_size=3, lead=0).collect()[0]
    assert got.fragment == "<em>a</em> x x"  # both windows have 1 hit → earliest


def test_highlight_validation(docs):
    with pytest.raises(ValueError):
        highlight(docs, [])
    with pytest.raises(ValueError):
        highlight(docs, ["a"], frag_size=0)
