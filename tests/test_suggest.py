"""Term suggester vs a pure-Python oracle over the fixture vocabulary."""

from __future__ import annotations

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.query.suggest import term_suggest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _oracle(docs: dict[int, str], value: str, size: int, max_edits: int, plen: int):
    df: dict[str, int] = {}
    for text in docs.values():
        for t in set(tokenize_py(text)):
            df[t] = df.get(t, 0) + 1
    cand = [
        (t, _lev(t, value), n) for t, n in df.items()
        if t != value and _lev(t, value) <= max_edits
        and (plen == 0 or t.startswith(value[:plen]))
    ]
    cand.sort(key=lambda x: (x[1], -x[2], x[0]))
    return cand[:size]


def test_term_suggest_matches_oracle(transcripts, index_tables):
    docs = {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}
    for value, plen in [("merg", 1), ("stat", 1), ("dta", 0)]:
        expected = _oracle(docs, value, 5, 2, plen)
        assert expected, f"suggest oracle for {value!r} must be non-empty"
        got = [
            (r["suggestion"], r["distance"], r["df"])
            for r in term_suggest(
                index_tables.term_stats, value, size=5, max_edits=2, prefix_length=plen
            ).orderBy("rank").collect()
        ]
        assert got == expected


def test_term_suggest_excludes_exact_hit(transcripts, index_tables):
    out = term_suggest(index_tables.term_stats, "merge", size=10).collect()
    assert all(r["suggestion"] != "merge" for r in out)


def test_completion_suggest(index_tables, transcripts):
    from collections import Counter

    from neural_search_spark.analysis.tokenizer import tokenize_py
    from neural_search_spark.query.suggest import completion_suggest

    docs = {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}
    df_counts = Counter()
    for text in docs.values():
        for t in set(tokenize_py(text)):
            df_counts[t] += 1
    prefix = "s"
    expected = sorted(
        ((t, c) for t, c in df_counts.items() if t.startswith(prefix)),
        key=lambda x: (-x[1], x[0]),
    )[:4]
    got = completion_suggest(index_tables.term_stats, prefix, size=4).collect()
    assert [(r["suggestion"], r["df"]) for r in sorted(got, key=lambda r: r["rank"])] == expected

    import pytest as _pt

    with _pt.raises(ValueError):
        completion_suggest(index_tables.term_stats, "", size=4)
