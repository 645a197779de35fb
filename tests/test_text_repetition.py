"""repetition_features (Gopher-style dup-line / top-token / dup-2gram
signals) vs hand-computed expectations."""

from __future__ import annotations

import pytest

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.ops.text import repetition_features

DOCS = [
    (0, "a b c d"),                      # no repetition
    (1, "spam spam spam eggs"),          # heavy token + 2-gram repetition
    (2, "x y\nx y\nz"),                  # duplicate lines
    (3, "one"),                          # single token: no 2-grams
    (4, ""),                             # empty text
]


def _expected(text):
    toks = tokenize_py(text)
    lines = text.split("\n")
    dup_line = 0.0 if not lines else 1.0 - len(set(lines)) / len(lines)
    if toks:
        top = max(toks.count(t) for t in set(toks)) / len(toks)
    else:
        top = 0.0
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    dup_gram = 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)
    return round(dup_line, 6), round(top, 6), round(dup_gram, 6)


def test_repetition_features_hand_cases(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["top_token_share"], r["dup_2gram_frac"])
        for r in repetition_features(df).collect()
    }
    for d, text in DOCS:
        exp = _expected(text)
        assert got[d] == pytest.approx(exp, abs=1e-9), (d, text, got[d], exp)
    # spot semantics: doc 1 = 3/4 top share, 2-grams [spam spam, spam spam,
    # spam eggs] -> 1 - 2/3
    assert got[1][1] == pytest.approx(0.75)
    assert got[1][2] == pytest.approx(round(1 - 2 / 3, 6))
    # doc 2: 3 lines, 2 distinct
    assert got[2][0] == pytest.approx(round(1 - 2 / 3, 6))
