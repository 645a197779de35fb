"""Chunker parity tests against faithful pure-Python ports of the reference
loops (processor/chunker/DelimiterChunker.java:53-77,
FixedTokenLengthChunker.java:120-157, Chunker.java:43-48), plus the word
tokenizer registry."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import WORD_TOKENIZERS, tokenize_col, tokenize_py
from neural_search_spark.ops.chunking import (
    DISABLED_MAX_CHUNK_LIMIT,
    chunk_delimiter,
    chunk_fixed_token_length,
    get_chunker,
)


# -- faithful ports of the reference chunk() loops ---------------------------


def _check_limit(result_size: int, limit: int, chunk_string_count: int = 1) -> bool:
    # Chunker.checkRunTimeMaxChunkLimit (Chunker.java:43-48)
    return limit != -1 and result_size + chunk_string_count >= limit


def delimiter_chunk_ref(content: str, delimiter: str, max_chunk_limit: int = -1) -> list[str]:
    # DelimiterChunker.chunk (DelimiterChunker.java:53-77), verbatim logic
    out: list[str] = []
    start = 0
    pos = content.find(delimiter)
    while pos != -1:
        if _check_limit(len(out), max_chunk_limit):
            break
        end = pos + len(delimiter)
        out.append(content[start:end])
        start = end
        pos = content.find(delimiter, start)
    if start < len(content):
        out.append(content[start:])
    return out


def fixed_chunk_ref(
    tokens: list[str], token_limit: int, overlap_rate: float, max_chunk_limit: int = -1
) -> list[list[str]]:
    # FixedTokenLengthChunker.chunk (FixedTokenLengthChunker.java:120-157)
    # expressed over the token sequence (our documented divergence: chunk
    # text re-joins tokens instead of slicing original-string offsets)
    out: list[list[str]] = []
    start = 0
    overlap = int(token_limit * overlap_rate)
    while start < len(tokens):
        if _check_limit(len(out), max_chunk_limit):
            out.append(tokens[start:])
            break
        if start + token_limit >= len(tokens):
            out.append(tokens[start:])
            break
        out.append(tokens[start : start + token_limit])
        start += token_limit - overlap
    return out


# -- delimiter chunker -------------------------------------------------------

DELIM_CASES = [
    "a|b|c",
    "a||b",          # consecutive delimiters → delimiter-only chunk
    "|leading",
    "trailing|",
    "||",
    "",
    "no delimiter here",
    "a|b|c|d|e|f|g",
    "|",
]


@pytest.mark.parametrize("limit", [-1, 1, 2, 3, 100])
def test_delimiter_matches_reference_port(spark, limit):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DELIM_CASES)], "doc_id long, text string"
    )
    got = chunk_delimiter(df, delimiter="|", max_chunk_limit=limit).collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i, text in enumerate(DELIM_CASES):
        exp = delimiter_chunk_ref(text, "|", limit)
        chunks = [c for _, c in sorted(by_doc.get(i, []))]
        assert chunks == exp, f"text={text!r} limit={limit}"
        # reconstruction invariant: concatenated chunks == original content
        # (modulo a dropped trailing-empty remainder)
        assert "".join(chunks) == text


@given(
    st.lists(st.sampled_from(["a", "bb", "", "c c"]), max_size=8),
    st.sampled_from([-1, 1, 2, 3]),
)
@settings(max_examples=25, deadline=None)
def test_delimiter_port_invariants(parts, limit):
    content = "~~".join(parts)
    chunks = delimiter_chunk_ref(content, "~~", limit)
    assert "".join(chunks) == content
    if limit != -1:
        assert len(chunks) <= limit
    assert all(c for c in chunks)


def test_delimiter_spark_matches_port_random(spark):
    import random

    rng = random.Random(42)
    texts = [
        "~~".join(rng.choice(["x", "yy", "", "z z", "w"]) for _ in range(rng.randint(0, 9)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for limit in (-1, 2, 4):
        got = chunk_delimiter(df, delimiter="~~", max_chunk_limit=limit).collect()
        by_doc: dict[int, list[tuple[int, str]]] = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
        for i, t in enumerate(texts):
            assert [c for _, c in sorted(by_doc.get(i, []))] == delimiter_chunk_ref(t, "~~", limit)


# -- fixed token length chunker ----------------------------------------------


@pytest.mark.parametrize("limit,overlap", [(-1, 0.0), (-1, 0.25), (2, 0.0), (3, 0.25), (1, 0.0)])
def test_fixed_matches_reference_port(spark, limit, overlap):
    texts = [
        "one two three four five six seven eight nine ten eleven twelve",
        "a b",
        "",
        "single",
        " ".join(f"t{i}" for i in range(37)),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = chunk_fixed_token_length(
        df, token_limit=4, overlap_rate=overlap, max_chunk_limit=limit
    ).collect()
    by_doc: dict[int, list[tuple[int, str, int]]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]))
    for i, t in enumerate(texts):
        exp = fixed_chunk_ref(tokenize_py(t), 4, overlap, limit)
        rows = sorted(by_doc.get(i, []))
        assert [c for _, c, _ in rows] == [" ".join(e) for e in exp], (t, limit, overlap)
        assert [n for _, _, n in rows] == [len(e) for e in exp]


def test_chunker_validation_and_registry(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap_rate"):
        chunk_fixed_token_length(df, overlap_rate=0.6)
    with pytest.raises(ValueError, match="token_limit"):
        chunk_fixed_token_length(df, token_limit=0)
    with pytest.raises(ValueError, match="max_chunk_limit"):
        chunk_fixed_token_length(df, max_chunk_limit=0)
    with pytest.raises(ValueError, match="delimiter"):
        chunk_delimiter(df, delimiter="")
    with pytest.raises(ValueError, match="not supported"):
        get_chunker("wat")
    assert get_chunker("fixed_token_length") is chunk_fixed_token_length
    assert get_chunker("delimiter") is chunk_delimiter
    assert DISABLED_MAX_CHUNK_LIMIT == -1


# -- word tokenizer registry -------------------------------------------------


def test_word_tokenizers_col_matches_py(spark):
    texts = [
        "Hello World FOO-bar 123",
        "tabs\tand\nnewlines  spaces",
        "MixedCase letters only",
        "",
        "ünïcödé stays whole?",
        "mail John.Doe+spam@example.co.uk or see https://spark.apache.org/docs?q=1#f",
        "edge@case@double http://x.y a_b-c@d.ee trailing@",
        "see (https://spark.apache.org/docs). or www.example.com, then http://",
        "fetch ftp://mirror.example.org/pub/file.tar.gz today",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    import duckdb

    from neural_search_spark.analysis.tokenizer import duckdb_tokenize

    con = duckdb.connect()
    for name in WORD_TOKENIZERS:
        got = {
            r["doc_id"]: r["toks"]
            for r in df.select("doc_id", tokenize_col("text", name).alias("toks")).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == tokenize_py(t, name), (name, t)
            # three-way parity: Spark (java regex) == Python re == DuckDB RE2
            dd = con.execute(f"select {duckdb_tokenize('?', name)}", [t]).fetchone()[0]
            assert got[i] == dd, (name, t)
    # URLs and emails survive as single tokens under uax_url_email
    uax = tokenize_py(texts[5], "uax_url_email")
    assert "john.doe+spam@example.co.uk" in uax
    assert "https://spark.apache.org/docs?q=1#f" in uax
    assert tokenize_py(texts[5], "standard") != uax
    # trailing sentence punctuation is trimmed off the URL token; scheme-less
    # www. URLs are kept whole; a bare scheme falls through to word tokens
    uax7 = tokenize_py(texts[7], "uax_url_email")
    assert "https://spark.apache.org/docs" in uax7
    assert "www.example.com" in uax7
    assert not any(t.endswith((")", ".", ",")) for t in uax7)
    # ftp URLs survive whole too (UAX29URLEmailTokenizer recognizes ftp)
    assert "ftp://mirror.example.org/pub/file.tar.gz" in tokenize_py(texts[8], "uax_url_email")
    with pytest.raises(ValueError, match="not supported"):
        tokenize_col("text", "thai").alias("x")
