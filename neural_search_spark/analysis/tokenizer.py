"""Deterministic "standard-ish" analyzer: lowercase + maximal [a-z0-9]+ runs.

The reference delegates analysis to Lucene's standard tokenizer
(reference: processor/chunker/FixedTokenLengthChunker.java:159-169 uses the
index AnalysisRegistry). We define our own exactly-reproducible analyzer so
the Spark engine, the DuckDB oracle, and the pure-Python test oracle all
tokenize identically:

    tokens(text) = all maximal matches of [a-z0-9]+ over lower(text)

Kept JVM-side (regexp_extract_all inside whole-stage codegen) — no Python in
the hot path. `tokenize_py` exists only for test oracles.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
_PY_RE = re.compile(TOKEN_PATTERN)

# DuckDB-equivalent expression, for oracle SQL construction.
DUCKDB_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9]+')"

# Word-tokenizer registry — the engine analog of the reference's word
# tokenizer choices for fixed-length chunking (FixedTokenLengthChunker.java:
# 44-52: standard/letter/lowercase/whitespace/uax_url_email/classic/thai).
# Each entry is (regex pattern, lowercase-first). All are exactly
# reproducible in DuckDB (regexp_extract_all) for oracle parity — leftmost-
# first alternation semantics agree across java.util.regex, RE2, and Python
# re. `uax_url_email` approximates Lucene's UAX29URLEmailTokenizer on its
# defining observable (URLs and emails survive as single tokens; everything
# else tokenizes like `standard`) — full UAX#29 word-boundary rules need ICU
# and are a DOCUMENTED divergence. The URL branch covers http(s), ftp and
# scheme-less www. forms and trims trailing sentence punctuation
# (.,;:!?)]) so "see https://x.y/z)." tokenizes the URL without the ")."
# — matching Lucene's behavior for URLs adjacent to punctuation. `classic`
# and `thai` need ICU/dictionary analysis and are intentionally not offered
# rather than approximated badly.
WORD_TOKENIZERS: dict[str, tuple[str, bool]] = {
    "standard": ("[a-z0-9]+", True),  # our "standard-ish" default analyzer
    "lowercase": ("[a-z]+", True),  # letter runs, lowercased
    "letter": ("[A-Za-z]+", False),  # letter runs, case preserved
    "whitespace": ("[^ \\t\\n\\r\\f]+", False),  # non-whitespace runs
    "uax_url_email": (
        "(?:https?://|ftp://|www\\.)[^ \\t\\n\\r\\f]*[^ \\t\\n\\r\\f.,;:!?)\\]]"
        "|[a-z0-9][a-z0-9._%+-]*@[a-z0-9.-]+\\.[a-z]{2,}"
        "|[a-z0-9]+",
        True,
    ),
}


def duckdb_tokenize(col_expr: str, tokenizer: str = "standard") -> str:
    """DuckDB SQL expression mirroring tokenize_col for oracle construction."""
    pattern, lower = WORD_TOKENIZERS[tokenizer]
    inner = f"lower({col_expr})" if lower else col_expr
    return f"regexp_extract_all({inner}, '{pattern}')"


def tokenize_col(col: Column | str, tokenizer: str = "standard") -> Column:
    """text column -> array<string> of tokens (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    if tokenizer not in WORD_TOKENIZERS:
        raise ValueError(
            f"tokenizer [{tokenizer}] is not supported; choose from {sorted(WORD_TOKENIZERS)}"
        )
    pattern, lower = WORD_TOKENIZERS[tokenizer]
    if lower:
        c = F.lower(c)
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def tokenize_py(text: str, tokenizer: str = "standard") -> list[str]:
    """Pure-Python mirror of tokenize_col, for test oracles only."""
    pattern, lower = WORD_TOKENIZERS[tokenizer]
    return re.findall(pattern, text.lower() if lower else text)


# ---------------------------------------------------------------------------
# analyzer chain: tokenizer + token filters (stopwords, minimal stemming)
# ---------------------------------------------------------------------------

# Lucene EnglishAnalyzer's default stop set (public, stable since 2.x).
ENGLISH_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

# Minimal plural stemming rule — the EnglishMinimalStemFilter idea
# (strip a trailing plural 's' with guards), re-derived, NOT a port:
#   len(token) >= 4 AND token ends in 's' AND NOT in 'ss'/'us'/'is' → drop
# the final 's'. Deterministic, reproducible in SQL; full Porter/KStem
# morphology is an explicit non-goal (dictionary-bound).
_STEM_GUARD = ("ss", "us", "is")


def _stem_light_py(tok: str) -> str:
    if len(tok) >= 4 and tok.endswith("s") and not tok.endswith(_STEM_GUARD):
        return tok[:-1]
    return tok


def analyze_col(
    col: Column | str,
    tokenizer: str = "standard",
    stopwords: list[str] | None = None,
    stem: bool = False,
) -> Column:
    """Analyzer chain: tokenize → [stop filter] → [minimal plural stem].
    All JVM-side higher-order functions (codegen'd, no Python)."""
    toks = tokenize_col(col, tokenizer)
    if stopwords:
        sw = F.array(*[F.lit(s) for s in sorted(set(stopwords))])
        toks = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    if stem:
        toks = F.transform(
            toks,
            lambda t: F.when(
                (F.length(t) >= 4)
                & t.endswith("s")
                & ~t.endswith("ss")
                & ~t.endswith("us")
                & ~t.endswith("is"),
                t.substr(F.lit(1), F.length(t) - 1),
            ).otherwise(t),
        )
    return toks


def analyze_py(
    text: str,
    tokenizer: str = "standard",
    stopwords: list[str] | None = None,
    stem: bool = False,
) -> list[str]:
    """Pure-Python mirror of analyze_col, for test oracles only."""
    toks = tokenize_py(text, tokenizer)
    if stopwords:
        sw = set(stopwords)
        toks = [t for t in toks if t not in sw]
    if stem:
        toks = [_stem_light_py(t) for t in toks]
    return toks


def duckdb_analyze(
    col_expr: str,
    tokenizer: str = "standard",
    stopwords: list[str] | None = None,
    stem: bool = False,
) -> str:
    """DuckDB SQL expression mirroring analyze_col for oracle construction."""
    expr = duckdb_tokenize(col_expr, tokenizer)
    if stopwords:
        lits = ", ".join(f"'{s}'" for s in sorted(set(stopwords)))
        expr = f"list_filter({expr}, t -> not list_contains([{lits}], t))"
    if stem:
        expr = (
            f"list_transform({expr}, t -> case when length(t) >= 4 "
            f"and t like '%s' and t not like '%ss' and t not like '%us' "
            f"and t not like '%is' then t[1:length(t)-1] else t end)"
        )
    return expr


def tokenizer_hash() -> str:
    """Fingerprint of the analyzer definition, recorded in index manifests so
    checkpoint-resume refuses to mix segments built with different analyzers."""
    return hashlib.sha256(f"lower+{TOKEN_PATTERN}+v1".encode()).hexdigest()[:16]
