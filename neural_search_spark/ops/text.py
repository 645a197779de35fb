"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Everything here is a pure Column expression (whole-stage codegen, no Python),
and every construct has an exact DuckDB-SQL equivalent so the driver's
oracle check covers it. Engine-agnostic hashing uses the top 60 bits of
md5 (`hash60`) — identical in Spark, DuckDB, and Python, unlike
xxhash64/`hash()` which differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col

# Fixed stopword profiles for the n-gram/stopword language-ID heuristic and
# the quality score. Deterministic, engine-agnostic.
STOPWORDS_EN = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]
LANG_PROFILES: dict[str, list[str]] = {
    "en": STOPWORDS_EN,
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "de": ["der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — portable across Spark
    (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    (`('0x'||substr(md5(x),1,15))::BIGINT`)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens) — whitespace/regex token count, no explode (array
    length only; the scan reads just the two referenced columns)."""
    return df.select(
        F.col(id_col),
        F.size(tokenize_col(text_col)).alias("n_tokens"),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, pure columns (JVM codegen, no
    shuffle, DuckDB-mirrorable):

    - dup_line_frac:  1 − distinct lines / lines ("\\n"-split)
    - top_token_share: occurrences of the most frequent token / tokens
    - dup_2gram_frac: 1 − distinct word 2-grams / 2-grams

    The Gopher filter drops docs with dup_line_frac > 0.3 or high top
    n-gram shares; thresholds stay with the caller. The per-doc token
    count-of-counts is O(distinct·tokens) inside one row — fine for
    document-sized rows, and no cross-row state anywhere."""
    toks = tokenize_col(text_col)
    n = F.size(toks)
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    counts = F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda t: t == d)),
    )
    top_share = F.when(
        n > 0, F.array_max(counts) / n.cast("double")
    ).otherwise(F.lit(0.0))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_grams = F.size(grams)
    dup_gram = F.when(
        n_grams > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(dup_line, 6).alias("dup_line_frac"),
        F.round(top_share, 6).alias("top_token_share"),
        F.round(dup_gram, 6).alias("dup_2gram_frac"),
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: length, alpha ratio, stopword ratio, distinct
    ratio, and a composite quality score. Mirrors the heuristics a
    training-data filter (C4/Gopher-style) applies, expressed as columns."""
    toks = tokenize_col(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_distinct = F.size(F.array_distinct(toks))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_toks > 0, n_distinct / n_toks).otherwise(F.lit(0.0))
    quality = F.round(
        F.lit(0.4) * F.least(n_toks / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * distinct_ratio
        + F.lit(0.1) * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )
    return df.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        n_chars.alias("len_chars"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: count profile-word hits per language,
    argmax with deterministic tie-break on language code asc; 'und' when no
    profile matches at all."""
    toks = tokenize_col(text_col)

    def contains(arr):
        # single-arg lambda: a two-arg lambda would be treated by Spark as
        # the (element, index) variant
        return lambda t: F.array_contains(arr, t)

    hits = {}
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, contains(arr)))
    # argmax via a sorted struct array: (-hits, lang) asc → first
    entries = F.array(
        *[F.struct((-hits[lang]).alias("neg"), F.lit(lang).alias("lang")) for lang in sorted(LANG_PROFILES)]
    )
    best = F.array_min(entries)
    return df.select(
        F.col(id_col),
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        (-best["neg"]).alias("profile_hits"),
    )


def content_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Identical token sets → identical fingerprint regardless of
    word order (the cheap 'same bag of words' dedup key)."""
    toks = tokenize_col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
    )
