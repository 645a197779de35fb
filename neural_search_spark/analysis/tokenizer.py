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


def tokenize_col(col: Column | str) -> Column:
    """text column -> array<string> of tokens (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python mirror of tokenize_col, for test oracles only."""
    return _PY_RE.findall(text.lower())


def tokenizer_hash() -> str:
    """Fingerprint of the analyzer definition, recorded in index manifests so
    checkpoint-resume refuses to mix segments built with different analyzers."""
    return hashlib.sha256(f"lower+{TOKEN_PATTERN}+v1".encode()).hexdigest()[:16]
