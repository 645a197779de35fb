"""Lucene-parity document-length quantization (optional scoring mode).

Lucene's BM25Similarity does not score with the exact document length: at
index time the length is compressed to one byte with SmallFloat.intToByte4
and scoring uses the decoded value. Our default mode keeps the exact dl
(documented divergence, SURVEY.md §2.8); this module supplies the quantized
mode for rank-identity against a real Lucene/OpenSearch BM25.

The scheme, from the public SmallFloat format: intToByte4 reserves
NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24 low codes for
exact small values, so

    encode(n) = n                              for n < 24
    encode(n) = 24 + int4(n - 24)              otherwise

where int4 is a 4-significant-bit float-like truncation (values < 8 exact,
larger values keep the top 4 bits: (m >> s) << s with s = bit_length(m) - 4).
The decoded value scoring sees is therefore

    decode(n) = n                              for n < 24
    decode(n) = 24 + trunc4(n - 24)            otherwise

e.g. dl=17 → 17 (exact, < 24), dl=25 → 25 (25-24=1 < 8 exact), dl=45 →
24 + trunc4(21) = 24 + 20 = 44, dl=100 → 24 + trunc4(76) = 24 + 72 = 96.
Encoding is monotonic, so ranks are preserved within each quantization
bucket exactly as in Lucene.

py + np + Column variants are kept in exact agreement (tested against a
pure-Python port of intToByte4/byte4ToInt), so the pytest oracle and the
engine quantize identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# SmallFloat.intToByte4 reserves this many exact low codes (255 - MAX_INT4).
NUM_FREE_VALUES = 24


def _trunc4_py(m: int) -> int:
    """Keep the 4 most significant bits of m (values < 8 exact) — the
    decoded form of SmallFloat longToInt4/int4ToLong."""
    if m < 8:
        return m
    shift = int(m).bit_length() - 4
    return (m >> shift) << shift


def int4_quantize_py(n: int) -> int:
    """Decoded value of SmallFloat.byte4ToInt(intToByte4(n)) — what Lucene's
    BM25 actually scores with for a document length n."""
    if n < NUM_FREE_VALUES:
        return n
    return NUM_FREE_VALUES + _trunc4_py(n - NUM_FREE_VALUES)


def int4_quantize_np(n: np.ndarray) -> np.ndarray:
    n = np.ascontiguousarray(n, dtype=np.int64)
    out = n.copy()
    big = n >= NUM_FREE_VALUES
    if big.any():
        m = n[big] - NUM_FREE_VALUES
        t = m.copy()
        huge = m >= 8
        if huge.any():
            v = m[huge]
            # bit_length via log2 on positive ints (exact for int64 < 2^53
            # via float64; doc lengths are far below that)
            bits = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
            shift = bits - 4
            t[huge] = (v >> shift) << shift
        out[big] = NUM_FREE_VALUES + t
    return out


def int4_quantize_col(c: Column) -> Column:
    """Column version: identical result to int4_quantize_py. bit_length =
    floor(log2(m)) + 1 (m ≥ 8 → log2 exact enough in double for any real
    document length)."""
    m = (c.cast("long") - F.lit(NUM_FREE_VALUES)).cast("double")
    bits = F.floor(F.log2(m)).cast("int") + F.lit(1)
    shift = (bits - F.lit(4)).cast("double")
    # m >> s << s as floor(m / 2^s) * 2^s — pyspark's shiftright only takes a
    # literal shift; 2^s is exact in double for any real document length
    p = F.pow(F.lit(2.0), shift)
    trunc = (F.floor(m / p) * p).cast("long")
    return (
        F.when(c < NUM_FREE_VALUES, c.cast("long"))
        .when(m < 8, c.cast("long"))
        .otherwise(F.lit(NUM_FREE_VALUES) + trunc)
    )
