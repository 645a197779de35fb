"""Lucene-parity document-length quantization (optional scoring mode).

Lucene's BM25Similarity does not score with the exact document length: at
index time the length is compressed to one byte with SmallFloat.intToByte4
(4-bit mantissa floating point), and scoring uses the decoded value. Our
default mode keeps the exact dl (documented divergence, SURVEY.md §2.8);
this module supplies the quantized mode for rank-identity against a real
Lucene/OpenSearch BM25 — the scheme is implemented from the public format
description (values < 8 exact; larger values keep a 3-bit mantissa plus a
leading implicit bit, i.e. relative error ≤ 1/8; encoding is monotonic).

py + Column variants are kept in exact agreement (tested), so the pytest
oracle and the engine quantize identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def int4_quantize_py(n: int) -> int:
    """Round n down to the nearest value representable with a 3-bit mantissa
    + implicit leading bit (the decoded form of SmallFloat int4 encoding).
    Values < 8 are exact."""
    if n < 8:
        return n
    bits = int(n).bit_length()
    shift = bits - 4
    return (n >> shift) << shift


def int4_quantize_np(n: np.ndarray) -> np.ndarray:
    n = np.ascontiguousarray(n, dtype=np.int64)
    out = n.copy()
    big = n >= 8
    if big.any():
        v = n[big]
        # bit_length via log2 on positive ints (exact for int64 < 2^53 via
        # float64; doc lengths are far below that)
        bits = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
        shift = bits - 4
        out[big] = (v >> shift) << shift
    return out


def int4_quantize_col(c: Column) -> Column:
    """Column version: identical result to int4_quantize_py. bit_length =
    floor(log2(n)) + 1 (n ≥ 8 → log2 exact enough in double for any real
    document length)."""
    bits = F.floor(F.log2(c.cast("double"))).cast("int") + F.lit(1)
    shift = (bits - F.lit(4)).cast("double")
    # n >> s << s as floor(n / 2^s) * 2^s — pyspark's shiftright only takes a
    # literal shift; 2^s is exact in double for any real document length
    p = F.pow(F.lit(2.0), shift)
    quant = (F.floor(c.cast("double") / p) * p).cast("long")
    return F.when(c < 8, c.cast("long")).otherwise(quant)
