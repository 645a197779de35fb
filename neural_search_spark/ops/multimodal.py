"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode/feature kernels themselves are STUBBED (no image/audio libraries
in this container — each stub raises NotImplementedError unless the
deterministic fake is requested), but the Spark-side contract is real and
tested: schemas, batch shapes, partition behavior, and the UDF signatures a
production decode would drop into.

Reference anchor: the reference's text_image_embedding processor accepts an
image as a base64 string field next to text (processor/
TextImageEmbeddingProcessor.java) — i.e. media rides in the document as an
opaque payload, exactly as modeled here.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def real_decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Placeholder for a real decoder (PIL/libav/ffmpeg) — NOT available in
    this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; use deterministic_fake_features or plug a decoder in"
    )


def deterministic_fake_features(payload: bytes, mime: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature extractor: bytes → fixed-dim float32
    vector via a rolling byte histogram. Lets the full pipeline (schema,
    partitioning, batching, downstream similarity search) run and be tested
    end-to-end without media libraries."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def extract_features(
    media: DataFrame,
    kernel: Callable[[bytes, str], np.ndarray] = real_decode_stub,
    batch_kind: str | None = None,
) -> DataFrame:
    """media table → (media_id, feature). The kernel runs inside Arrow
    batches (mapInPandas); filtering by kind happens BEFORE the Python
    boundary so pruned rows never cross into Python."""
    if batch_kind is not None:
        media = media.where(F.col("kind") == batch_kind)
    media = media.select("media_id", "mime", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            feats = [
                kernel(p if p is not None else b"", m or "")
                for p, m in zip(batch["payload"], batch["mime"])
            ]
            yield pd.DataFrame(
                {"media_id": batch["media_id"], "feature": [f.tolist() for f in feats]}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload = repeatable bytes
    derived from the row id."""
    df = spark.range(0, n)
    i = F.col("id")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    payload = F.sha2(F.concat(F.lit(str(seed)), i.cast("string")), 256).cast("binary")
    return df.select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x/"), kind).alias("mime"),
        payload.alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (i * 100).cast("int").alias("duration_ms"),
    )
