"""Ingest-time inference processors: text → dense embedding / sparse token
weights as new document columns.

Reference parity: ``processor/TextEmbeddingProcessor.java:25-58`` and
``processor/SparseEncodingProcessor.java`` — both extend
``processor/InferenceProcessor.java``, whose ``batchExecute`` path
(``InferenceProcessor.java:154-242``) collects the documents of an ingest
batch into ONE ``inferenceList`` and makes a single model call per batch.
That is exactly the shape of an Arrow-batched pandas UDF: Spark hands the
UDF a whole column batch, the "model" consumes the batch, one output column
comes back. The registry's deterministic stand-ins
(``query/models.py``) take the place of the MLCommons RPC; a real model
would slot into the same batch interface (list[str] in, vectors out).

Scale: this is the canonical 100 TB embedding-generation job — a single
narrow mapInPandas-style projection, no shuffle, pipelined with the scan;
partition count alone controls parallelism. The per-token hashing inside
the stand-in is the stand-in's "model FLOPs", not dataflow overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, MapType, StringType

from neural_search_spark.query.models import ModelRegistry


def embed_text(
    df: DataFrame,
    registry: ModelRegistry,
    model_id: str,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """TextEmbeddingProcessor analog: adds ``out_col: array<double>``.

    float64 end-to-end so the ingest-time vector is bit-identical to the
    query-time encoding of the same text (``QueryEngine(models=…)``) and to
    the DuckDB oracle mirror — a float32 cast would be the knn_vector
    field's storage concern, applied at write time if wanted.
    """
    enc = registry._get(model_id, "dense")

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(texts):
        # one Arrow batch per call == the reference's one inferenceList per
        # batchExecute; enc() here is the model stand-in
        return texts.map(lambda t: enc(t if t is not None else ""))

    return df.withColumn(out_col, _embed(F.col(text_col)))


def embed_text_image(
    df: DataFrame,
    registry: ModelRegistry,
    model_id: str,
    text_col: str = "text",
    image_col: str = "image",
    out_col: str = "embedding",
) -> DataFrame:
    """TextImageEmbeddingProcessor analog: ONE embedding column from a
    (text, image-bytes) pair — the reference builds a single
    ``{inputText, inputImage}`` inference map per doc, either key optional
    (``TextImageEmbeddingProcessor.java:43-44,111-140``), and one
    multimodal model call returns one vector. Null text/image behave as
    the absent key. Same batch-per-call / zero-shuffle shape as
    :func:`embed_text`."""
    enc = registry._get(model_id, "multimodal")

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(texts, images):
        import pandas as pd

        return pd.Series(
            [enc(t, i) for t, i in zip(texts, images)], index=texts.index
        )

    return df.withColumn(out_col, _embed(F.col(text_col), F.col(image_col)))


def embed_sparse(
    df: DataFrame,
    registry: ModelRegistry,
    model_id: str,
    text_col: str = "text",
    out_col: str = "sparse_embedding",
) -> DataFrame:
    """SparseEncodingProcessor analog: adds ``out_col: map<string,double>``
    (the rank_features-shaped token→weight map)."""
    enc = registry._get(model_id, "sparse")

    @F.pandas_udf(MapType(StringType(), DoubleType()))
    def _embed(texts):
        return texts.map(lambda t: enc(t if t is not None else ""))

    return df.withColumn(out_col, _embed(F.col(text_col)))
