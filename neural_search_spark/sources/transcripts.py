"""Transcripts source adapter: Iceberg first, parquet fallback.

The north rule's input is an Iceberg table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` at 10^12 turns.
This container ships no Iceberg runtime jar, so the adapter probes for the
catalog classes and falls back to parquet transparently — the rest of the
engine is storage-agnostic (it consumes a DataFrame).

PERMANENTLY CONTAINER-BOUND (verified round 4): the sandbox has no network
(Maven Central does not resolve) and no Iceberg jar anywhere on disk, so
the `iceberg` branch below cannot execute here by construction. It is the
standard `spark.read.format("iceberg").load(name)` call — on any cluster
with `iceberg-spark-runtime` on the classpath it runs unmodified, and the
partition-pruning claims follow from the DDL below (days/bucket transforms
prune at the manifest level; this is Iceberg's documented behavior, not
custom code).

Production Iceberg DDL this engine assumes (for partition/file pruning and
the early-termination-on-index-sort analog, SURVEY.md §2.6)::

    CREATE TABLE transcripts (
        conv_id string, turn_idx int, role string,
        text string, tool string, ts timestamp)
    USING iceberg
    PARTITIONED BY (days(ts), bucket(1024, conv_id))
    TBLPROPERTIES ('write.distribution-mode' = 'hash',
                   'sort.order' = 'conv_id, turn_idx')

- `days(ts)` partitioning → time-range predicates prune whole partitions;
- `bucket(conv_id)` → docID range-partitioning reads co-located buckets and
  the per-conversation fetch is a single-bucket scan;
- file sort order `(conv_id, turn_idx)` → min/max file skipping makes the
  docID-assignment range shuffle near-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, source: str, fmt: str = "auto") -> DataFrame:
    """Load the transcripts table from an Iceberg table name or a parquet
    path. `fmt='auto'` uses Iceberg when the runtime is on the classpath and
    the source looks like a catalog table name (no '/'), else parquet."""
    if fmt == "auto":
        fmt = "iceberg" if ("/" not in source and iceberg_available(spark)) else "parquet"
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(source)
    else:
        df = spark.read.parquet(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"transcripts source missing columns: {missing}")
    return df.select(*TRANSCRIPT_COLUMNS)
