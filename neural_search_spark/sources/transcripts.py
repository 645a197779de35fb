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


def write_transcripts_sorted(
    df: DataFrame,
    path: str,
    partitions: int = 32,
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    row_group_bytes: int | None = None,
) -> None:
    """Write the transcripts table range-partitioned + sorted within files
    on `sort_cols` — the parquet-native realization of the Iceberg
    `sort.order` in the DDL above, and the storage half of the
    early-termination-on-index-sort operator (SURVEY.md §2.6,
    HybridTopFieldDocSortCollector.java:225-242): with files sorted on the
    key, parquet row-group min/max statistics make a key-range scan skip
    every non-overlapping row group, so the reader terminates after
    touching only the matching key range (measured in
    tests/test_sources_sorted.py: a 5% key-range predicate reads ~7% of
    rows from the sorted layout vs 100% from an unsorted one)."""
    w = (
        df.repartitionByRange(partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write
    )
    if row_group_bytes is not None:
        w = w.option("parquet.block.size", row_group_bytes)
    w.parquet(path)


def scan_output_rows(df: DataFrame) -> tuple[int, int]:
    """Execute `df` and return (result_rows, scan_output_rows) where the
    second number is the file-scan's numOutputRows SQL metric — the rows
    the parquet reader actually emitted after row-group/page skipping.
    scan_output_rows ≈ result_rows on a sort-clustered layout;
    scan_output_rows ≈ table_rows when storage order is random. Test/audit
    helper (runs one collect)."""
    rows = df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scanned = 0
    for i in range(leaves.length()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            scanned += m.apply("numOutputRows").value()
    return len(rows), scanned


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
