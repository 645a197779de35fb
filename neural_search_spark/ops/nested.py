"""Nested-document processing: dot-path access/removal and conversation
grouping — the engine analog of the reference's nested map/list handling
(util/ProcessorDocumentUtils.java:1-181 validateMapTypeValue walks nested
maps and lists; processor/InferenceProcessor.java:317-347 buildNestedMap
reconstructs nested structures; processor/util/ProcessorUtils.java
getValueFromSource / removeTargetFieldFromSource resolve `a.b.c` paths).

Spark-first: nested documents are StructType / ArrayType(StructType)
columns; dot paths map to Column access (`col("a.b.c")`), removal to
`dropFields`, and list-of-objects processing to explode → flat transform →
(optionally) re-group. Everything is codegen'd column work — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def get_path(df: DataFrame, path: str) -> Column:
    """Resolve a dot path (`a.b.c`) against nested struct columns — the
    getValueFromSource analog. Raises AnalysisException lazily via Spark if
    the path does not exist."""
    return F.col(path)


def drop_path(df: DataFrame, path: str) -> DataFrame:
    """Remove a nested field by dot path (removeTargetFieldFromSource
    analog): `a.b.c` drops field c inside struct a.b, keeping siblings."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.drop(parts[0])
    root, rest = parts[0], ".".join(parts[1:])
    return df.withColumn(root, F.col(root).dropFields(rest))


def with_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set/replace a nested field by dot path (the buildNestedMap write-back
    analog, InferenceProcessor.java:317-347)."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.withColumn(parts[0], value)
    root, rest = parts[0], ".".join(parts[1:])
    return df.withColumn(root, F.col(root).withField(rest, value))


def group_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    child_cols: list[str] | None = None,
    turns_col: str = "turns",
) -> DataFrame:
    """Flat turn rows → one row per conversation with an
    ArrayType(StructType) `turns` column, children sorted by `order_col`
    (the list-of-objects document shape the reference's processors walk).
    sort_array on the collected structs gives deterministic child order
    with ONE shuffle (order_col must lead the struct)."""
    child_cols = child_cols or [c for c in df.columns if c != conv_col]
    if child_cols[0] != order_col:
        child_cols = [order_col] + [c for c in child_cols if c != order_col]
    struct = F.struct(*[F.col(c) for c in child_cols])
    return df.groupBy(conv_col).agg(F.sort_array(F.collect_list(struct)).alias(turns_col))


def explode_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turns_col: str = "turns",
) -> DataFrame:
    """Inverse of group_conversations: nested conversations → flat turn
    rows, child struct fields promoted to top-level columns."""
    ex = df.select(F.col(conv_col), F.explode(F.col(turns_col)).alias("_t"))
    child = ex.select(conv_col, "_t.*")
    return child
