"""Early termination on index sort, parquet-native: a key-range predicate
over a sort-clustered layout reads only the overlapping row groups
(min/max statistics), while the same predicate over a random layout reads
the whole table. This is the storage analog of
HybridTopFieldDocSortCollector's CollectionTerminatedException
(search/collector/HybridTopFieldDocSortCollector.java:225-242) — the
reader stops consuming input once the sort order proves nothing more can
match — realized through public parquet row-group skipping (the Iceberg
`sort.order` file-skipping path in sources/transcripts.py's DDL behaves
the same at the manifest level)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.data import synthesize_transcripts
from neural_search_spark.sources.transcripts import (
    read_transcripts,
    scan_output_rows,
    write_transcripts_sorted,
)


def test_sorted_scan_skips_row_groups(spark, tmp_path):
    n_rows = 20_000
    tr = synthesize_transcripts(spark, n_rows // 10, 10)
    sorted_p, unsorted_p = str(tmp_path / "sorted"), str(tmp_path / "unsorted")
    # small row groups so each file holds many (the skipping unit)
    write_transcripts_sorted(tr, sorted_p, partitions=4, row_group_bytes=64 * 1024)
    tr.orderBy(F.rand(7)).repartition(4).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(unsorted_p)

    lo, hi = "conv00000100", "conv00000199"  # 100 of 2000 convs = 5%
    pred = (F.col("conv_id") >= lo) & (F.col("conv_id") <= hi)

    got_s, scanned_s = scan_output_rows(read_transcripts(spark, sorted_p).where(pred))
    got_u, scanned_u = scan_output_rows(read_transcripts(spark, unsorted_p).where(pred))

    assert got_s == got_u == 1000  # identical results either way
    # random layout: every row group overlaps the range → full read
    assert scanned_u == n_rows
    # sorted layout: only overlapping row groups are read
    assert scanned_s < 0.3 * n_rows, f"sorted scan read {scanned_s}/{n_rows} rows"
    assert scanned_s >= got_s

    # and the predicate actually reached the scan (pushdown precondition)
    plan = read_transcripts(spark, sorted_p).where(pred)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "conv_id" in plan.split("PushedFilters")[1][:200]
