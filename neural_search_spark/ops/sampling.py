"""Deterministic corpus-curation ops for training-data pipelines:
hash sampling, stratified quotas, and contiguous sequence packing.

A 100 TB training mix is assembled by SAMPLING (per-source rates),
BALANCING (per-language / per-domain quotas) and PACKING (documents into
fixed token budgets for the trainer). All three must be deterministic —
re-running the pipeline on the same snapshot must emit the same bytes —
so nothing here uses `rand()`: selection is a pure function of the row
key via `hash60` (md5-based, reproducible in any engine — the DuckDB
oracles run the identical expression).

Scale shape: `hash_sample` is a stateless filter (no shuffle, fully
pushdown-friendly); `stratified_sample` is one window per group —
a single shuffle on the group key, skew-safe because quotas cap each
group's output; `pack_sequences` is one window prefix-sum over the
pack-ordering key. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_search_spark.ops.text import hash60

HASH_SPACE = 1 << 60


def _keyed_hash(key_col: str, seed: str) -> F.Column:
    # seed concatenated into the digest input → independent samples per seed
    return hash60(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Keep ~`rate` of rows, deterministically: a row survives iff
    hash60(key#seed) < rate·2⁶⁰. Same snapshot + seed → same sample;
    different seeds → independent samples. A stateless filter — at any
    scale this is a scan with one string-hash per row, no exchange."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    threshold = int(rate * HASH_SPACE)
    return df.where(_keyed_hash(key_col, seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """At most `n_per_group` rows per group, chosen by hash order (the
    deterministic analog of uniform-without-replacement): rank rows within
    each group by (hash60(key#seed), key) and keep rank ≤ n. One shuffle on
    the group key; per-group output is capped so downstream skew is bounded
    even when input groups are wildly skewed."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    h = _keyed_hash(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_srank", F.row_number().over(w))
        .where(F.col("_srank") <= n_per_group)
        .drop("_srank")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a pack/bin id for fixed-token-budget training
    batches: rows are taken in `order_col` order (must uniquely identify
    rows) and row i goes to bin ⌊cum_tokens_before_i / budget⌋.

    Semantics note (documented, deliberate): this is CONTIGUOUS-FILL
    packing — a bin may overflow by at most one document (the straddling
    doc belongs to the bin its prefix starts in). Exact greedy packing
    (reset the accumulator at each boundary) is inherently a sequential
    scan; the floor-of-prefix-sum rule gives deterministic, fully parallel
    assignment with the same ≥(1/2)·OPT utilization bound.

    Scale shape — the keys-first prefix-sum pattern of data/docids.py, NOT
    a global unpartitioned window (which would drag the corpus to one
    partition): only (order_col, token_col) pairs flow through a range
    shuffle; per-partition token totals prefix-sum through a tiny
    broadcast-joined (pid → base) frame; the full rows see ONE hash join
    against the (order_col, pack_id, pack_offset) mapping.

    Adds `pack_id` (long) and `pack_offset` (tokens before this row within
    its bin)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    from pyspark import StorageLevel

    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    keys = df.select(order_col, token_col)
    ranged = (
        keys.repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in ranged.groupBy("_pid").agg(F.sum(token_col).alias("s")).collect()
        }
        bases, acc = {}, 0
        for pid in sorted(sums):
            bases[pid] = acc
            acc += int(sums[pid] or 0)
        base_df = spark.createDataFrame(
            [(int(p), int(bases[p])) for p in sorted(sums)], "_pid int, _tbase long"
        )
        w = Window.partitionBy("_pid").orderBy(F.col(order_col).asc())
        local_before = F.coalesce(
            F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        cum_before = (F.col("_tbase") + local_before).cast("long")
        mapping = (
            ranged.join(F.broadcast(base_df), "_pid")
            .select(
                order_col,
                (cum_before / F.lit(budget)).cast("long").alias("pack_id"),
                (cum_before % F.lit(budget)).cast("long").alias("pack_offset"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        ranged.unpersist()
    # mapping as build side — same reasoning as data/docids.py _mapping_join
    return df.join(mapping.hint("shuffle_hash"), order_col)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    target_weights: dict,
    key_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Resample to a TARGET GROUP MIXTURE — the domain-reweighting step of
    a training-data pipeline ("make the corpus 60% en / 30% code / 10%
    math"), deterministic like every sampler here.

    `target_weights` maps group value → desired proportion (normalized
    internally; groups absent from the dict are dropped). The largest
    achievable sample honoring the exact mixture without replacement is
    λ = min_g(n_g / p_g); each group keeps its first ⌊λ·p_g⌋ rows in
    (hash60(key#seed), key) order via stratified_sample's bounded
    per-group window.

    Scale shape: one count-per-group agg (#groups rows to the driver —
    mixtures are human-sized), then ONE group-key shuffle for the ranked
    cut. Deterministic: same snapshot + weights + seed → same rows.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if any(w <= 0 for w in target_weights.values()):
        raise ValueError("target weights must be > 0")
    total_w = float(sum(target_weights.values()))
    props = {g: w / total_w for g, w in target_weights.items()}
    counts = {
        r["g"]: r["n"]
        for r in df.where(F.col(group_col).isin(list(props)))
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = sorted(set(props) - set(counts))
    if missing:
        raise ValueError(f"groups absent from the data: {missing}")
    lam = min(counts[g] / p for g, p in props.items())
    quotas = {g: int(lam * p) for g, p in props.items()}
    h = _keyed_hash(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    quota_col = F.create_map(
        *[F.lit(x) for g, q in sorted(quotas.items()) for x in (g, q)]
    )
    return (
        df.where(F.col(group_col).isin(list(props)))
        .withColumn("_srank", F.row_number().over(w))
        .where(F.col("_srank") <= quota_col[F.col(group_col)])
        .drop("_srank")
    )
