"""Top-k BM25 over compressed posting segments with block-max WAND pruning.

The set-at-a-time analog of the reference's WAND/MAXSCORE machinery
(query/HybridQueryScorer.java:161-171 setMinCompetitiveScore;
query/HybridScoreBlockBoundaryPropagator.java:39-98 block boundaries):
instead of advancing doc-at-a-time iterators past non-competitive blocks, we
*filter the block table* before decoding anything.

Algorithm (provably exact top-k; zone-aligned block-max — the
set-at-a-time analog of BMW's aligned block boundaries):
 1. For each query term t: w_idf(t) = w_q(t)·idf(t); per-block upper bound
    ub(t, blk) = w_idf(t) · max_score_component(blk) (stored at build time,
    rounded UP into float32 so it stays a true upper bound).
 2. Seed θ: decode the `seed_blocks` highest-ub blocks per term, score
    those docs on their seed contributions; θ = k-th best partial score —
    a lower bound of the true k-th best score.
 3. Zone bounds: cut the docID space into fixed zones (`zone_width` ids).
    Any doc in zone z scores ≤ ztot(z) = Σ_t (max ub of t's blocks
    overlapping z) — each doc sits in exactly one block per term. Blocks
    spanning ≥ `wide_cap` zones (rare terms: few blocks, huge docID span)
    are never exploded: they are always decoded and enter every zone's
    bound via the per-term constant gmax.
 4. Prune zones with ztot < θ; decode the wide blocks plus every narrow
    block overlapping a surviving zone. A doc in a surviving zone has ALL
    its blocks in the decode set, so its aggregate is its exact score — no
    rescue phase exists. Docs from pruned zones that leak in via block
    overlap carry (possibly partial) scores < θ and cannot displace the
    true top-k.
 5. Exact score = Σ decoded contributions per doc; top-k, ties by docID
    asc (ScoreCombiner.java:37-50 semantics).

Everything is DataFrame dataflow; decoding is a vectorized Arrow pass
(codec.decode_blocks_batch — one varint sweep per partition, no per-row
Python). The segment scan prunes by `shard` directory (partition column
= hash(term) % N_SHARDS) and pushes the term IN-list into parquet row
groups, so a q-term query touches ≤ q shard directories.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neural_search_spark import B, K1
from neural_search_spark.index.codec import decode_blocks_batch

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("docID", T.LongType(), False),
        T.StructField("part", T.DoubleType(), False),
    ]
)

def _decode_and_score(blocks: DataFrame, avgdl: float, k1: float, b: float) -> DataFrame:
    """blocks: (term, w_idf, n, docids, tfs, dls) → (docID, part) partial
    scores, decoded+scored in one vectorized pass per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            ns = batch["n"].to_numpy(np.int64)
            block_idx, docids, tfs, dls = decode_blocks_batch(
                list(batch["docids"]), list(batch["tfs"]), list(batch["dls"]), ns
            )
            w_idf = batch["w_idf"].to_numpy(np.float64)[block_idx]
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            part = w_idf * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            yield pd.DataFrame({"docID": docids.astype(np.int64), "part": part})

    return blocks.mapInPandas(run, schema=_DECODED_SCHEMA)


def wand_topk(
    segments: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: dict[str, float] | list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    prune: bool = True,
    seed_blocks: int = 32,
    zone_width: int = 1024,
    wide_cap: int = 64,
    no_prune_blocks: int = 512,
    stats_out: dict | None = None,
) -> DataFrame:
    """(rank, docID, score) exact BM25 top-k over the segment table.

    `prune=False` decodes every block of every query term (the correctness
    baseline the pruned path is asserted against). `stats_out`, if given, is
    filled with pruning telemetry: total/surviving block counts and the
    seeded θ.

    Fixed-floor design (the part that dominates at query time): the whole
    plan runs in THREE Spark jobs — (A) one tiny aggregate over the
    persisted block metadata that yields per-term df (Σ n over the term's
    blocks — exact, no term_stats scan), total block count, and the
    wide-block gmax constants in a single collect; (B) the θ-seed
    decode+top-k; (C) the final prune→decode→score→top-k. Shard partition
    values are computed driver-side (segments.shard_of, a pure-Python
    XXH64) — no Spark job. When the query's total block count is ≤
    `no_prune_blocks`, the θ/zone machinery is skipped entirely and the
    blocks are decoded outright (2 jobs) — pruning a handful of blocks
    costs more in job latency than the decode it saves. `term_stats` is
    accepted for API compatibility but never scanned."""
    import time as _time

    spark = segments.sparkSession
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in sorted(set(terms))}
    phases: dict[str, float] = {}
    if stats_out is not None:
        stats_out["phase_sec"] = phases
    q_terms = sorted(terms)

    # explicit scan predicates: a broadcast join does NOT push its keys into
    # the parquet reader, so filter term IN (…) for row-group skipping and —
    # when the table carries the shard partition column — shard IN (…) for
    # directory-level partition pruning (shard = hash(term) % N_SHARDS,
    # computed DRIVER-side via the pure-Python XXH64 mirror so it matches
    # the writer exactly without a Spark job)
    scan_filter = F.col("term").isin(q_terms)
    if "shard" in segments.columns:
        from neural_search_spark.index.segments import shard_of

        shard_vals = sorted({shard_of(t) for t in q_terms})
        scan_filter = scan_filter & F.col("shard").isin(shard_vals)
    segments = segments.where(scan_filter)

    # only the metadata columns are persisted — the compressed payloads are
    # re-read lazily by whichever decode actually runs
    meta_cols = ["term", "salt", "blockID", "first_docID", "last_docID", "n", "max_score_component"]
    qmeta = segments.select(*meta_cols).persist()
    try:
        zlo_c = (F.col("first_docID") / zone_width).cast("long")
        zhi_c = (F.col("last_docID") / zone_width).cast("long")
        wide_c = (zhi_c - zlo_c) >= wide_cap
        _t0 = _time.time()
        # job A: df per term (exact: each posting sits in exactly one block
        # of its term), block counts, and the wide-block max score component
        # — ONE collect replaces the old df-lookup scan, blocks_total count,
        # and gmax collect
        agg_rows = (
            qmeta.groupBy("term")
            .agg(
                F.sum("n").alias("df"),
                F.count("*").alias("nblocks"),
                F.count(F.when(wide_c, F.lit(1))).alias("nwide"),
                F.max(F.when(wide_c, F.col("max_score_component"))).alias("wide_max"),
            )
            .collect()
        )
        phases["plan_agg"] = round(_time.time() - _t0, 3)
        dfs = {r["term"]: int(r["df"]) for r in agg_rows}
        w_idf = {
            t: terms[t] * math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in q_terms
            if t in dfs
        }
        if not w_idf:
            return spark.createDataFrame([], "rank long, docID long, score double")
        n_total = sum(int(r["nblocks"]) for r in agg_rows)
        n_wide = sum(int(r["nwide"]) for r in agg_rows)
        gmax = {
            r["term"]: w_idf[r["term"]] * float(r["wide_max"])
            for r in agg_rows
            if r["wide_max"] is not None
        }
        g_const = sum(gmax.values())

        widf_df = F.broadcast(
            spark.createDataFrame(
                [(t, w) for t, w in sorted(w_idf.items())], "term string, w_idf double"
            )
        )
        qblocks = segments.join(widf_df, "term").withColumn(
            "ub", F.col("w_idf") * F.col("max_score_component")
        )

        if not prune or n_total <= no_prune_blocks:
            scored = _decode_and_score(
                qblocks.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b
            )
            if stats_out is not None:
                stats_out.update(
                    {
                        "theta": 0.0,
                        "blocks_total": n_total,
                        "blocks_surviving": n_total,
                        "blocks_wide": n_wide,
                        "zones_total": 0,
                        "zones_surviving": 0,
                        "blocks_rescued": 0,
                        "rescue_candidates": 0,
                        "pruning_skipped": True,
                    }
                )
            return _ranked(scored.groupBy("docID").agg(F.sum("part").alias("score")), k)
        # seed θ from the `seed_blocks` highest-ub blocks of each term: the
        # k-th best score among their docs lower-bounds the true k-th best,
        # and decoding S·q blocks (~S·q·block_size postings) is noise next
        # to the full scan it saves. One block (the classic seed) puts θ at
        # ~the 92nd percentile of the score distribution — too weak to
        # prune anything; 32 blocks of tf-heavy docs put it near the top.
        w_seed = Window.partitionBy("term").orderBy(F.col("ub").desc(), F.col("blockID").asc())
        seed_set = qblocks.withColumn("_r", F.row_number().over(w_seed)).where(
            F.col("_r") <= seed_blocks
        )
        _t0 = _time.time()
        seed_scores = (
            _decode_and_score(seed_set.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b)
            .groupBy("docID")
            .agg(F.sum("part").alias("score"))
            .orderBy(F.col("score").desc(), F.col("docID").asc())
            .limit(k)
            .collect()
        )
        theta = seed_scores[-1]["score"] if len(seed_scores) >= k else 0.0
        phases["theta_seed"] = round(_time.time() - _t0, 3)

        # --- zone-aligned block-max pruning (set-at-a-time BMW analog) ---
        # The docID space is cut into fixed zones of `zone_width` ids. For
        # every zone, an upper bound of ANY doc's total score inside it:
        #   ztot(z) = Σ_t max-ub of t's blocks overlapping z
        # (a doc's per-term contribution is bounded by the max of the one
        # block that holds it). Zones with ztot < θ cannot contain a top-k
        # doc; every other doc has ALL its blocks inside the decoded set,
        # so scores are exact and NO rescue phase exists. Blocks spanning
        # more than `wide_cap` zones (rare terms — few blocks, wide docID
        # span) are not exploded: they are always decoded, and their
        # per-term max enters every zone's bound as the constant G.
        # default zone_width 1024 ≈ 8 head-term blocks per zone.
        # gmax/g_const were already computed driver-side in job A; qmeta
        # re-derives per-block ub by the broadcast w_idf join (metadata-only
        # rows — the payloads never enter the zone machinery)
        classified = (
            qmeta.join(widf_df, "term")
            .withColumn("ub", F.col("w_idf") * F.col("max_score_component"))
            .withColumn("_zlo", zlo_c)
            .withColumn("_zhi", zhi_c)
            .withColumn("_wide", (F.col("_zhi") - F.col("_zlo")) >= wide_cap)
        )
        wide = classified.where(F.col("_wide"))
        narrow = classified.where(~F.col("_wide"))
        gmax_df = F.broadcast(
            spark.createDataFrame(
                [(t, gmax.get(t, 0.0)) for t in sorted(w_idf)], "term string, gmx double"
            )
        )
        zstats = (
            narrow.select("term", F.explode(F.sequence("_zlo", "_zhi")).alias("zone"), "ub")
            .groupBy("term", "zone")
            .agg(F.max("ub").alias("zmax"))
            .join(gmax_df, "term")
            # Σ_t max(zmax, gmx) = G + Σ_present max(zmax − gmx, 0); terms
            # with no narrow block in the zone contribute exactly gmx via G
            .groupBy("zone")
            .agg(F.sum(F.greatest(F.col("zmax") - F.col("gmx"), F.lit(0.0))).alias("excess"))
        )
        surviving_zones = zstats.where(F.col("excess") + F.lit(g_const) >= F.lit(theta)).select("zone")

        narrow_keep = (
            narrow.select("term", "salt", "blockID", F.explode(F.sequence("_zlo", "_zhi")).alias("zone"))
            .join(surviving_zones, "zone", "left_semi")
            .select("term", "salt", "blockID")
            .distinct()
        )
        keep_keys = narrow_keep.unionByName(wide.select("term", "salt", "blockID"))
        decode_set = qblocks.join(keep_keys, ["term", "salt", "blockID"], "left_semi")

        scored = _decode_and_score(
            decode_set.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b
        )
        total = scored.groupBy("docID").agg(F.sum("part").alias("score"))
        _t0 = _time.time()
        rows = _ranked(total, k).collect()
        phases["prune_decode_score"] = round(_time.time() - _t0, 3)
        if stats_out is not None:
            _t0 = _time.time()
            n_zones = zstats.count()
            n_zones_surv = surviving_zones.count()
            n_decoded = n_wide + narrow_keep.count()
            phases["telemetry_counts"] = round(_time.time() - _t0, 3)
            stats_out.update(
                {
                    "theta": theta,
                    "blocks_total": n_total,
                    "blocks_surviving": n_decoded,
                    "blocks_wide": n_wide,
                    "zones_total": n_zones,
                    "zones_surviving": n_zones_surv,
                    # kept for older callers: the zone design has no rescue
                    "blocks_rescued": 0,
                    "rescue_candidates": 0,
                }
            )
        return spark.createDataFrame(rows, "rank int, docID long, score double")
    finally:
        qmeta.unpersist()


def _ranked(scores: DataFrame, k: int) -> DataFrame:
    top = scores.orderBy(F.col("score").desc(), F.col("docID").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("docID").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "docID", "score")
