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
 5. MAXSCORE essential-term split (Turtle & Flood; the reference's
    doc-at-a-time counterpart is minCompetitiveScore,
    query/HybridQueryScorer.java:161-171): terms whose global upper
    bounds sum to < θ are NON-ESSENTIAL — no doc can reach θ on them
    alone, so candidates come from essential postings only. Non-essential
    (dense head) blocks are decoded but their postings are filtered to
    the candidate docID set INSIDE the kernel (sorted-array searchsorted
    against a broadcast), so head-term postings never cross the Arrow hop
    or the score exchange; when the candidate bound (Σ df of essential
    terms) exceeds `cand_limit`, the filter goes DISTRIBUTED instead:
    candidate zones (a DataFrame, never collected) still prune NE blocks,
    and decoded NE parts are left-semi-joined against the candidate
    docIDs before the score exchange — the kernel-filter win survives any
    candidate count, with no driver-side materialization.
 6. Exact score = Σ decoded contributions per doc; top-k, ties by docID
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

def _decode_and_score(
    blocks: DataFrame, avgdl: float, k1: float, b: float, cand_bc=None
) -> DataFrame:
    """blocks: (term, w_idf, n, docids, tfs, dls) → (docID, part) partial
    scores, decoded+scored in one vectorized pass per Arrow batch.

    `cand_bc` (optional): a Spark broadcast of a SORTED np.int64 array of
    candidate docIDs. Postings of other docs are dropped INSIDE the kernel
    (one vectorized searchsorted per batch) — they never cross the
    Python→JVM Arrow hop nor enter the score exchange. This is the
    MAXSCORE non-essential decode path: the blocks still get swept (varint
    decode is memory-speed), but a dense head term emits only its
    candidate rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand = cand_bc.value if cand_bc is not None else None
        for batch in batches:
            if batch.empty:
                continue
            ns = batch["n"].to_numpy(np.int64)
            block_idx, docids, tfs, dls = decode_blocks_batch(
                list(batch["docids"]), list(batch["tfs"]), list(batch["dls"]), ns
            )
            if cand is not None and len(docids):
                if len(cand) == 0:
                    continue
                pos = np.searchsorted(cand, docids)
                pos[pos == len(cand)] = 0
                mask = cand[pos] == docids
                block_idx, docids = block_idx[mask], docids[mask]
                tfs, dls = tfs[mask], dls[mask]
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
    cand_limit: int = 2_000_000,
    stats_out: dict | None = None,
    plan_cache: dict | None = None,
) -> DataFrame:
    """(rank, docID, score) exact BM25 top-k over the segment table.

    `prune=False` decodes every block of every query term (the correctness
    baseline the pruned path is asserted against). `stats_out`, if given, is
    filled with pruning telemetry: total/surviving block counts and the
    seeded θ.

    Fixed-floor design (the part that dominates at query time): the whole
    plan runs in THREE Spark jobs — (A) one tiny aggregate over the
    persisted block metadata that yields per-term df (Σ n over the term's
    blocks — exact, no term_stats scan), total block count, per-term
    global max (the MAXSCORE UB_t) and the wide-block gmax constants in a
    single collect; (B) the θ-seed decode+top-k; (C) the final
    prune→decode→score→top-k. Shard partition values are computed
    driver-side (segments.shard_of, a pure-Python XXH64) — no Spark job.
    When the query's total block count is ≤ `no_prune_blocks`, the θ/zone
    machinery is skipped entirely and the blocks are decoded outright
    (2 jobs) — pruning a handful of blocks costs more in job latency than
    the decode it saves. When the MAXSCORE split activates (≥1
    non-essential term) a fourth job materializes the candidate docIDs
    for the kernel filter (≤ `cand_limit` int64s to the driver; above
    that the distributed semi-join fallback keeps 3 jobs and never
    collects candidates). `term_stats` is accepted for API compatibility
    but never scanned.

    `plan_cache` (optional, from IndexStore.plan_cache()): a per-term
    snapshot of exactly what job A aggregates ({term: {df, nblocks,
    nwide, wide_max, tmax, …}}, plus the zone_width/wide_cap it was built
    at). When present and parameter-compatible, job A is skipped entirely
    — warm queries drop to 1-2 jobs (the round-5 interactive-latency
    lever). A cache built at different zone parameters is ignored."""
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
        cache_ok = (
            plan_cache is not None
            and plan_cache.get("zone_width") == zone_width
            and plan_cache.get("wide_cap") == wide_cap
        )
        if cache_ok:
            # job A skipped: the session-level per-term aggregate already
            # holds df/nblocks/nwide/wide_max/tmax for every term of the
            # index epoch. Terms absent from the cache have no postings.
            ct = plan_cache["terms"]
            agg_rows = [dict(ct[t], term=t) for t in q_terms if t in ct]
        else:
            # job A: df per term (exact: each posting sits in exactly one
            # block of its term), block counts, and the wide-block max
            # score component — ONE collect replaces the old df-lookup
            # scan, blocks_total count, and gmax collect
            agg_rows = (
                qmeta.groupBy("term")
                .agg(
                    F.sum("n").alias("df"),
                    F.count("*").alias("nblocks"),
                    F.count(F.when(wide_c, F.lit(1))).alias("nwide"),
                    F.max(F.when(wide_c, F.col("max_score_component"))).alias("wide_max"),
                    F.max("max_score_component").alias("tmax"),
                )
                .collect()
            )
        phases["plan_agg"] = round(_time.time() - _t0, 3)
        if stats_out is not None:
            stats_out["plan_cache_hit"] = bool(cache_ok)
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
        # per-term global upper bound UB_t = w_idf·max component over ALL
        # of t's blocks (MAXSCORE term bound; max_score_component is
        # rounded UP into float32 at build time, so UB_t is a true bound)
        ub = {r["term"]: w_idf[r["term"]] * float(r["tmax"]) for r in agg_rows if r["term"] in w_idf}

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

        # --- MAXSCORE essential-term split -------------------------------
        # Sort terms ascending by UB_t and peel off a maximal NON-ESSENTIAL
        # prefix with Σ UB strictly < θ: any doc scoring ≥ θ must carry at
        # least one posting of the remaining ESSENTIAL terms. Candidates
        # therefore come from essential postings only; non-essential
        # (typically dense head) terms contribute scores but never
        # nominate candidates — their postings are filtered to the
        # candidate set inside the decode kernel, so a head term's
        # millions of postings never reach the score exchange. This is
        # the set-at-a-time MAXSCORE of Turtle & Flood; the reference's
        # doc-at-a-time counterpart is the minCompetitiveScore machinery
        # (query/HybridQueryScorer.java:161-171).
        ne_terms: list[str] = []
        cum_ne = 0.0
        if theta > 0.0:
            for t in sorted(w_idf, key=lambda s: (ub[s], s)):
                if len(ne_terms) >= len(w_idf) - 1 or cum_ne + ub[t] >= theta:
                    break
                ne_terms.append(t)
                cum_ne += ub[t]
        ne_set = set(ne_terms)
        e_terms = [t for t in sorted(w_idf) if t not in ne_set]

        # --- zone-aligned block-max pruning (set-at-a-time BMW analog) ---
        # The docID space is cut into fixed zones of `zone_width` ids. For
        # every zone, an upper bound of any CANDIDATE doc's total score:
        #   ztot(z) = Σ_{t∈E} max-ub of t's blocks overlapping z + Σ_{t∈NE} UB_t
        # (a doc's per-term contribution is bounded by the max of the one
        # block that holds it; non-essential terms enter as the constant
        # Σ UB < θ). Zones with ztot < θ cannot contain a top-k doc; every
        # candidate in a surviving zone has ALL its blocks inside the
        # decoded set, so scores are exact and NO rescue phase exists.
        # Blocks spanning more than `wide_cap` zones (rare terms — few
        # blocks, wide docID span) are not exploded: they are always
        # decoded, and their per-term max enters every zone's bound via
        # the constant G. default zone_width 1024 ≈ 8 head-term blocks per
        # zone. gmax/UB were already computed driver-side in job A; qmeta
        # re-derives per-block ub by the broadcast w_idf join
        # (metadata-only rows — payloads never enter the zone machinery)
        classified = (
            qmeta.join(widf_df, "term")
            .withColumn("ub", F.col("w_idf") * F.col("max_score_component"))
            .withColumn("_zlo", zlo_c)
            .withColumn("_zhi", zhi_c)
            .withColumn("_wide", (F.col("_zhi") - F.col("_zlo")) >= wide_cap)
        )
        cls_e = classified.where(F.col("term").isin(e_terms)) if ne_terms else classified
        wide = cls_e.where(F.col("_wide"))
        narrow = cls_e.where(~F.col("_wide"))
        g_const_e = sum(v for t, v in gmax.items() if t not in ne_set)
        gmax_df = F.broadcast(
            spark.createDataFrame(
                [(t, gmax.get(t, 0.0)) for t in e_terms], "term string, gmx double"
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
        surviving_zones = zstats.where(
            F.col("excess") + F.lit(g_const_e + cum_ne) >= F.lit(theta)
        ).select("zone")

        narrow_keep = (
            narrow.select("term", "salt", "blockID", F.explode(F.sequence("_zlo", "_zhi")).alias("zone"))
            .join(surviving_zones, "zone", "left_semi")
            .select("term", "salt", "blockID")
            .distinct()
        )
        keep_keys = narrow_keep.unionByName(wide.select("term", "salt", "blockID"))
        decode_set = qblocks.join(keep_keys, ["term", "salt", "blockID"], "left_semi")

        e_parts = _decode_and_score(
            decode_set.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b
        )
        cand_mode = None
        n_cand = 0
        ne_keys_df = None
        cand_bc = None
        if not ne_terms:
            total = e_parts.groupBy("docID").agg(F.sum("part").alias("score"))
            _t0 = _time.time()
            rows = _ranked(total, k).collect()
            phases["prune_decode_score"] = round(_time.time() - _t0, 3)
        else:
            ne_cls = classified.where(F.col("term").isin(ne_terms))
            e_parts = e_parts.persist()
            _t0 = _time.time()
            # Σ df over essential terms bounds the candidate count without
            # a Spark job; only below `cand_limit` do candidate docIDs come
            # to the driver (≤ cand_limit int64s) for the kernel filter
            cand_bound = sum(dfs[t] for t in e_terms)
            try:
                if cand_bound <= cand_limit:
                    cand_mode = "kernel"
                    cand_ids = np.unique(
                        e_parts.select("docID").toPandas()["docID"].to_numpy(np.int64)
                    )
                    n_cand = int(len(cand_ids))
                    cand_bc = spark.sparkContext.broadcast(cand_ids)
                    phases["cand_collect"] = round(_time.time() - _t0, 3)
                    # narrow NE blocks overlapping no candidate zone are
                    # never decoded; surviving ones are swept but emit only
                    # candidate postings (kernel searchsorted filter)
                    cand_zones = np.unique(cand_ids // zone_width)
                    # pandas → Arrow path: a list-of-tuples createDataFrame
                    # would pickle-serialize up to cand_limit rows
                    zones_df = F.broadcast(
                        spark.createDataFrame(
                            pd.DataFrame({"zone": cand_zones.astype(np.int64)})
                        )
                    )
                    ne_narrow_keep = (
                        ne_cls.where(~F.col("_wide"))
                        .select(
                            "term", "salt", "blockID",
                            F.explode(F.sequence("_zlo", "_zhi")).alias("zone"),
                        )
                        .join(zones_df, "zone", "left_semi")
                        .select("term", "salt", "blockID")
                        .distinct()
                    )
                    ne_keys = ne_narrow_keep.unionByName(
                        ne_cls.where(F.col("_wide")).select("term", "salt", "blockID")
                    )
                    ne_keys_df = ne_keys
                    ne_decode = qblocks.join(ne_keys, ["term", "salt", "blockID"], "left_semi")
                    ne_parts = _decode_and_score(
                        ne_decode.select("term", "w_idf", "n", "docids", "tfs", "dls"),
                        avgdl, k1, b, cand_bc=cand_bc,
                    )
                    # every NE row is a candidate; every output doc carries
                    # ≥1 essential part, so candidacy needs no flag
                    total = (
                        e_parts.unionByName(ne_parts)
                        .groupBy("docID")
                        .agg(F.sum("part").alias("score"))
                    )
                else:
                    # Candidate set too large for a driver-side broadcast:
                    # stay fully DISTRIBUTED. (a) NE narrow blocks are still
                    # zone-pruned — candidate zones come from e_parts as a
                    # DataFrame (≤ docID-space/zone_width rows, tiny even at
                    # 10^12 docs) via left-semi, never collected; (b)
                    # candidacy is enforced by left-semi-joining decoded NE
                    # parts against the candidate docIDs BEFORE the score
                    # exchange, so non-candidate head-term postings never
                    # enter the final aggregation (AQE picks broadcast vs
                    # shuffle-hash for the semi joins by runtime size).
                    # Results are identical to the kernel path: a doc is a
                    # candidate iff it carries ≥1 essential posting.
                    cand_mode = "semijoin"
                    cand_zones_df = e_parts.select(
                        (F.col("docID") / zone_width).cast("long").alias("zone")
                    ).distinct()
                    ne_narrow_keep = (
                        ne_cls.where(~F.col("_wide"))
                        .select(
                            "term", "salt", "blockID",
                            F.explode(F.sequence("_zlo", "_zhi")).alias("zone"),
                        )
                        .join(cand_zones_df, "zone", "left_semi")
                        .select("term", "salt", "blockID")
                        .distinct()
                    )
                    ne_keys_df = ne_narrow_keep.unionByName(
                        ne_cls.where(F.col("_wide")).select("term", "salt", "blockID")
                    )
                    ne_decode = qblocks.join(
                        ne_keys_df, ["term", "salt", "blockID"], "left_semi"
                    )
                    ne_parts = _decode_and_score(
                        ne_decode.select("term", "w_idf", "n", "docids", "tfs", "dls"),
                        avgdl, k1, b,
                    )
                    ne_kept = ne_parts.join(
                        e_parts.select("docID").distinct(), "docID", "left_semi"
                    )
                    total = (
                        e_parts.unionByName(ne_kept)
                        .groupBy("docID")
                        .agg(F.sum("part").alias("score"))
                    )
                _t0 = _time.time()
                rows = _ranked(total, k).collect()
                phases["prune_decode_score"] = round(_time.time() - _t0, 3)
            finally:
                e_parts.unpersist()
                if cand_bc is not None:
                    # the kernel broadcast is dead once rows are collected;
                    # without this, executor+driver copies accrue across
                    # queries in a long-lived session (ADVICE r3)
                    cand_bc.destroy()
        if stats_out is not None:
            _t0 = _time.time()
            n_zones = zstats.count()
            n_zones_surv = surviving_zones.count()
            n_decoded = keep_keys.count()
            n_ne_decoded = ne_keys_df.count() if ne_keys_df is not None else 0
            phases["telemetry_counts"] = round(_time.time() - _t0, 3)
            stats_out.update(
                {
                    "theta": theta,
                    "blocks_total": n_total,
                    "blocks_surviving": n_decoded + n_ne_decoded,
                    "blocks_essential": n_decoded,
                    "blocks_ne_decoded": n_ne_decoded,
                    "blocks_wide": n_wide,
                    "zones_total": n_zones,
                    "zones_surviving": n_zones_surv,
                    "essential_terms": e_terms,
                    "nonessential_terms": ne_terms,
                    "ne_ub_sum": cum_ne,
                    "cand_mode": cand_mode,
                    "cand_count": n_cand,
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
