"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB):
- exact dedup is one hash-shuffle on a 16-byte key (not the full text);
- MinHash/LSH is the scale path for near-dup: per-doc signatures are k
  aggregates over a single shingle explode (one shuffle on doc id — in
  practice map-side, since shingles of one doc are colocated), band
  buckets then shuffle on (band, signature) where each bucket is tiny;
- the pairwise n-gram Jaccard join is the *verification* step, run only on
  LSH candidate pairs (or standalone on small slices — it is quadratic per
  shared shingle and must never run raw at 10^12 docs);
- SimHash aggregates 32 bit-majorities per doc via one explode + groupBy.

All hashing is `hash60` (md5-based) so the DuckDB oracle reproduces results
bit-for-bit; xxhash64 would be faster JVM-side but is not reproducible in
the oracle — at production scale swap HASH_IMPL to xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col
from neural_search_spark.ops.text import hash60


def shingle_col(toks: Column, n: int = 3) -> Column:
    """array<string> tokens → array<string> of n-token shingles (space
    joined). Docs shorter than n tokens produce their full token string as
    the single shingle, so no doc is dropped."""
    short = F.concat_ws(" ", toks)
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    full = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, full).otherwise(F.array(short))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by md5(text): one row per distinct text with the survivor
    (min id) and the duplicate count. Shuffle key is the 32-char digest, not
    the document body."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs. Public so a pipeline running several
    shingle consumers (MinHash-LSH candidates + Jaccard verify) can
    tokenize/shingle the corpus ONCE, persist, and pass the frame to each
    via their `shingles` parameter."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingle_col(tokenize_col(text_col), n)).alias("shingle"))
        .distinct()
    )


_doc_shingles = doc_shingles  # internal alias (signature kept positional below)


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    shingles: DataFrame | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, matched_ngrams): corpus docs sharing ≥1 token n-gram with any
    benchmark text — the train-set DECONTAMINATION primitive (flag training
    documents that leak evaluation data; n=13 is the de-facto contamination
    window from the GPT-3/PaLM data papers, public methodology).

    Dataflow at 100 TB: the benchmark side (eval suites: 10^3–10^6 grams)
    is deduplicated then BROADCAST, so the corpus side is one shingle pass
    + a map-side hash-join — the corpus never shuffles and the output is
    only the contaminated ids with their distinct-gram counts. Set
    broadcast_benchmark=False for benchmark sets too big for a broadcast
    (AQE then picks the join strategy from runtime sizes).

    `shingles` accepts a pre-computed doc_shingles(docs, n=n) frame so a
    pipeline already shingling for MinHash/Jaccard dedup reuses one pass.
    Short-doc fallback matches doc_shingles: a doc (or benchmark row) with
    fewer than n tokens contributes its whole token string as one gram —
    short texts are matched exactly rather than skipped.
    """
    sh = shingles if shingles is not None else doc_shingles(docs, text_col, id_col, n)
    bsh = (
        benchmark.select(
            F.explode(shingle_col(tokenize_col(bench_text_col), n)).alias("shingle")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    # sh is distinct per (id, shingle), so count(*) = distinct matched grams
    return (
        sh.join(bsh, "shingle")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("matched_ngrams"))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature.

    ONE md5 per shingle: the 128-bit digest yields two independent 60-bit
    words h1 (hex chars 1-15) and h2 (17-31); hash j is the
    Kirsch-Mitzenmacher combination g_j = (h1 + j·h2') mod 2^60 (the same
    single-base-hash universal family Spark's own MinHashLSH and datasketch
    use). vs one salted md5 per hash function this removes k-1 md5 digests
    AND k string concats per shingle — the former hot path of the whole LSH
    pipeline. h2 is clamped to 58 bits so h1 + j·h2' stays within int64 for
    k ≤ 16 (DuckDB raises on BIGINT overflow; Spark would wrap silently).
    k min-aggregates over one explode — no cross-join row blowup.

    FORMAT NOTE: this family replaced the earlier one-salted-md5-per-hash
    family — signature values (and therefore LSH band keys) are NOT
    comparable with signatures persisted by that version; re-signature the
    corpus rather than mixing. If k > 16 is ever needed, derive additional
    independent 58-bit words from unused digest hex (or a second digest of
    shingle||'#2') instead of lifting the cap."""
    if num_hashes > 16:
        raise ValueError("num_hashes must be <= 16 (int64 overflow headroom)")
    sh = shingles if shingles is not None else _doc_shingles(df, text_col, id_col, n)
    digest = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 15), 16, 10).cast("long") % F.lit(1 << 58)
    hashed = sh.select("id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min((F.col("h1") + F.lit(j) * F.col("h2")) % F.lit(1 << 60)).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def mark_bucket_stats(banded: DataFrame, keys: list[str], rep_expr: Column) -> DataFrame:
    """Attach per-bucket size ``_cnt`` and representative ``_rep`` WITHOUT
    an unbounded window.

    ``count().over(Window.partitionBy(bucket))`` buffers the ENTIRE bucket
    in one task's window frame before any downstream size guard can apply
    — a pathological 10⁸-member bucket (one mega-duplicate cluster at
    100 TB) would pin a single executor. A groupBy(count, min) carries
    constant per-bucket state, aggregates partially map-side, and streams;
    joining the (one-row-per-bucket) stats back on the bucket key is
    memory-bounded. Both sides hash-partition on the same key, so the plan
    pays the same single exchange of the banded side the window needed
    anyway plus one tiny stats-side exchange.
    """
    stats = banded.groupBy(*keys).agg(
        F.count("*").alias("_cnt"), F.min(rep_expr).alias("_rep")
    )
    return banded.join(stats, keys)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    shingles: DataFrame | None = None,
    max_bucket: int = 1024,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) that agree on ≥1 LSH band.
    rows-per-band = num_hashes/bands; band key = md5 of the band's minhash
    values. The self-join is per-bucket; buckets are tiny unless the corpus
    has true heavy duplication (then AQE skew-join splits them).

    Giant-bucket guard: a bucket of m near-identical docs yields m·(m-1)/2
    pairs — at 100 TB a 10⁶-duplicate cluster (exactly what dedup targets)
    would both blow up the pair output quadratically AND build a
    10⁶-element array in one aggregation buffer. Buckets larger than
    `max_bucket` therefore emit STAR pairs only — (bucket-min-id, other)
    for every member, linear rows, no array ever materialized — which
    preserves single-linkage duplicate-cluster connectivity (every member
    still reaches the representative) at the cost of the non-representative
    pairwise edges; full all-pairs output is kept for buckets ≤ max_bucket.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, n, num_hashes, shingles=shingles)
    band_keys = [
        F.md5(F.concat_ws(",", *[F.col(f"mh_{b * r + i}").cast("string") for i in range(r)]))
        for b in range(bands)
    ]
    # ONE pass over the signatures: posexplode the band keys (a self-join on
    # a banded view would recompute the minhash pipeline once per side)
    banded = sig.select("id", F.posexplode(F.array(*band_keys)).alias("band", "band_key"))
    # pair generation bucket-side, shuffled on (band, band_key): bucket
    # size/representative come from a streaming groupBy + join-back (see
    # mark_bucket_stats — no unbounded window, no whole-bucket buffering),
    # and the small-bucket groupBy reuses the same hash partitioning
    marked = mark_bucket_stats(banded, ["band", "band_key"], F.col("id"))
    small = (
        marked.where((F.col("_cnt") > 1) & (F.col("_cnt") <= max_bucket))
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
    )
    small_pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    star_pairs = marked.where(
        (F.col("_cnt") > max_bucket) & (F.col("id") != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col("id").alias("id_b"))
    return small_pairs.unionByName(star_pairs).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
    pinned_out: list | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    `shingles` (id, shingle — from doc_shingles, ideally persisted) lets a
    caller that already shingled the corpus for LSH skip re-tokenizing it
    here; with `candidates` it is narrowed to candidate ids the same way
    the doc scan would be.

    With `candidates` (id_a, id_b) — normally the LSH output — the plan is
    CANDIDATE-FIRST (the scale path): the document scan itself is restricted
    to candidate ids (left-semi before shingling), and shared-shingle counts
    come from joining the candidate pair list to per-doc shingle sets
    directly — pair → (pair, shingles of a) → inner join on (id_b, shingle).
    Work is linear in Σ|shingles(candidate docs)|; a stop-shingle shared by
    10^6 non-candidate docs contributes nothing. Without `candidates` this
    is the exact-but-quadratic all-pairs variant for small corpora only —
    never run it raw at 10^12 docs."""
    cand = None
    if candidates is not None:
        # PERSIST the candidate frames: `cand` feeds the shared-shingle join
        # AND (via `ids`) three semi-joins (sh_a, sh_b, sizes×2) — unpersisted,
        # the entire upstream candidate pipeline (typically the full
        # MinHash-LSH DAG: signatures, banding, bucket window, pair-gen) is
        # re-executed once per consumer, ~5× total. Measured at sf0.01 this
        # was a ~20 s fixed floor on lsh_jaccard_verified; persisted it is
        # one evaluation. Both frames are candidate-pair scale (≪ corpus) and
        # are left pinned for the lifetime of the result plan — Spark evicts
        # them LRU. One-shot callers can pass `pinned_out=[]`: every frame
        # this function persists is appended to it, and after the result is
        # fully consumed the caller unpersists them (targeted, unlike
        # spark.catalog.clearCache() which would evict unrelated caches).
        cand = (
            candidates.select("id_a", "id_b").where(F.col("id_a") < F.col("id_b")).distinct()
        ).persist()
        ids = (
            cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        ).persist()
        if pinned_out is not None:
            pinned_out.extend([cand, ids])
        # prune the expensive tokenize/shingle scan to candidate docs
        df = df.join(ids, id_col, "left_semi")
    if shingles is not None:
        sh = shingles
        if cand is not None:
            sh = sh.join(ids.withColumnRenamed(id_col, "id"), "id", "left_semi")
    else:
        sh = _doc_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        # used twice (n_a, n_b); one row per candidate doc — tiny
        sizes = sizes.persist()
        if pinned_out is not None:
            pinned_out.append(sizes)
    if candidates is not None:
        sh_a = sh.select(F.col("id").alias("id_a"), "shingle")
        sh_b = sh.select(F.col("id").alias("id_b"), "shingle")
        common = (
            cand.join(sh_a, "id_a")
            .join(sh_b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(b, F.col("a.shingle") == F.col("b.shingle"))
            .where(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_common"))
        )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, bits: int = 32
) -> DataFrame:
    """(id, simhash) — bit-majority SimHash over shingle hash60 values
    (lowest `bits` bits). Bit j of the output is set iff at least half the
    shingles have bit j set (ties → set). Pure explode + groupBy: the bit
    expansion is `bits` column expressions, not a row blowup."""
    sh = _doc_shingles(df, text_col, id_col, n).select(
        "id", (hash60(F.col("shingle")) % F.lit(1 << bits)).alias("h")
    )
    aggs = [F.sum(F.shiftright(F.col("h"), j) % 2).alias(f"b{j}") for j in range(bits)]
    counted = sh.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
    val = F.lit(0).cast("long")
    for j in range(bits):
        bit = (F.lit(2) * F.col(f"b{j}") >= F.col("n_sh")).cast("long")
        val = val + F.shiftleft(bit, j)
    return counted.select("id", val.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """(id_a, id_b, hamming) — near-dup pairs whose SimHash signatures are
    within `max_hamming` bits.

    Scale path (the hamming-ball analog of MinHash banding): the signature
    is split into `bands` contiguous bit bands; by pigeonhole any pair with
    hamming ≤ max_hamming < bands agrees EXACTLY on at least one band, so
    candidates = pairs sharing a (band, band_value) bucket — one shuffle on
    the band key, pair generation bucket-side, then an exact
    bit_count(xor) verify. No all-pairs join anywhere; completeness (no
    missed pair) is guaranteed, not probabilistic — EXCEPT in buckets
    larger than `max_bucket`, which emit star pairs against the bucket's
    min-id member only (linear rows, no giant aggregation array; see
    minhash_lsh_pairs — same guard, same single-linkage-clustering
    rationale). Star pairs still pass the exact hamming verify, so no
    false pair is ever emitted."""
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    if not 0 <= max_hamming < bands:
        raise ValueError(
            "max_hamming must satisfy 0 <= max_hamming < bands "
            "(pigeonhole completeness needs more bands than flipped bits)"
        )
    sig = simhash(df, text_col, id_col, n, bits)
    width = bits // bands
    band_vals = [
        F.shiftright(F.col("simhash"), b * width) % F.lit(1 << width) for b in range(bands)
    ]
    banded = sig.select(
        "id", "simhash", F.posexplode(F.array(*band_vals)).alias("band", "bv")
    )
    marked = mark_bucket_stats(banded, ["band", "bv"], F.struct("id", "simhash"))
    small = (
        marked.where((F.col("_cnt") > 1) & (F.col("_cnt") <= max_bucket))
        .groupBy("band", "bv")
        .agg(F.sort_array(F.collect_set(F.struct("id", "simhash"))).alias("rows"))
    )
    small_pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("rows"),
                    lambda x, i: F.transform(
                        F.slice(F.col("rows"), i + 2, F.size(F.col("rows"))),
                        lambda y: F.struct(
                            x["id"].alias("id_a"),
                            y["id"].alias("id_b"),
                            F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", F.col("p.hamming").cast("long").alias("hamming"))
    star_pairs = marked.where(
        (F.col("_cnt") > max_bucket) & (F.col("id") != F.col("_rep.id"))
    ).select(
        F.col("_rep.id").alias("id_a"),
        F.col("id").alias("id_b"),
        F.bit_count(F.col("_rep.simhash").bitwiseXOR(F.col("simhash"))).cast("long").alias("hamming"),
    )
    return (
        small_pairs.unionByName(star_pairs)
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(id, rep) — connected-component labels over an undirected pair list,
    rep = min id reachable from the node (the canonical dedup survivor).

    Each round runs (1) min-label propagation — join current labels across
    the symmetric edge list, take the min neighbor label — and, from the
    third round on, (2) POINTER SHORTCUTTING — rep := min(rep, rep[rep]) —
    terminating when a round changes nothing. Propagation alone needs
    diameter-many rounds; the shortcut step doubles the effective reach per
    round (rep already summarizes its own reachable set), so convergence is
    O(log diameter): an adversarial high-diameter pair graph (chains
    produced by star-guard truncation overlapping across bands, or
    pathological near-dup chains) converges in ~log2(d) rounds instead of
    d. Typical LSH dedup graphs (diameter ≤ ~2·bands by construction)
    converge within the first plain rounds and never pay the shortcut's
    second shuffle — it is the 100 TB safety net, engaged only when the
    graph is evidently deep. Lineage is cut per round with localCheckpoint
    so the plan does not deepen. A 10⁶-member cluster costs the same
    rounds as a 10-member one — rounds scale with log(diameter), not
    cluster size.

    The driver-side loop is control flow only (one Long per round crosses
    to the driver); no data is ever collected. If `stats` is given,
    stats["rounds"] records the executed round count.
    """
    # the union evaluates `pairs` twice (+once more via the self-loop
    # branch); callers typically hand us the raw LSH pipeline — pin it so
    # the candidate DAG runs once. Only persist (and later unpersist) if the
    # caller has not already persisted the frame — unconditionally
    # unpersisting would silently evict a cache the caller still relies on.
    we_persisted = not pairs.storageLevel.useMemory and not pairs.storageLevel.useDisk
    if we_persisted:
        pairs = pairs.persist()
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    # self-loops fold the "keep own label" left-join into the neighbor-min
    # aggregation: one join + one agg per round instead of two joins
    edges = (
        sym.unionByName(sym.select(F.col("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
        .localCheckpoint()
    )
    # Convergence check rides a monotone scalar: reps only ever decrease, so
    # Σrep (exact decimal — int64 ids at 10^12-row scale would overflow a
    # LongType sum) is strictly decreasing iff any label changed this round.
    # One tiny agg job per round, no change-flag join, nothing but a scalar
    # crosses to the driver. Σ unchanged across a full (propagate+shortcut)
    # round ⇒ fixpoint of plain propagation ⇒ rep is the component min (the
    # shortcut only accelerates; it cannot introduce new fixpoints — every
    # rep value is itself a node id, so rep[rep] is always defined).
    def _sum_rep(lb):
        return lb.agg(F.sum(F.col("rep").cast("decimal(38,0)")).alias("s")).first()["s"]

    prev_sum = _sum_rep(labels)
    rounds = 0
    try:
        for _ in range(max_iter):
            propagated = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("rep").alias("rep"))
                .withColumnRenamed("src", "id")
            )
            if rounds >= 2:
                # pointer shortcut: rep := min(rep, rep-of-rep). rep values
                # are node ids present in `labels`, so the lookup join is
                # total; an inner join keeps exactly one row per id. Rounds
                # 1-2 skip it (identity on round 1; shallow LSH graphs are
                # already done by round 3) — only deep graphs pay the
                # second shuffle, and for them it buys the log bound.
                lk = labels.select(F.col("id").alias("_rid"), F.col("rep").alias("_rrep"))
                updated = (
                    propagated.join(lk, propagated.rep == lk._rid)
                    .select("id", F.least("rep", "_rrep").alias("rep"))
                ).localCheckpoint()
            else:
                updated = propagated.localCheckpoint()
            rounds += 1
            cur_sum = _sum_rep(updated)
            labels = updated
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        if stats is not None:
            stats["rounds"] = rounds
        return labels
    finally:
        edges.unpersist()
        if we_persisted:
            pairs.unpersist()


def dedup_near(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, rep, is_survivor) for EVERY row of `df`: near-dup cluster label
    from `pairs` (connected_components), singletons labeled by their own
    id. Filtering `is_survivor` yields the deduplicated corpus — the
    actual end-product of a near-dup pipeline at 100 TB (pairs are an
    intermediate). The components join is broadcast-friendly: the label
    table has one row per PAIRED doc (duplicates only), typically a small
    fraction of the corpus."""
    comp = connected_components(pairs)
    out = df.select(F.col(id_col).alias("id")).join(comp, "id", "left")
    return out.select(
        "id",
        F.coalesce(F.col("rep"), F.col("id")).alias("rep"),
        (F.coalesce(F.col("rep"), F.col("id")) == F.col("id")).alias("is_survivor"),
    )
