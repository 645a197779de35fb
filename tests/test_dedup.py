"""Dedup operator tests: candidate-first Jaccard verification (the scale
path) and SimHash hamming-ball pair search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.ops.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",        # 0
        "the quick brown fox jumps over the lazy cat",        # 1 near-dup of 0
        "completely different content about spark engines",   # 2
        "completely different content about spark clusters",  # 3 near-dup of 2
        "the quick brown fox jumps over the lazy dog",        # 4 exact dup of 0
        "unrelated text with no overlap whatsoever here",     # 5
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_jaccard_candidate_first_matches_quadratic(spark, dup_docs):
    """The candidate-first plan must return exactly the quadratic result
    restricted to the candidate pairs."""
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, n=2, threshold=0.0).collect()
    }
    cand_pairs = [(0, 1), (2, 3), (0, 4), (0, 5)]
    cand = spark.createDataFrame(cand_pairs, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, n=2, threshold=0.0, candidates=cand).collect()
    }
    exp = {p: j for p, j in full.items() if p in set(cand_pairs)}
    assert got == exp
    assert (0, 4) in got and got[(0, 4)] == 1.0  # exact dup
    assert (0, 5) not in got  # candidate with zero shared shingles → no row


def test_jaccard_pinned_out_hook(spark, dup_docs):
    """pinned_out collects the frames ngram_jaccard_pairs persisted so a
    one-shot caller can unpersist them after consuming the result."""
    from pyspark.storagelevel import StorageLevel

    cand = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    pinned: list = []
    out = ngram_jaccard_pairs(
        dup_docs, n=2, threshold=0.0, candidates=cand, pinned_out=pinned
    ).collect()
    assert len(out) == 2 and len(pinned) == 3  # cand, ids, sizes
    assert all(
        f.storageLevel.useMemory or f.storageLevel.useDisk for f in pinned
    )
    for f in pinned:
        f.unpersist()
    assert all(f.storageLevel == StorageLevel.NONE for f in pinned)


def test_jaccard_candidate_first_plan_restricts_scan(spark, dup_docs):
    """The doc scan must be pruned to candidate ids (left-semi before the
    shingle explode) and the plan must not contain the quadratic
    shingle-shingle self-join aggregation over non-candidate docs."""
    cand = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    plan = (
        ngram_jaccard_pairs(dup_docs, n=2, threshold=0.0, candidates=cand)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan  # candidate-id restriction reaches the scan


def test_simhash_pairs_complete_vs_bruteforce(spark, dup_docs):
    """Band-bucketed hamming-ball search is COMPLETE for hamming <=
    max_hamming < bands (pigeonhole) — must equal the brute-force all-pairs
    result exactly."""
    sigs = {r["id"]: r["simhash"] for r in simhash(dup_docs, n=2, bits=32).collect()}
    for max_h in (0, 2, 3):
        exp = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= max_h
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs(
                dup_docs, n=2, bits=32, bands=4, max_hamming=max_h
            ).collect()
        }
        assert got == exp, max_h
    # exact dup pair (0, 4) at hamming 0
    assert sigs[0] == sigs[4]
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(dup_docs, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        simhash_pairs(dup_docs, bits=32, bands=5, max_hamming=2)


def test_lsh_pipeline_end_to_end(spark, dup_docs):
    cand = minhash_lsh_pairs(dup_docs, n=2, num_hashes=8, bands=4)
    verified = ngram_jaccard_pairs(dup_docs, n=2, threshold=0.5, candidates=cand).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in verified}
    assert (0, 4) in pairs  # exact dup always survives
    # every verified pair was a candidate
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert pairs <= cand_set


def test_lsh_giant_bucket_star_guard(spark):
    """A duplicate cluster larger than max_bucket must complete WITHOUT a
    cluster-sized array row: the bucket emits star pairs against its min-id
    member (single-linkage connectivity preserved, linear output)."""
    n_dup = 10_000
    rows = [(i, "the same exact duplicated text appears everywhere") for i in range(n_dup)]
    rows += [(n_dup, "one unrelated document about spark"), (n_dup + 1, "another odd one out")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_pairs(df, num_hashes=8, bands=4, max_bucket=100).collect()
    assert len(pairs) == n_dup - 1
    assert all(r["id_a"] == 0 for r in pairs)
    assert {r["id_b"] for r in pairs} == set(range(1, n_dup))

    spairs = simhash_pairs(df, bits=32, bands=4, max_hamming=3, max_bucket=100).collect()
    assert len(spairs) == n_dup - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in spairs)


def test_bucket_stats_no_unbounded_window(spark):
    """The candidate path must carry NO window operator: bucket size/rep
    come from a streaming groupBy + join-back (mark_bucket_stats), so a
    pathological single bucket can never be buffered whole in one task's
    window frame (VERDICT r4 hardening #3)."""
    from neural_search_spark.ops.similarity import embedding_dup_pairs

    rows = [(i, "identical text every row") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for plan_df in (
        minhash_lsh_pairs(df, num_hashes=8, bands=4, max_bucket=10),
        simhash_pairs(df, bits=32, bands=4, max_hamming=3, max_bucket=10),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan[:2000]
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        embedding_dup_pairs(emb, dim=4, n_planes=8, bands=4,
                            max_hamming=3, threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan[:2000]


def test_single_giant_bucket_100k_members(spark):
    """One 10⁵-member bucket (every doc identical) must complete with
    linear star output and bounded per-task memory — the shape a
    mega-duplicate cluster takes at 100 TB."""
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact duplicated text appears everywhere").alias("text"),
    )
    pairs = simhash_pairs(df, bits=32, bands=4, max_hamming=3, max_bucket=64)
    agg = pairs.agg(
        F.count("*").alias("n"),
        F.min("id_a").alias("min_a"),
        F.max("id_a").alias("max_a"),
        F.max("hamming").alias("max_h"),
    ).first()
    assert agg["n"] == n - 1  # star edges only: linear, not n·(n-1)/2
    assert agg["min_a"] == 0 and agg["max_a"] == 0  # all anchored at rep
    assert agg["max_h"] == 0


def test_lsh_star_guard_preserves_small_bucket_output(spark, dup_docs):
    """Buckets at or below max_bucket keep exact all-pairs output — the
    guard at its default threshold does not change small-corpus results."""
    base = {tuple(r) for r in minhash_lsh_pairs(dup_docs).select("id_a", "id_b").collect()}
    guarded = {
        tuple(r)
        for r in minhash_lsh_pairs(dup_docs, max_bucket=6).select("id_a", "id_b").collect()
    }
    assert base == guarded


def test_shared_shingles_equivalence(spark, dup_docs):
    """Passing a precomputed doc_shingles frame must not change results of
    either LSH candidates or the Jaccard verify (the shared-scan path)."""
    from neural_search_spark.ops.dedup import doc_shingles

    sh = doc_shingles(dup_docs, n=3).persist()
    cand_a = minhash_lsh_pairs(dup_docs, n=3)
    cand_b = minhash_lsh_pairs(dup_docs, n=3, shingles=sh)
    assert {tuple(r) for r in cand_a.collect()} == {tuple(r) for r in cand_b.collect()}
    ver_a = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.05, candidates=cand_a)
    ver_b = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.05, candidates=cand_a, shingles=sh)
    assert {tuple(r) for r in ver_a.collect()} == {tuple(r) for r in ver_b.collect()}
    sh.unpersist()


def test_connected_components_and_dedup_near(spark, dup_docs):
    """Min-label propagation must converge to the transitive-closure min
    (including chains longer than one hop), and dedup_near must complete
    singletons with their own id."""
    from neural_search_spark.ops.dedup import connected_components, dedup_near

    # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: closure min for 1..4 is 1
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["rep"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(12)], "doc_id long, text string")
    out = {r["id"]: (r["rep"], r["is_survivor"]) for r in dedup_near(docs, pairs).collect()}
    assert out[3] == (1, False) and out[1] == (1, True)
    assert out[5] == (5, True)  # singleton
    survivors = {i for i, (_, s) in out.items() if s}
    assert survivors == {0, 1, 5, 6, 7, 8, 9, 10}


def test_connected_components_log_rounds_on_path_graph(spark):
    """Adversarial high-diameter graph (a 10k-node path — the worst case
    star-guard chains + band overlaps can produce): the pointer-shortcut
    step must converge in O(log2 diameter) rounds, not diameter rounds,
    and still land every node on the component min."""
    from neural_search_spark.ops.dedup import connected_components

    n = 10_000  # path 0-1-...-9999, diameter n-1
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    ).repartition(8)
    stats: dict = {}
    labels = connected_components(pairs, max_iter=30, stats=stats)
    bad = labels.where(F.col("rep") != 0).count()
    assert bad == 0
    assert labels.count() == n
    # ⌈log2(9999)⌉ = 14; +2 covers the shortcut-lag and the final
    # convergence-detection round. Plain propagation would need 9999.
    assert stats["rounds"] <= 16, stats


def test_connected_components_respects_caller_persist(spark):
    """If the caller persisted `pairs`, connected_components must not evict
    that cache on exit (ADVICE r3)."""
    from neural_search_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long").persist()
    try:
        pairs.count()
        comp = {r["id"]: r["rep"] for r in connected_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1}
        assert pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
    finally:
        pairs.unpersist()


def test_dedup_near_lsh_end_to_end(spark, dup_docs):
    """docs → LSH pairs → clusters: the exact/near dup groups of the
    fixture collapse to their min-id survivors."""
    from neural_search_spark.ops.dedup import dedup_near

    pairs = minhash_lsh_pairs(dup_docs)
    out = {r["id"]: r["rep"] for r in dedup_near(dup_docs, pairs).collect()}
    # 0, 1, 4 are (near-)dups of doc 0; 2, 3 of doc 2; 5 alone
    assert out[4] == 0 and out[1] == 0 and out[0] == 0
    assert out[3] == 2 and out[2] == 2
    assert out[5] == 5


def test_embedding_dup_pairs_matches_bruteforce(spark):
    """Band-bucketed code hamming ball == brute-force {hamming ≤ H} pairs,
    then exact cosine filter — verified against a numpy oracle."""
    import numpy as np

    from neural_search_spark.ops.similarity import (
        _plane_matrix,
        embedding_dup_pairs,
        lsh_index,
    )

    rng = np.random.RandomState(11)
    base = rng.normal(size=(40, 16))
    # plant near-dups: 3 jittered copies of vector 0
    vecs = np.vstack([base, base[0] + 0.01 * rng.normal(size=(3, 16))])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_dup_pairs(
            lsh_index(emb, dim=16, n_planes=8), dim=16, threshold=0.9,
            n_planes=8, bands=4, max_hamming=3,
        ).collect()
    }
    # numpy oracle over float32-rounded vectors (Spark stores array<float>)
    v = vecs.astype(np.float32).astype(np.float64)
    planes = _plane_matrix(16, 8)  # (planes, dim)
    codes = ((v @ planes.T) >= 0) @ (1 << np.arange(8))
    exp = {}
    for a in range(len(v)):
        for b in range(a + 1, len(v)):
            ham = bin(int(codes[a]) ^ int(codes[b])).count("1")
            cos = v[a] @ v[b] / (np.linalg.norm(v[a]) * np.linalg.norm(v[b]))
            if ham <= 3 and cos >= 0.9:
                exp[(a, b)] = cos
    assert set(got) == set(exp) and len(exp) >= 3
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)
