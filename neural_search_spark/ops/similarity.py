"""Similarity search over an embedding column (`array<float>`).

- `cosine_topk`: brute-force exact cosine top-k — the correctness baseline.
  Dot products are JVM-side `aggregate(zip_with(...))` folds in double
  precision (whole-stage codegen; no Python, no shuffle until the final
  TakeOrderedAndProject top-k).
- `lsh_cosine_topk`: the scale path — random-hyperplane (sign) LSH with
  deterministic hash-derived planes; candidates = vectors whose bucket is
  within `probe_hamming` bits of the query bucket, then exact cosine rerank.
  At 10^12 vectors the bucket column is a partition/cluster key so a probe
  touches only matching files; brute force stays O(N) per query.

The plane coefficients are ±1 derived from md5(plane||dim) — fully
deterministic, reproducible in any engine, no stored model state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_search_spark.ops.dedup import mark_bucket_stats
from neural_search_spark.ops.text import hash60


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(rank, id, cosine) exact top-k by cosine(query, embedding), ties by id
    asc. The query vector is a literal array folded into codegen — no join.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)), 9)
    scored = emb.select(F.col(id_col), cos.alias("cosine"))
    top = scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", id_col, "cosine")


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 coefficient for hyperplane `plane`, dimension `dim`
    (parity of the md5-derived hash60)."""
    import hashlib

    h = int(hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def _plane_matrix(dim: int, n_planes: int):
    return np.array(
        [[_plane_sign(p, d) for d in range(dim)] for p in range(n_planes)], dtype=np.float64
    )


def lsh_bucket_col(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: bit p = 1 iff Σ_d sgn(h(p,d))·v[d] ≥ 0.

    Implemented as an Arrow-batched pandas UDF doing one (batch × dim) @
    (dim × planes) matrix multiply — a column-expression version would be a
    dim×planes-term codegen expression that overflows janino at 64×8."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    planes_t = _plane_matrix(dim, n_planes).T  # (dim, planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))  # bit weights

    @pandas_udf(IntegerType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())  # (batch, dim) float
        proj = mat.astype(np.float64) @ planes_t  # (batch, planes)
        return pd.Series(((proj >= 0) @ weights).astype(np.int32))

    return bucket(vec_col)


def lsh_index(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Index-time bucketing: adds the sign-LSH `bucket` column. Write with
    `.write.partitionBy("bucket")` (or declare it a cluster key) so a query
    probe prunes to the matching bucket directories — at 10^12 vectors a
    probe of B buckets touches B/2^n_planes of the files, never a full
    scan. The bucket is computed ONCE here, at index time, not per query."""
    return emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes))


def query_bucket(query_vec: list[float], n_planes: int = 8) -> int:
    """The query vector's sign-LSH bucket (same planes as lsh_index)."""
    dim = len(query_vec)
    b = 0
    for p in range(n_planes):
        proj = sum(_plane_sign(p, d) * float(query_vec[d]) for d in range(dim))
        b |= int(proj >= 0) << p
    return b


def probe_buckets(q_bucket: int, n_planes: int = 8, probe_hamming: int = 2) -> list[int]:
    """All buckets within `probe_hamming` bit flips of the query bucket —
    the multi-probe set (C(n_planes, ≤probe_hamming) values, e.g. 37 for
    8 planes / 2 flips). Tiny: becomes an IN-list partition filter."""
    from itertools import combinations

    out = []
    for h in range(probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            b = q_bucket
            for f in flips:
                b ^= 1 << f
            out.append(b)
    return sorted(out)


# -- IVF (inverted-file) ANN: coarse spherical k-means quantizer ------------


def ivf_train_centroids(
    emb: DataFrame,
    dim: int,
    n_clusters: int = 16,
    sample: int = 2048,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer, trained driver-side
    on a fixed sample (the `sample` lowest ids — reproducible in any
    engine; IVF training on a sample is standard practice at any scale).
    Returns L2-normalized centroids (n_clusters, dim): cosine argmax over
    clusters reduces to a plain dot-product argmax against them. Lloyd
    iterations are numpy; empty clusters keep their previous centroid.
    """
    rows = emb.orderBy(id_col).limit(sample).select(vec_col).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # deterministic init: evenly spaced sample rows (sorted by id)
    idx = np.linspace(0, len(xn) - 1, n_clusters).astype(int)
    c = xn[idx].copy()
    for _ in range(iters):
        assign = (xn @ c.T).argmax(axis=1)
        for j in range(n_clusters):
            members = xn[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    c[j] = m / n
    return c


def ivf_assign_col(vec_col: Column, centroids: np.ndarray) -> Column:
    """Cluster id = argmax_j centroid_j · v (ties → lowest j), as an
    Arrow-batched matrix multiply — the index-time assignment."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    ct = np.ascontiguousarray(centroids.T)  # (dim, C)

    @pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        return pd.Series((mat @ ct).argmax(axis=1).astype(np.int32))

    return assign(vec_col)


def ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-time clustering: adds the `cluster` column. Write with
    `.write.partitionBy("cluster")` so a probe prunes to nprobe cluster
    directories out of n_clusters — the IVF analog of lsh_index."""
    return emb.withColumn("cluster", ivf_assign_col(F.col(vec_col), centroids))


def ivf_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the `nprobe` clusters whose centroids are
    closest to the query, exact cosine rerank inside them. If `emb` lacks
    the `cluster` column it is assigned on the fly (small corpora only; at
    scale always pre-cluster with ivf_index + partitionBy)."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(-(centroids @ q), kind="stable")
    probes = [int(j) for j in order[:nprobe]]
    if "cluster" not in emb.columns:
        emb = ivf_index(emb, centroids, vec_col)
    cand = emb.where(F.col("cluster").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: restrict to vectors whose LSH bucket is within
    `probe_hamming` bits of the query's bucket, then exact cosine rerank.
    Recall rises with probe_hamming (== n_planes → exhaustive == exact).

    If `emb` already carries a `bucket` column (built by `lsh_index` and
    ideally a partition key of the stored table), the probe is a plain
    IN-list filter on that column — partition-prunable, zero per-row work
    at query time. Without it the bucket is computed on the fly (small
    corpora / ad-hoc use only; at scale always pre-bucket)."""
    q_bucket = query_bucket(query_vec, n_planes)
    if "bucket" in emb.columns:
        probes = probe_buckets(q_bucket, n_planes, probe_hamming)
        cand = emb.where(F.col("bucket").isin(probes))
    else:
        bucket = lsh_bucket_col(F.col(vec_col), len(query_vec), n_planes)
        hamming = F.bit_count(bucket.cast("long").bitwiseXOR(F.lit(q_bucket).cast("long")))
        cand = emb.where(hamming <= probe_hamming)
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def embedding_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """(id_a, id_b, cosine) — embedding-cosine near-dup pairs: candidates
    are vectors whose sign-LSH codes lie within `max_hamming` bits, found
    by the band-bucket trick (split the n_planes-bit code into `bands`
    contiguous bit bands; by pigeonhole any pair within max_hamming <
    bands agrees exactly on ≥1 band → one shuffle on the band value, pair
    generation bucket-side with the same giant-bucket star guard as
    minhash_lsh_pairs), then verified with the exact cosine ≥ threshold.

    Completeness caveat (unlike SimHash-over-shingles, where the code IS
    the signature): the hamming ball is complete over the CODES, but the
    code is a lossy projection of the vector — a pair with cosine ≥
    threshold whose codes differ in more than max_hamming bits is missed.
    Recall rises with n_planes and max_hamming; at 100 TB the candidate
    stage stays one bucket-shuffle regardless.
    """
    if n_planes % bands != 0:
        raise ValueError("n_planes must be divisible by bands")
    if not 0 <= max_hamming < bands:
        raise ValueError("max_hamming must satisfy 0 <= max_hamming < bands")
    if "bucket" in emb.columns:
        coded = emb.select(F.col(id_col).alias("id"), F.col("bucket").alias("code"))
    else:
        coded = emb.select(
            F.col(id_col).alias("id"),
            lsh_bucket_col(F.col(vec_col), dim, n_planes).alias("code"),
        )
    width = n_planes // bands
    band_vals = [
        F.shiftright(F.col("code").cast("long"), b * width) % F.lit(1 << width)
        for b in range(bands)
    ]
    banded = coded.select("id", "code", F.posexplode(F.array(*band_vals)).alias("band", "bv"))
    # streaming groupBy + join-back, not an unbounded window: a giant
    # bucket must never be buffered whole in one task (see
    # dedup.mark_bucket_stats)
    marked = mark_bucket_stats(banded, ["band", "bv"], F.struct("id", "code"))
    small = (
        marked.where((F.col("_cnt") > 1) & (F.col("_cnt") <= max_bucket))
        .groupBy("band", "bv")
        .agg(F.sort_array(F.collect_set(F.struct("id", "code"))).alias("rows"))
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
                            F.bit_count(
                                x["code"].cast("long").bitwiseXOR(y["code"].cast("long"))
                            ).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.hamming")
    star_pairs = marked.where(
        (F.col("_cnt") > max_bucket) & (F.col("id") != F.col("_rep.id"))
    ).select(
        F.col("_rep.id").alias("id_a"),
        F.col("id").alias("id_b"),
        F.bit_count(
            F.col("_rep.code").cast("long").bitwiseXOR(F.col("code").cast("long"))
        ).alias("hamming"),
    )
    cand = (
        small_pairs.unionByName(star_pairs)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def quantize_embeddings_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: (id, codes array<int> in
    [-127, 127], scale double) with codes = ⌊v/scale + 0.5⌋, scale =
    max|v|/127 (all-zero vector → scale 1, zero codes).

    The 100 TB story: cosine is invariant to per-vector scaling, so
    quantized search needs NO dequantize — the stored vector payload
    shrinks 4× vs float32 (8× vs float64) and the scan/shuffle shrink with
    it; `scale` is kept only for callers that need magnitudes back.
    ⌊x + 0.5⌋ is used instead of round() so Spark and any SQL oracle agree
    bit-for-bit (round() half-case conventions differ across engines)."""
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    codes = F.transform(
        v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
    )
    return emb.select(
        F.col(id_col), codes.alias("codes"), scale.alias("scale")
    )


def cosine_int8_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """(rank, id, cosine) top-k by cosine(query, int8 codes) — the same
    codegen fold as cosine_topk over the 4×-smaller quantized column; the
    FLOAT query vector needs no quantization (only the stored side pays
    the memory bill). Recall vs exact float cosine degrades only by the
    quantization angle error (≤ ~0.6° at int8), pinned by test."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    c = F.col(codes_col)
    cos = F.round(_dot(c, q) / (_norm(c) * _norm(q)), 9)
    scored = codes_df.select(F.col(id_col), cos.alias("cosine"))
    top = scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", id_col, "cosine")
