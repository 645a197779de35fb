"""Deterministic sampling / stratified quotas / sequence packing
(ops/sampling.py) vs hand-computed expectations."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from neural_search_spark.ops.sampling import (
    HASH_SPACE,
    hash_sample,
    pack_sequences,
    stratified_sample,
)


def _h60(key, seed: str) -> int:
    return int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:15], 16)


def test_hash_sample_deterministic_and_exact(transcripts):
    rate = 0.25
    got = sorted(r["docID"] for r in hash_sample(transcripts, rate, "docID").select("docID").collect())
    again = sorted(r["docID"] for r in hash_sample(transcripts, rate, "docID").select("docID").collect())
    assert got == again
    all_ids = [r["docID"] for r in transcripts.select("docID").collect()]
    expected = sorted(d for d in all_ids if _h60(d, "0") < int(rate * HASH_SPACE))
    assert got == expected
    # rate is approximately honored (binomial; generous bound for n=200)
    assert 0.10 * len(all_ids) <= len(got) <= 0.45 * len(all_ids)


def test_hash_sample_seeds_independent(transcripts):
    a = {r["docID"] for r in hash_sample(transcripts, 0.3, "docID", seed="a").select("docID").collect()}
    b = {r["docID"] for r in hash_sample(transcripts, 0.3, "docID", seed="b").select("docID").collect()}
    assert a != b  # overwhelmingly likely for 200 docs


def test_hash_sample_rate_bounds(transcripts):
    with pytest.raises(ValueError):
        hash_sample(transcripts, 1.5, "docID")
    assert hash_sample(transcripts, 0.0, "docID").count() == 0
    assert hash_sample(transcripts, 1.0, "docID").count() == transcripts.count()


def test_stratified_sample_caps_and_picks_by_hash(transcripts):
    n = 5
    out = stratified_sample(transcripts, "role", n, key_col="docID")
    rows = out.select("role", "docID").collect()
    by_role: dict[str, list[int]] = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r["docID"])
    src = transcripts.select("role", "docID").collect()
    groups: dict[str, list[int]] = {}
    for r in src:
        groups.setdefault(r["role"], []).append(r["docID"])
    for role, ids in groups.items():
        expected = sorted(ids, key=lambda d: (_h60(d, "0"), d))[:n]
        assert sorted(by_role[role]) == sorted(expected)


def test_pack_sequences_matches_python_prefix_sum(transcripts):
    budget = 200
    tok = transcripts.select("docID", F.length("text").alias("n_tok"))
    out = pack_sequences(tok, "n_tok", budget, order_col="docID")
    got = {r["docID"]: (r["pack_id"], r["pack_offset"]) for r in out.collect()}
    rows = sorted(
        (r["docID"], r["n_tok"]) for r in tok.collect()
    )
    cum = 0
    expected = {}
    for d, t in rows:
        expected[d] = (cum // budget, cum % budget)
        cum += t
    assert got == expected
    # pack ids are contiguous from 0
    packs = sorted({p for p, _ in got.values()})
    assert packs == list(range(len(packs)))


def test_pack_sequences_joins_full_rows(transcripts):
    budget = 500
    tok = transcripts.withColumn("n_tok", F.length("text"))
    out = pack_sequences(tok, "n_tok", budget, order_col="docID")
    assert out.count() == transcripts.count()
    assert {"pack_id", "pack_offset", "text"} <= set(out.columns)


def test_mixture_sample_exact_proportions(spark):
    from neural_search_spark.ops.sampling import mixture_sample

    rows = [(i, ["en", "code", "math"][i % 6 % 3 if i % 6 < 3 else 0]) for i in range(300)]
    # make groups skewed: en gets extras
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    counts = {}
    for _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    weights = {"en": 0.5, "code": 0.3, "math": 0.2}
    out = mixture_sample(df, "lang", weights, seed="s1")
    got = {r["lang"]: r["doc_id"] for r in out.collect()}  # just to force
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["lang"], set()).add(r["doc_id"])
    lam = min(counts[g] / w for g, w in weights.items())
    expected_quota = {g: int(lam * w) for g, w in weights.items()}
    assert {g: len(v) for g, v in by_g.items()} == expected_quota
    # proportions hold to within rounding
    tot = sum(expected_quota.values())
    for g, w in weights.items():
        assert abs(expected_quota[g] / tot - w) < 0.02
    # deterministic membership: python mirror of the hash order
    for g, members in by_g.items():
        ids = sorted((d for d, gg in rows if gg == g))
        ordered = sorted(ids, key=lambda d: (_h60(d, "s1"), d))
        assert members == set(ordered[: expected_quota[g]])
    # same seed → same rows; different seed → different rows (usually)
    again = {(r["lang"], r["doc_id"]) for r in mixture_sample(df, "lang", weights, seed="s1").collect()}
    assert again == {(g, d) for g, v in by_g.items() for d in v}
    # unknown group in weights → error; empty → error
    import pytest as _pt

    with _pt.raises(ValueError):
        mixture_sample(df, "lang", {"xx": 1.0})
    with _pt.raises(ValueError):
        mixture_sample(df, "lang", {})
