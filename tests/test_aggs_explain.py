"""date_histogram / range aggregations alongside queries, and the
per-document explain (score breakdown) API."""

from __future__ import annotations

from collections import Counter
from datetime import timedelta

import pytest

from neural_search_spark.analysis.tokenizer import tokenize_py

from tests import oracle

Q = {"match": {"text": {"query": "merge sort"}}}


def _match_rows(transcripts):
    rows = transcripts.select("docID", "text", "ts", "turn_idx").collect()
    return [r for r in rows if {"merge", "sort"} & set(tokenize_py(r["text"]))]


def test_date_histogram_with_gap_fill(engine, transcripts):
    matched = _match_rows(transcripts)
    by_hour = Counter(r["ts"].replace(minute=0, second=0, microsecond=0) for r in matched)
    lo, hi = min(by_hour), max(by_hour)
    expected = {}
    cur = lo
    while cur <= hi:
        expected[cur] = by_hour.get(cur, 0)
        cur += timedelta(hours=1)
    assert 0 in expected.values() or len(expected) == len(by_hour)  # gaps possible

    _, aggs = engine.search_with_aggs(
        Q, {"by_hour": {"date_histogram": {"field": "ts", "calendar_interval": "hour"}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["by_hour"].collect()}
    assert got == expected


def test_date_histogram_min_doc_count_1(engine, transcripts):
    matched = _match_rows(transcripts)
    by_hour = Counter(r["ts"].replace(minute=0, second=0, microsecond=0) for r in matched)
    _, aggs = engine.search_with_aggs(
        Q, {"by_hour": {"date_histogram": {"field": "ts", "calendar_interval": "hour",
                                           "min_doc_count": 1}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["by_hour"].collect()}
    assert got == dict(by_hour)


def test_range_agg_overlapping_and_open(engine, transcripts):
    matched = _match_rows(transcripts)
    ranges = [{"to": 3}, {"from": 2, "to": 6}, {"from": 4}]
    expected = {
        "*-3": sum(1 for r in matched if r["turn_idx"] < 3),
        "2-6": sum(1 for r in matched if 2 <= r["turn_idx"] < 6),
        "4-*": sum(1 for r in matched if r["turn_idx"] >= 4),
    }
    _, aggs = engine.search_with_aggs(
        Q, {"rng": {"range": {"field": "turn_idx", "ranges": ranges}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["rng"].collect()}
    assert got == expected
    # overlap: a doc with turn_idx=2 is in both *-3 and 2-6
    assert sum(expected.values()) >= len(matched)


def test_explain_sums_to_search_score(engine, transcripts):
    docs = {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}
    scores = oracle.bm25_scores(docs, {"merge": 1.0, "sort": 1.0})
    # pick a doc matching both terms if possible, else any match
    both = [d for d, t in docs.items() if {"merge", "sort"} <= set(tokenize_py(t))]
    target = both[0] if both else max(scores, key=scores.get)
    parts = engine.explain(Q, target).collect()
    assert parts, "explain must return matching terms"
    total = sum(r["contribution"] for r in parts)
    assert total == pytest.approx(scores[target], rel=1e-9)
    for r in parts:
        assert r["contribution"] == pytest.approx(
            r["q_weight"] * r["idf"] * r["tf_norm"], rel=1e-12
        )
    if both:
        assert {r["term"] for r in parts} == {"merge", "sort"}


def test_explain_rejects_non_lexical(engine):
    from neural_search_spark.query.dsl import QueryValidationError

    with pytest.raises(QueryValidationError):
        engine.explain({"match_all": {}}, 0)


def test_cardinality_percentiles_stats_aggs(engine, transcripts):
    matched = _match_rows(transcripts)
    dls = sorted(len(tokenize_py(r["text"])) for r in matched)

    def q_cont(p):
        # linear-interpolation percentile (Spark percentile / duckdb
        # quantile_cont definition)
        x = (len(dls) - 1) * p
        lo, hi = int(x), min(int(x) + 1, len(dls) - 1)
        return dls[lo] + (x - int(x)) * (dls[hi] - dls[lo])

    # aggregate over a derived dl column: reuse docs with a token-count col
    from pyspark.sql import functions as F

    from neural_search_spark.analysis.tokenizer import tokenize_col
    from neural_search_spark.query.dsl import QueryEngine

    docs2 = transcripts.withColumn("_dl", F.size(tokenize_col("text")))

    eng2 = QueryEngine(tables=engine.tables, docs=docs2)
    _, aggs = eng2.search_with_aggs(
        Q,
        {
            "card": {"cardinality": {"field": "turn_idx"}},
            "pct": {"percentiles": {"field": "_dl", "percents": [25, 50, 95]}},
            "st": {"stats": {"field": "_dl"}},
        },
    )
    card = aggs["card"].first()["value"]
    assert card == len({r["turn_idx"] for r in matched})
    got = {r["percent"]: r["value"] for r in aggs["pct"].collect()}
    for p in (25, 50, 95):
        assert got[float(p)] == pytest.approx(q_cont(p / 100), abs=1e-9)
    st = aggs["st"].first()
    assert st["count"] == len(dls) and st["min"] == dls[0] and st["max"] == dls[-1]
    assert st["sum"] == sum(dls)
    assert st["avg"] == pytest.approx(sum(dls) / len(dls))
    # approximate variant runs (value sane, not asserted exact)
    _, a2 = eng2.search_with_aggs(
        Q, {"c": {"cardinality": {"field": "turn_idx", "precision_threshold": 0}}}
    )
    assert a2["c"].first()["value"] > 0
    # bad percents rejected
    with pytest.raises(Exception):
        eng2.search_with_aggs(Q, {"p": {"percentiles": {"field": "_dl", "percents": [101]}}})[1][
            "p"
        ].collect()


def test_significant_terms_agg(engine, transcripts):
    matched = _match_rows(transcripts)
    fg_n = len(matched)
    all_rows = transcripts.select("docID", "text", "role").collect()
    bg_n = len(all_rows)

    def sig(fg_counts, bg_counts):
        exp = {}
        for key, fg in fg_counts.items():
            bg = bg_counts[key]
            fgr, bgr = fg / fg_n, bg / bg_n
            if fgr > bgr:
                exp[key] = (fg, bg, (fgr - bgr) * (fgr / bgr))
        return exp

    # text-term significance (postings-backed)
    fg_terms = Counter()
    bg_terms = Counter()
    for r in all_rows:
        toks = set(tokenize_py(r["text"]))
        for t in toks:
            bg_terms[t] += 1
    for r in matched:
        for t in set(tokenize_py(r["text"])):
            fg_terms[t] += 1
    exp = sig(fg_terms, bg_terms)
    _, aggs = engine.search_with_aggs(
        Q, {"sig": {"significant_terms": {"field": "text", "size": 5}}}
    )
    got = [(r["key"], r["doc_count"], r["bg_count"], r["score"]) for r in aggs["sig"].collect()]
    top = sorted(exp.items(), key=lambda kv: (-kv[1][2], kv[0]))[:5]
    assert [(k, v[0], v[1]) for k, v in top] == [(k, d, b) for k, d, b, _ in got]
    for (_, v), (_, _, _, s) in zip(top, got):
        assert s == pytest.approx(v[2], rel=1e-12)
    # the query's own terms dominate the significance ranking
    assert {got[0][0], got[1][0]} == {"merge", "sort"}
    # categorical-field variant
    matched_ids = {r["docID"] for r in matched}
    fg_role = Counter(r["role"] for r in all_rows if r["docID"] in matched_ids)
    bg_role = Counter(r["role"] for r in all_rows)
    exp_r = sig(fg_role, bg_role)
    _, aggs2 = engine.search_with_aggs(
        Q, {"sig": {"significant_terms": {"field": "role", "size": 3}}}
    )
    got_r = {r["key"]: (r["doc_count"], r["bg_count"]) for r in aggs2["sig"].collect()}
    assert got_r == {k: (v[0], v[1]) for k, v in
                     sorted(exp_r.items(), key=lambda kv: (-kv[1][2], kv[0]))[:3]}


# ---------------------------------------------------------------------------
# round-4 wave: histogram / filters / top_hits / composite aggregations
# ---------------------------------------------------------------------------


def test_histogram_agg_gap_fill_and_extended_bounds(engine, transcripts):
    matched = _match_rows(transcripts)
    from collections import Counter as _C

    by_bucket = _C((r["turn_idx"] // 2) * 2 for r in matched)
    _, aggs = engine.search_with_aggs(
        Q, {"h": {"histogram": {"field": "turn_idx", "interval": 2,
                                "min_doc_count": 0,
                                "extended_bounds": {"min": 0, "max": 9}}}}
    )
    got = {int(r["key"]): r["doc_count"] for r in aggs["h"].collect()}
    expected = {k: by_bucket.get(k, 0) for k in (0, 2, 4, 6, 8)}
    assert got == expected


def test_histogram_agg_offset_min_doc_count_1(engine, transcripts):
    import math as _m

    matched = _match_rows(transcripts)
    from collections import Counter as _C

    key = lambda v: _m.floor((v - 1) / 3) * 3 + 1  # noqa: E731
    by_bucket = _C(key(r["turn_idx"]) for r in matched)
    _, aggs = engine.search_with_aggs(
        Q, {"h": {"histogram": {"field": "turn_idx", "interval": 3,
                                "offset": 1, "min_doc_count": 1}}}
    )
    got = {int(r["key"]): r["doc_count"] for r in aggs["h"].collect()}
    assert got == dict(by_bucket)
    assert 0 not in got.values()


def test_histogram_agg_min_doc_count_threshold(engine, transcripts):
    # min_doc_count=2 must DROP buckets whose count is below the threshold
    # (OpenSearch semantics), not merely disable gap-fill (ADVICE r4)
    from collections import Counter as _C

    matched = _match_rows(transcripts)
    by_bucket = _C((r["turn_idx"] // 2) * 2 for r in matched)
    _, aggs = engine.search_with_aggs(
        Q, {"h": {"histogram": {"field": "turn_idx", "interval": 2,
                                "min_doc_count": 2}}}
    )
    got = {int(r["key"]): r["doc_count"] for r in aggs["h"].collect()}
    assert got == {k: c for k, c in by_bucket.items() if c >= 2}
    # sanity: the threshold actually bites on this fixture, else pick Q better
    if any(c < 2 for c in by_bucket.values()):
        assert len(got) < len(by_bucket)


def test_filters_agg_one_pass(engine, transcripts):
    matched = _match_rows(transcripts)
    _, aggs = engine.search_with_aggs(
        Q, {"kinds": {"filters": {"filters": {
            "early": {"range": {"column": "turn_idx", "lt": 3}},
            "late": {"range": {"column": "turn_idx", "gte": 7}},
        }}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["kinds"].collect()}
    assert got == {
        "early": sum(1 for r in matched if r["turn_idx"] < 3),
        "late": sum(1 for r in matched if r["turn_idx"] >= 7),
    }


def test_top_hits_agg_per_group_best(engine, transcripts):
    rows = transcripts.select("docID", "text", "turn_idx").collect()
    docs = {r["docID"]: r["text"] for r in rows}
    scores = oracle.bm25_scores(docs, {"merge": 1.0, "sort": 1.0})
    group_of = {r["docID"]: r["turn_idx"] % 2 for r in rows}
    parity = transcripts.withColumn(
        "par", (transcripts["turn_idx"] % 2).cast("int")
    )
    from neural_search_spark.query.dsl import QueryEngine

    eng2 = QueryEngine(tables=engine.tables, docs=parity)
    _, aggs = eng2.search_with_aggs(
        Q, {"best": {"top_hits": {"group_by": "par", "size": 2}}}
    )
    got = [
        (r["key"], r["rank"], r["docID"])
        for r in aggs["best"].orderBy("key", "rank").collect()
    ]
    expected = []
    for g in (0, 1):
        members = sorted(
            ((d, s) for d, s in scores.items() if group_of[d] == g),
            key=lambda t: (-round(t[1], 12), t[0]),
        )[:2]
        expected += [(g, i + 1, d) for i, (d, _) in enumerate(members)]
    assert got == sorted(expected)


def test_composite_agg_pages_cover_all_buckets(engine, transcripts):
    matched = _match_rows(transcripts)
    from collections import Counter as _C

    buckets = _C((r["turn_idx"],) for r in matched)
    ordered = sorted(buckets)
    spec = {"sources": [{"t": {"terms": {"field": "turn_idx"}}}], "size": 4}
    pages, after = [], None
    while True:
        body = dict(spec)
        if after is not None:
            body["after"] = after
        _, aggs = engine.search_with_aggs(Q, {"p": {"composite": body}})
        rows = aggs["p"].collect()
        if not rows:
            break
        pages += [((r["t"],), r["doc_count"]) for r in rows]
        assert len(rows) <= 4
        after = {"t": rows[-1]["t"]}
    assert [k for k, _ in pages] == ordered
    assert dict(pages) == {k: buckets[k] for k in buckets}


def test_new_agg_validation(engine):
    from neural_search_spark.query.dsl import QueryValidationError

    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"h": {"histogram": {"field": "turn_idx",
                                                        "interval": 0}}})
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"f": {"filters": {"filters": {}}}})
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"t": {"top_hits": {"group_by": "nope"}}})
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"c": {"composite": {"sources": []}}})
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(
            Q, {"c": {"composite": {
                "sources": [{"t": {"terms": {"field": "turn_idx"}}}],
                "after": {}}}}
        )


def test_terms_agg_size_order_missing(engine, transcripts):
    from collections import Counter as _C
    from pyspark.sql import functions as F

    from neural_search_spark.query.dsl import QueryEngine, QueryValidationError

    matched = {r["docID"] for r in _match_rows(transcripts)}
    # docs with a NULLABLE key: role nulled for docID % 5 == 0
    docs = transcripts.withColumn(
        "role2", F.when(F.col("docID") % 5 == 0, None).otherwise(F.col("role"))
    )
    eng = QueryEngine(tables=engine.tables, docs=docs)
    rows = docs.select("docID", "role2").collect()
    key_of = {r["docID"]: r["role2"] for r in rows}
    counts = _C(key_of[d] for d in matched if key_of[d] is not None)

    # default: NULL keys dropped (OpenSearch semantics without `missing`)
    _, aggs = eng.search_with_aggs(Q, {"r": {"terms": {"field": "role2"}}})
    got = {r["key"]: r["doc_count"] for r in aggs["r"].collect()}
    assert got == dict(counts)

    # missing= buckets the NULLs under the stand-in
    n_null = sum(1 for d in matched if key_of[d] is None)
    _, aggs = eng.search_with_aggs(
        Q, {"r": {"terms": {"field": "role2", "missing": "N/A"}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["r"].collect()}
    assert got == {**counts, "N/A": n_null}

    # size + count order: top-1 bucket by doc_count desc, key asc
    _, aggs = eng.search_with_aggs(
        Q, {"r": {"terms": {"field": "role2", "size": 1}}}
    )
    top = aggs["r"].collect()
    best = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0]
    assert [(r["key"], r["doc_count"]) for r in top] == [best]

    # key order
    _, aggs = eng.search_with_aggs(
        Q, {"r": {"terms": {"field": "role2", "size": 2, "order": "key"}}}
    )
    assert [r["key"] for r in aggs["r"].collect()] == sorted(counts)[:2]

    with pytest.raises(QueryValidationError):
        eng.search_with_aggs(
            Q, {"r": {"terms": {"field": "role2", "size": 1, "order": "nope"}}}
        )


def test_missing_and_weighted_avg_aggs(engine, transcripts):
    from pyspark.sql import functions as F

    from neural_search_spark.query.dsl import QueryEngine, QueryValidationError

    matched = {r["docID"] for r in _match_rows(transcripts)}
    docs = transcripts.withColumn(
        "opt", F.when(F.col("docID") % 4 == 0, None)
                .otherwise(F.col("turn_idx").cast("double"))
    ).withColumn(
        "w", F.when(F.col("docID") % 3 == 0, None)
              .otherwise((F.col("docID") % 5 + 1).cast("double"))
    )
    eng = QueryEngine(tables=engine.tables, docs=docs)
    rows = {r["docID"]: r for r in docs.select("docID", "opt", "w").collect()}

    _, aggs = eng.search_with_aggs(Q, {"m": {"missing": {"field": "opt"}}})
    n_null = sum(1 for d in matched if rows[d]["opt"] is None)
    assert aggs["m"].first()["doc_count"] == n_null

    _, aggs = eng.search_with_aggs(
        Q, {"wa": {"weighted_avg": {"value": {"field": "opt"},
                                    "weight": {"field": "w"}}}}
    )
    num = den = 0.0
    for d in matched:
        v, w = rows[d]["opt"], rows[d]["w"]
        if v is None:
            continue
        w = 1.0 if w is None else w
        num += v * w
        den += w
    assert aggs["wa"].first()["value"] == pytest.approx(num / den, rel=1e-12)

    with pytest.raises(QueryValidationError):
        eng.search_with_aggs(Q, {"wa": {"weighted_avg": {"value": {"field": "opt"}}}})


def test_adjacency_matrix_agg(engine, transcripts):
    from neural_search_spark.query.dsl import QueryValidationError

    matched = _match_rows(transcripts)
    early = {r["docID"] for r in matched if r["turn_idx"] < 5}
    late = {r["docID"] for r in matched if r["turn_idx"] >= 5}
    odd = {r["docID"] for r in matched if r["turn_idx"] % 2 == 1}
    _, aggs = engine.search_with_aggs(
        Q, {"adj": {"adjacency_matrix": {"filters": {
            "early": {"range": {"column": "turn_idx", "lt": 5}},
            "late": {"range": {"column": "turn_idx", "gte": 5}},
            "odd": {"in": ["turn_idx", [1, 3, 5, 7, 9]]},
        }}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["adj"].collect()}
    expected = {
        "early": len(early), "late": len(late), "odd": len(odd),
        "early&odd": len(early & odd), "late&odd": len(late & odd),
    }
    # early&late is empty by construction → omitted
    expected = {k: v for k, v in expected.items() if v > 0}
    assert got == expected
    assert "early&late" not in got
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"adj": {"adjacency_matrix": {"filters": {}}}})


def test_date_range_agg(engine, transcripts):
    from datetime import datetime

    from neural_search_spark.query.dsl import QueryValidationError

    matched = _match_rows(transcripts)
    cut = "2024-01-01 06:00:00"
    cut_dt = datetime(2024, 1, 1, 6)
    _, aggs = engine.search_with_aggs(
        Q, {"dr": {"date_range": {"field": "ts", "ranges": [
            {"to": cut}, {"from": cut}]}}}
    )
    got = {r["key"]: r["doc_count"] for r in aggs["dr"].collect()}
    assert got == {
        f"*-{cut}": sum(1 for r in matched if r["ts"] < cut_dt),
        f"{cut}-*": sum(1 for r in matched if r["ts"] >= cut_dt),
    }
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(
            Q, {"dr": {"date_range": {"field": "turn_idx",
                                      "ranges": [{"to": cut}]}}}
        )


def test_percentile_ranks_agg(engine, transcripts):
    from neural_search_spark.query.dsl import QueryValidationError

    matched = _match_rows(transcripts)
    vals = [2.0, 5.0, 9.0]
    _, aggs = engine.search_with_aggs(
        Q, {"pr": {"percentile_ranks": {"field": "turn_idx", "values": vals}}}
    )
    got = {r["value"]: r["percent"] for r in aggs["pr"].collect()}
    n = len(matched)
    for v in vals:
        exp = 100.0 * sum(1 for r in matched if r["turn_idx"] <= v) / n
        assert got[v] == pytest.approx(exp, rel=1e-12)
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(
            Q, {"pr": {"percentile_ranks": {"field": "turn_idx", "values": []}}}
        )


def test_global_agg_ignores_query(engine, transcripts):
    from neural_search_spark.query.dsl import QueryValidationError

    n_all = transcripts.count()
    _, aggs = engine.search_with_aggs(
        Q, {"everything": {"global": {"agg": {"count": {"field": "docID"}}}},
            "matched": {"count": {"field": "docID"}}}
    )
    assert aggs["everything"].first()["value"] == n_all
    assert aggs["matched"].first()["value"] == len(_match_rows(transcripts))
    assert aggs["matched"].first()["value"] < n_all
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(Q, {"g": {"global": {}}})
    # global-in-global would recurse without bound — must be validation, not
    # RecursionError (ADVICE r4). Inner agg is a bare {kind: body} dict.
    with pytest.raises(QueryValidationError):
        engine.search_with_aggs(
            Q, {"g": {"global": {"agg": {"global": {
                "agg": {"count": {"field": "docID"}}}}}}}
        )


def test_agg_missing_required_keys_raise_validation(engine):
    from neural_search_spark.query.dsl import QueryValidationError

    with pytest.raises(QueryValidationError):  # histogram without interval
        engine.search_with_aggs(Q, {"h": {"histogram": {"field": "turn_idx"}}})
    with pytest.raises(QueryValidationError):  # range without ranges
        engine.search_with_aggs(Q, {"r": {"range": {"field": "turn_idx"}}})
    with pytest.raises(QueryValidationError):  # date_range without ranges
        engine.search_with_aggs(Q, {"r": {"date_range": {"field": "ts"}}})
