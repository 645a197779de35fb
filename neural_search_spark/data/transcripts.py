"""Deterministic transcripts synthesizer (BASELINE.json input_hint shape).

Schema: conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp — one row per conversation turn; document unit = one turn.

Generation is a pure function of (row index, seed): texts are built from a
fixed vocabulary with a Zipf-like rank-frequency law (head terms like
"the"/"a" dominate — exercising the term-skew path), plus one per-turn unique
token ``tok{docID}`` used by the per-turn text-equality invariant test.
Distributed via ``spark.range`` — generation itself scales to any row count
with no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# fixed vocabulary, rank-ordered: P(rank r) ∝ 1/(r+1) (Zipf-ish)
VOCAB = (
    "the a of to and in data spark query index search token term doc score "
    "rank join merge sort filter group count sum user agent tool call run "
    "result error retry plan step code test file read write list map key "
    "value table row column batch stream state time event log trace span "
    "node edge graph tree heap stack queue hash block page seek scan cache"
).split()

ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "search", None]

_EPOCH = "2024-01-01 00:00:00"


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    turns_per_conv: int = 10,
    seed: int = 42,
    tokens_per_turn: int = 24,
    partitions: int | None = None,
    min_tokens: int | None = None,
    burstiness: float = 0.0,
    vocab_size: int | None = None,
) -> DataFrame:
    """Deterministic transcripts DataFrame; ~tokens_per_turn Zipf tokens per
    turn + one unique token per turn. Pure column expressions — the text for
    global row i is a function of (i, seed) only, independent of partitioning.

    Defaults reproduce the original fixture byte-for-byte. Three optional
    realism knobs (for block-max pruning benchmarks, where per-block score
    variance matters):
    - `min_tokens`: per-turn token count varies deterministically in
      [min_tokens, tokens_per_turn] → document-length variance → BM25
      length-norm variance across posting blocks;
    - `burstiness` p: each non-leading slot repeats the turn's first word
      with probability ~p → heavy within-doc term repetition → tf variance;
    - `vocab_size` V: replaces the 70-word fixture vocabulary with synthetic
      terms w1..wV drawn Zipf(s≈1) via inverse-CDF (rank = ⌊exp(u·lnV)⌋) —
      a realistic rank-frequency law with a deep idf spread (the fixture
      vocabulary is bimodal: every term is effectively a head term, which
      makes multi-term block-max pruning trivially 0%).
    """
    n = n_convs * turns_per_conv
    df = spark.range(0, n, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    conv = F.format_string("conv%08d", (i / turns_per_conv).cast("long"))
    turn = (i % turns_per_conv).cast("int")

    # Zipf-ish term pick: for slot j, rank = (mix(i, j, seed) % H) mapped
    # through a harmonic-ish curve; keep it integer arithmetic for exact
    # reproducibility in any engine.
    v = len(VOCAB)
    words = []
    for j in range(tokens_per_turn):
        h = F.abs(F.hash(i * F.lit(2654435761), F.lit(j), F.lit(seed)))
        if vocab_size is not None:
            import math as _math

            # Zipf(s≈1) inverse-CDF over w1..wV: u uniform in [0,1) →
            # rank = ⌊exp(u·lnV)⌋ has P(rank=r) ≈ 1/(r·lnV)
            u = (h % F.lit(1 << 24)).cast("double") / F.lit(float(1 << 24))
            rank = F.least(
                F.lit(vocab_size), F.floor(F.exp(u * F.lit(_math.log(vocab_size)))).cast("long")
            )
            word = F.format_string("w%d", rank)
        else:
            # map uniform h to Zipf-like rank: rank = h % (1 + h % v) biases low ranks
            rank = (h % (F.lit(1) + (h % v))) % v
            word = F.element_at(F.array(*[F.lit(w) for w in VOCAB]), rank + 1)
        if burstiness > 0.0 and j > 0:
            hb = F.abs(F.hash(i * F.lit(97), F.lit(j), F.lit(seed), F.lit(1315423911)))
            word = F.when((hb % 1000) < int(burstiness * 1000), words[0]).otherwise(word)
        words.append(word)
    if min_tokens is not None:
        if not 1 <= min_tokens <= tokens_per_turn:
            raise ValueError("min_tokens must be in [1, tokens_per_turn]")
        hlen = F.abs(F.hash(i * F.lit(40503), F.lit(seed), F.lit(7)))
        length = F.lit(min_tokens) + (hlen % F.lit(tokens_per_turn - min_tokens + 1))
        arr = F.slice(F.array(*words), 1, length)
        text = F.concat_ws(" ", F.array_join(arr, " "), F.format_string("tok%d", i))
    else:
        text = F.concat_ws(" ", *words, F.format_string("tok%d", i))

    return df.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), (i % 3 + 1).cast("int")).alias("role"),
        text.alias("text"),
        F.element_at(F.array(F.lit("bash"), F.lit("search"), F.lit(None).cast("string")), (i % 3 + 1).cast("int")).alias("tool"),
        (F.to_timestamp(F.lit(_EPOCH)) + F.make_interval(secs=i.cast("double"))).alias("ts"),
    )
