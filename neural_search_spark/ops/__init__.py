"""Training-data pipeline operators over document tables.

All operators are declarative DataFrame dataflow (JVM-side expressions,
codegen'd); Python appears only inside vectorized pandas UDFs. Every
operator is paired with an ANSI-SQL oracle in ``__spark_entry__.py``.
"""

from neural_search_spark.ops.text import (  # noqa: F401
    hash60,
    lang_id,
    quality_features,
    repetition_features,
    token_count,
    content_fingerprint,
)
from neural_search_spark.ops.dedup import (  # noqa: F401
    dedup_exact,
    doc_shingles,
    minhash_lsh_pairs,
    ngram_contamination,
    ngram_jaccard_pairs,
    shingle_col,
    simhash,
    simhash_pairs,
)
from neural_search_spark.ops.chunking import (  # noqa: F401
    chunk_delimiter,
    chunk_fixed_token_length,
)
from neural_search_spark.ops.similarity import (  # noqa: F401
    cosine_int8_topk,
    cosine_topk,
    lsh_cosine_topk,
    quantize_embeddings_int8,
)
from neural_search_spark.ops.sampling import (  # noqa: F401
    hash_sample,
    mixture_sample,
    pack_sequences,
    stratified_sample,
)
