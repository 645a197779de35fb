from neural_search_spark.analysis.tokenizer import (  # noqa: F401
    TOKEN_PATTERN,
    tokenize_col,
    tokenize_py,
    tokenizer_hash,
)
