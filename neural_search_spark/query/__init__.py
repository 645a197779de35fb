from neural_search_spark.query.bm25 import bm25_score_col, bm25_topk, idf_col  # noqa: F401
