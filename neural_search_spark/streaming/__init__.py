from neural_search_spark.streaming.ingest import StreamingIndexer  # noqa: F401
