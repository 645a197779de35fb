from neural_search_spark.sources.transcripts import read_transcripts  # noqa: F401
