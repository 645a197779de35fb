from neural_search_spark.index.build import (  # noqa: F401
    IndexTables,
    build_doclens,
    build_index_tables,
    build_postings,
    build_term_stats,
    collection_meta,
)
