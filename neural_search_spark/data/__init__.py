from neural_search_spark.data.docids import assign_doc_ids  # noqa: F401
from neural_search_spark.data.transcripts import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    synthesize_transcripts,
)
