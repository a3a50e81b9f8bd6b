from index_search_monorepo_spark.streaming.incremental import (  # noqa: F401
    SPANS_SCHEMA,
    incremental_extraction,
    read_spans_stream,
    windowed_ingest_metrics,
)
