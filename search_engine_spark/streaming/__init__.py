from search_engine_spark.streaming.ingest import (  # noqa: F401
    finalize_stream_index,
    stream_ingest,
)
