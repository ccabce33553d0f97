from kafana_spark.streaming.pipeline import (  # noqa: F401
    ingest_stream, sessionize, windowed_counts,
)
