from otel_arrow_spark.streaming.pipeline import (
    TRANSCRIPT_SCHEMA,
    conversation_sessions,
    exactly_once_batch_sink,
    read_transcript_stream,
    stream_pipeline,
    streaming_dedup,
    streaming_enrich,
    streaming_interval_join,
    streaming_histogram_points,
    windowed_sink_counts,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "conversation_sessions",
    "exactly_once_batch_sink",
    "read_transcript_stream",
    "stream_pipeline",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_interval_join",
    "streaming_histogram_points",
    "windowed_sink_counts",
]
