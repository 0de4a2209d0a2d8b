from firebase_etl_spark.streaming.events import (
    read_events_stream,
    streaming_dedup,
    streaming_event_counts,
    streaming_sessionization,
)

__all__ = [
    "read_events_stream",
    "streaming_dedup",
    "streaming_event_counts",
    "streaming_sessionization",
]
