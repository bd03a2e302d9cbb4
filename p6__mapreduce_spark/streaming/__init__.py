from p6__mapreduce_spark.streaming.windows import (
    stream_event_counts,
    windowed_event_counts,
)

__all__ = ["windowed_event_counts", "stream_event_counts"]
