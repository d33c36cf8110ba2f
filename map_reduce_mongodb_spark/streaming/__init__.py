from map_reduce_mongodb_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    session_counts,
    sliding_avg,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_avg",
    "session_counts",
    "run_to_memory_sink",
]
