from glaredb_spark.streaming.events import (
    hopping_counts,
    read_events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)
from glaredb_spark.streaming.stateful import running_user_totals

__all__ = [
    "hopping_counts",
    "read_events_stream",
    "run_to_memory",
    "session_counts",
    "tumbling_counts",
    "running_user_totals",
]
