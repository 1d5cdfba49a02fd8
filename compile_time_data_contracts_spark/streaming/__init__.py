"""Structured Streaming surface: event-time windows, watermarks,
stateful dedup, arbitrary-stateful operators."""

from .stateful import running_user_totals
from .windows import (
    dedup_within_watermark,
    events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "running_user_totals",
    "dedup_within_watermark",
    "events_stream",
    "run_stream_to_memory",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
]
