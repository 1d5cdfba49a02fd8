"""Typed IO: format-generic contract-pinned sources/sinks + bucketing."""

from .bucketing import bucketed_join_ready, write_bucketed
from .io import Sink, Source, read_df, write_df

__all__ = [
    "bucketed_join_ready",
    "write_bucketed",
    "Sink",
    "Source",
    "read_df",
    "write_df",
]
