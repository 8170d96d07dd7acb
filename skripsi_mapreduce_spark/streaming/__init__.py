"""Structured Streaming surface (extension ST1, SURVEY.md §2.5)."""

from .windows import (  # noqa: F401
    sessionized_counts,
    stream_events,
    tumbling_counts,
    run_to_memory_sink,
)
