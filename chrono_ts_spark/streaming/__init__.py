"""Structured Streaming surface (SURVEY.md §2.9 ST1–ST7).

Streams are verified by batch-equivalence (§5.4): every streaming
aggregation replayed with trigger(availableNow=True) over the static
events parquet must produce exactly the batch result of the same
logic, which is itself DuckDB-oracled. DuckDB can't replay streams, so
these register as rows-only queries with pytest equivalence tests.
"""

from .replay import (
    replay_events_stream,
    run_sessionized_stream,
    run_stateful_dedup_stream,
    run_tumbling_counts_stream,
)

__all__ = [
    "replay_events_stream",
    "run_sessionized_stream",
    "run_stateful_dedup_stream",
    "run_tumbling_counts_stream",
]
