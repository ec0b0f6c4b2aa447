"""Structured Streaming support: stream sources/sinks as flow actions plus
watermarked windowing, stream sessionization, and custom stateful
operators.

The reference is batch-only (SURVEY §2.10) — capability parity comes from
Spark itself; this module packages the idioms so a flow can mix streaming
and batch actions: ``readStream`` sources behind labels, transformations
as ordinary DataFrame ops (streaming frames compose through ``transform``/
``sql`` unchanged), and sinks that run a query to completion with the
``availableNow`` trigger (incremental batch) or hand back a live query.
"""

from .ops import (
    sessionize_stream,
    stateful_running_totals,
    stream_stream_interval_join,
    watermarked_window_agg,
)
from .actions import (open_file_stream, write_file_stream,
                      write_memory_stream, write_stream_to_audit_table)

__all__ = [
    "watermarked_window_agg", "sessionize_stream", "stateful_running_totals",
    "stream_stream_interval_join",
    "open_file_stream", "write_file_stream", "write_memory_stream",
    "write_stream_to_audit_table",
]
