"""Streaming ingestion.

``microbatch``: Structured Streaming file source with
``Trigger.AvailableNow`` + ``foreachBatch`` CDC apply — Spark's native
only-new-files incremental mode (checkpoint replaces the file ledger).
"""

from .microbatch import cdc_stream_available_now

__all__ = ["cdc_stream_available_now"]
