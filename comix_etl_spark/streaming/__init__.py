"""Structured-streaming variants of the batch DAG (SURVEY.md §2.9/§7).

The reference is batch-only; streaming is the engine extension: the same
normalize→merge plans under readStream, with watermarked event-time
windows and foreachBatch merge for exactly-once-ish sinks.
"""

from comix_etl_spark.streaming.windowed import (  # noqa: F401
    stream_windowed_counts,
    run_stream_to_memory,
    foreach_batch_upsert,
)
