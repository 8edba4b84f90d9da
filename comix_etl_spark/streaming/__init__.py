"""Structured-streaming variants of the batch DAG (SURVEY.md §2.9/§7).

The reference is batch-only; streaming is the engine extension: the same
normalize→merge plans under readStream, with watermarked event-time
windows, keyed state (applyInPandasWithState), stream-stream interval
joins, and foreachBatch merge for exactly-once-ish sinks.
"""

from comix_etl_spark.streaming.joins import stream_interval_join  # noqa: F401
from comix_etl_spark.streaming.stateful import sessionize_stateful  # noqa: F401
from comix_etl_spark.streaming.windowed import (  # noqa: F401
    foreach_batch_upsert,
    run_stream_to_memory,
    stream_windowed_counts,
)
