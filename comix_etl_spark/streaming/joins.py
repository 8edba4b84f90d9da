"""Watermarked stream-stream interval join (SURVEY.md §7 streaming
extensions) — the third leg of the streaming trio next to windowed
aggregation (windowed.py) and keyed state (stateful.py).

Spark buffers both sides in state and emits matches as they become
possible; the watermarks + the time-bound join condition are what let
it EVICT state — without them the buffers grow forever. State held per
side ≈ watermark horizon × arrival rate, independent of stream length:
the property that makes a 24/7 join viable at 100 TB/day.

Batch/stream parity: the same join condition over static DataFrames is
the oracle (an interval theta-join), so one availableNow pass must
reproduce the batch result exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, *, key: str,
                         left_ts: str, right_ts: str,
                         within: str = "1 hour",
                         watermark: str = "2 hours",
                         how: str = "inner") -> DataFrame:
    """Join right rows to left rows of the same ``key`` with
    ``left_ts <= right_ts <= left_ts + within``.

    ``left_ts`` and ``right_ts`` must be DISTINCT column names (rename
    before calling) — the joined row carries both. Works on batch
    DataFrames too (watermark is a no-op there), which is what the
    parity oracle exploits.

    ``how="left_outer"`` additionally emits null-padded left rows that
    found no match — but ONLY once the watermark passes ``left_ts +
    within`` (that is when the engine can PROVE no match is coming).
    Consequence: rows newer than (max event time − watermark − within)
    are still held in state when a finite run ends and never emit as
    unmatched, so batch parity for outer results holds on the
    bounded-lag region ``left_ts < max_ts − watermark − within`` only —
    compare there (the registry's stream_outer_join does exactly that).
    """
    if left_ts == right_ts:
        raise ValueError("rename the event-time columns to distinct names first")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, not {how!r}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def stream_static_enrich(stream: DataFrame, dim: DataFrame, *, key_stream: str,
                         key_dim: str, group_col: str,
                         value_col: str = "value") -> DataFrame:
    """Stream-static broadcast enrichment + running per-group rollup —
    the fourth streaming pattern next to windowed/stateful/stream-stream:
    a 24/7 event stream decorated from a slowly-changing dimension.

    The dim side is a plain batch DataFrame: Spark re-resolves it each
    micro-batch (so a dim refresh is picked up on the next trigger) and
    broadcasts it — the stream side never shuffles for the join, and no
    join state is held at all (unlike stream-stream). The only state is
    the tiny per-group running aggregate. Batch parity: the identical
    join+agg over static frames is the oracle.
    """
    enriched = stream.join(
        F.broadcast(dim),
        F.col(key_stream) == F.col(key_dim), "inner")
    return (enriched.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,4)"))
                  .cast("double").alias("total_value")))
