"""Custom stateful streaming operator: per-user session assembly via
``applyInPandasWithState`` (SURVEY.md §7 streaming extensions).

The batch ``sessionize`` (operators/relational.py) is a lag+cumsum
window; a live stream can't window over history it hasn't seen, so the
streaming form keeps per-user state — (last event time, open-session
id/start/count) — and folds each micro-batch into it:

- events whose gap from the previous exceeds the threshold CLOSE the
  open session (emitted with ``is_open = false``);
- the still-open session is emitted every batch as a snapshot
  (``is_open = true``, update output mode) so downstream always sees
  the current picture.

Batch/stream parity contract (tested + oracle-checked): one
``availableNow`` pass over a static directory emits exactly the batch
sessionization's per-session aggregate, with the final session per user
flagged open.

Scale notes: state is one fixed-size tuple per ACTIVE user (bounded by
the entity population, not the event volume); each micro-batch shuffles
only on user_id, and Arrow batches the group data both ways. At 100 TB
of events this is the standard keyed-state pattern — pair it with a
state-store TTL (GroupStateTimeout) in a true 24/7 deployment to expire
dormant users; the availableNow form needs no timeout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = ("user_id long, session_id int, start_ts timestamp, "
                  "end_ts timestamp, n_events long, is_open boolean")
_STATE_SCHEMA = "last_us long, session_id int, start_us long, n_events long"


def sessionize_stateful(events: DataFrame, *, user_col: str = "user_id",
                        ts_col: str = "ts", gap_minutes: int = 30,
                        timeout_minutes: int | None = None) -> DataFrame:
    """Apply the stateful sessionizer to a STREAMING DataFrame keyed by
    ``user_col``. Works on the batch engine too (state starts empty per
    group), which is what the parity test exploits.

    ``timeout_minutes`` arms an EVENT-TIME TIMEOUT (the 24/7 operation
    the module docstring promises): when the stream's watermark passes
    ``last event + timeout``, the user's open session CLOSES and its
    state is REMOVED — without it, a user who goes silent forever holds
    state forever and their last session never emits closed. Requires
    the caller to set ``withWatermark`` on the stream (Spark enforces
    this); timed-out groups are invoked with no data and
    ``state.hasTimedOut`` set."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state):
        (user,) = key
        if timeout_minutes and state.hasTimedOut:
            last_us, sid, start_us, n = state.get
            state.remove()
            out = pd.DataFrame(
                [(user, sid, start_us, last_us, n, False)],
                columns=["user_id", "session_id", "start_us", "end_us",
                         "n_events", "is_open"])
            out["start_ts"] = pd.to_datetime(out.pop("start_us"), unit="us")
            out["end_ts"] = pd.to_datetime(out.pop("end_us"), unit="us")
            yield out[["user_id", "session_id", "start_ts", "end_ts",
                       "n_events", "is_open"]]
            return
        if state.exists:
            last_us, sid, start_us, n = state.get
        else:
            last_us, sid, start_us, n = None, 0, None, 0
        closed = []
        ts_values = []
        for pdf in pdfs:
            # dropna BEFORE folding: a NULL ts becomes NaT whose .value
            # is int64-min ns — it would open a session at -2^63/1000 µs
            # and overflow back to datetime on emit (OutOfBoundsDatetime
            # crashes the whole streaming query)
            ts_values.extend(int(t.value) // 1000
                             for t in pd.to_datetime(pdf[ts_col]).dropna())
        for us in sorted(ts_values):
            if last_us is None or us - last_us > gap_us:
                if last_us is not None:
                    closed.append((user, sid, start_us, last_us, n, False))
                sid += 1
                start_us, n = us, 0
            n += 1
            # max(): a cross-micro-batch LATE event (us < the state's
            # last_us) must not rewind the gap clock — it joins the open
            # session but keeps end_ts/gap anchored at the newest event
            last_us = us if last_us is None else max(last_us, us)
        if last_us is not None:
            # open-session snapshot: emitted every batch in update mode
            closed.append((user, sid, start_us, last_us, n, True))
            state.update((last_us, sid, start_us, n))
            if timeout_minutes:
                # event-time timeout is set in MILLISECONDS; fires once
                # the watermark passes it. Spark rejects a timestamp at
                # or below the current watermark (IllegalArgumentException),
                # reachable when an accepted-late event's ts + timeout
                # already trails the watermark (watermark delay > timeout,
                # or backlog catch-up) — clamp to watermark + 1 ms so the
                # state times out on the next watermark advance instead of
                # crashing the query.
                ts_ms = (last_us + timeout_minutes * 60 * 1_000_000) // 1000
                state.setTimeoutTimestamp(
                    max(ts_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            out = pd.DataFrame(closed, columns=[
                "user_id", "session_id", "start_us", "end_us", "n_events", "is_open"])
            out["start_ts"] = pd.to_datetime(out.pop("start_us"), unit="us")
            out["end_ts"] = pd.to_datetime(out.pop("end_us"), unit="us")
            yield out[["user_id", "session_id", "start_ts", "end_ts", "n_events", "is_open"]]

    timeout_conf = (GroupStateTimeout.EventTimeTimeout if timeout_minutes
                    else GroupStateTimeout.NoTimeout)
    return (events.groupBy(F.col(user_col))
            .applyInPandasWithState(fold, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "update", timeout_conf))
