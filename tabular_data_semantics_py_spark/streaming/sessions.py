"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the streaming form of
entry_queries.events_sessions, which the reference models only as
batch resume — SURVEY.md §2.10).

Semantics (pinned to the batch query): a session is a maximal run of a
user's events where consecutive gaps are ≤ ``gap_min`` minutes.

State machine per user_id:
- in-batch: events sorted by (ts, event_id); a gap > ``gap_min``
  closes the current session (emitted immediately) and opens a new one
- across batches: the open session persists in state;
  ``EventTimeTimeout`` set to last_ts + gap closes it once the
  watermark passes (late events beyond the watermark are dropped by
  the engine, exactly the bounded-state contract)

Scale: state is one fixed-width row per active user (three longs), the
grouping key is the natural partitioning key, and each micro-batch
task processes its users' events as Arrow batches — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id string, session_start long, session_end long, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_MS = 10**6  # pandas datetime64[ns] → ms divisor is 1e6


def _epoch_ms(series):
    import pandas as pd

    # pin to ns resolution first: pandas 2.x preserves the source unit
    # (parquet is us, Arrow batches are ns), and int64-of-us // 1e6
    # would silently yield seconds
    return (
        pd.to_datetime(series).astype("datetime64[ns]").astype("int64")
        // _MS
    ).astype("int64")


def make_sessionizer(gap_min: int = 30):
    """Returns the (key, pdf_iter, state) function for
    ``applyInPandasWithState``; split out so unit tests can drive the
    state machine directly."""
    gap_ms = gap_min * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        user_id = key[0]

        def rows(closed):
            return pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": s,
                        "session_end": e,
                        "n_events": n,
                    }
                    for (s, e, n) in closed
                ]
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield rows([(start, last, n)])
            return

        ts = []
        for pdf in pdfs:
            ts.append(_epoch_ms(pdf["ts"]))
        ts = sorted(pd.concat(ts).tolist()) if ts else []

        cur = state.get if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_ms:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[1] + gap_ms)
        if closed:
            yield rows(closed)

    return fn


def sessionize_stream(
    events: DataFrame, gap_min: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """events stream (user_id, ts, ...) → closed sessions
    (user_id, session_start ms, session_end ms, n_events)."""
    with_ts = events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn("user_id", F.col("user_id").cast("string"))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_min),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
