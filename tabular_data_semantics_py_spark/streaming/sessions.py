"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the streaming form of
entry_queries.events_sessions, which the reference models only as
batch resume — SURVEY.md §2.10).

Semantics (pinned to the batch query): a session is a maximal run of a
user's events where consecutive gaps are ≤ ``gap_min`` minutes — over
the user's events sorted by event time, regardless of arrival order
across micro-batches (late events within the watermark horizon land in
the right session; events older than the watermark are dropped by the
engine, the bounded-state contract).

State machine per user_id — *session fragments*, not raw events:
state holds the user's open fragments ``(start, end, n)``. Interval
merging of fragments under the gap rule is EXACT for gap
sessionization: a fragment is a valid run, so any event that lands
inside a fragment's ``[start, end]`` is within ``gap`` of the two run
events that bracket it, and an event within ``gap`` of a fragment
boundary is within ``gap`` of the boundary event itself. Hence
buffering ``(start, end, n)`` triples loses nothing relative to
buffering every timestamp, and state stays O(open fragments per user)
— typically 1-2 fixed-width rows — instead of O(events in the
watermark horizon).

A fragment is emitted only once the watermark passes ``end + gap``:
no event that could still arrive (ts > watermark) can merge into it,
so emitted sessions are final — the append-mode contract. Emission
happens either when a data batch advances the watermark or via the
event-time timer set at the earliest open ``end + gap``.

Hot-key bound (VERDICT r05 #5, evaluated r6): state is keyed by the
raw user_id, so ALL of a hot key's per-batch rows land in one state
partition's task — but the per-batch work there is O(rows-in-batch)
merge-into-fragments, NOT an all-history sort: the fragment-merging
state machine already is the device that bounds hot-key state (O(open
fragments), independent of event count), and what remains unbounded
is only the single-task share of each micro-batch's arrivals for that
key — an ingest-partitioning property (one Kafka partition per key
has the same bound upstream). The batch bucket-split device does NOT
port: its pass-2 fragment chaining needs every bucket of a key in the
same job, while a stream sees buckets (time ranges) across different
micro-batches — which is exactly what the fragment state machine
already implements incrementally. A hot key whose per-batch volume
overwhelms one task is handled upstream by ingest salting
(user_id, shard) + a tiny second ``foreachBatch`` merge of the ≤ 2
boundary fragments per shard — the batch device's pass-2 verbatim;
documented rather than built because the bound it would improve is
per-batch, not per-history, and the existing stream≡batch proofs pin
the unsharded form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id string, session_start long, session_end long, n_events long"
)
# parallel arrays of open fragments, sorted by start
STATE_SCHEMA = "starts array<long>, ends array<long>, ns array<long>"

_MS = 10**6  # pandas datetime64[ns] → ms divisor is 1e6


def _epoch_ms(series, tz: str = "UTC"):
    import pandas as pd

    # pin to ns resolution first: pandas 2.x preserves the source unit
    # (parquet is us, Arrow batches are ns), and int64-of-us // 1e6
    # would silently yield seconds
    s = pd.to_datetime(series)
    if s.dt.tz is None:
        # applyInPandasWithState delivers event time to pandas as
        # SESSION-TIMEZONE-LOCAL naive values, while
        # getCurrentWatermarkMs() is true UTC epoch ms — localize
        # before converting so the two are comparable in ANY session
        # timezone, not just UTC (ambiguous DST folds take the DST
        # side; nonexistent spring-forward instants shift forward —
        # both deterministic)
        s = s.dt.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
    return (
        s.dt.tz_convert("UTC")
        .astype("datetime64[ns, UTC]")
        .astype("int64")
        // _MS
    ).astype("int64")


def _merge_fragments(frags: list, gap_ms: int) -> list:
    """Merge (start, end, n) fragments under the gap rule; input need
    not be sorted; output sorted by start."""
    out: list = []
    for s, e, n in sorted(frags):
        if out and s - out[-1][1] <= gap_ms:
            ps, pe, pn = out[-1]
            out[-1] = (ps, max(pe, e), pn + n)
        else:
            out.append((s, e, n))
    return out


def make_sessionizer(gap_min: int = 30, tz: str = "UTC"):
    """Returns the (key, pdf_iter, state) function for
    ``applyInPandasWithState``; split out so unit tests can drive the
    state machine directly. ``tz``: the Spark session timezone the
    incoming naive timestamps are expressed in (see ``_epoch_ms``)."""
    gap_ms = gap_min * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        user_id = key[0]

        frags: list = []
        if state.exists:
            starts, ends, ns = state.get
            frags = list(zip(starts, ends, ns))
        # on a timer firing, pdfs is empty — same code path, the
        # advanced watermark below does the closing
        for pdf in pdfs:
            frags.extend(
                (t, t, 1) for t in _epoch_ms(pdf["ts"], tz).tolist()
            )
        frags = _merge_fragments(frags, gap_ms)

        wm = state.getCurrentWatermarkMs()
        closed = [f for f in frags if f[1] + gap_ms < wm]
        open_ = [f for f in frags if f[1] + gap_ms >= wm]

        if open_:
            state.update((
                [f[0] for f in open_],
                [f[1] for f in open_],
                [f[2] for f in open_],
            ))
            # fire when the watermark passes the earliest closable
            # fragment; must be strictly beyond the current watermark
            state.setTimeoutTimestamp(max(open_[0][1] + gap_ms, wm + 1))
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
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

    return fn


def sessionize_stream(
    events: DataFrame, gap_min: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """events stream (user_id, ts, ...) → closed sessions
    (user_id, session_start ms, session_end ms, n_events)."""
    with_ts = events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn("user_id", F.col("user_id").cast("string"))
    tz = (
        events.sparkSession.conf.get("spark.sql.session.timeZone")
        or "UTC"
    )
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_min, tz),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Batch gap sessionization with the SAME output schema as
    ``sessionize_stream`` — per-session rows via a lag window + run-id
    cumsum. Used by the batch≡streaming equivalence test; the
    entry-query ``events_sessions`` is the per-user rollup of this."""
    gap_ms = gap_min * 60 * 1000
    from pyspark.sql.window import Window

    # unix_millis of the INSTANT (cast ts as timestamp resolves a
    # string in the session timezone, exactly like the stream path's
    # cast) — NOT a timestamp_ntz wall-clock reinterpretation: that
    # would emit session-tz-local "epoch" ms that diverge from the
    # stream's true-UTC output by the zone offset in any non-UTC
    # session, and a DST fall-back repeat would wrongly merge two
    # events an hour apart into one session
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ms")
    wrun = Window.partitionBy("user_id").orderBy("ms").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.select(F.col("user_id").cast("string").alias("user_id"),
                      ms.alias("ms"))
        .withColumn("prev", F.lag("ms").over(w))
        .withColumn(
            "is_start",
            F.when(
                F.col("prev").isNull()
                | ((F.col("ms") - F.col("prev")) > gap_ms),
                1,
            ).otherwise(0),
        )
        .withColumn("run", F.sum("is_start").over(wrun))
        .groupBy("user_id", "run")
        .agg(
            F.min("ms").alias("session_start"),
            F.max("ms").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("run")
    )
