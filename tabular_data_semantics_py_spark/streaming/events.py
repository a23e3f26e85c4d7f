"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.10); its closest
analogue is incremental checkpoint/resume, which plans/pipeline.py
covers. These operators make the engine's event-side ops available as
streams — the shape a production ingest of the 10^12-file source table
would use (new commits arriving → incremental annotation):

- ``hourly_rollup_stream``: watermarked tumbling-window aggregation
  (the streaming form of entry_queries.events_hourly).
- ``streaming_dedup``: watermark-bounded exact dedup on content sha —
  the streaming form of the exact-dedup operator; state is bounded by
  the watermark horizon.

Tests drive them with ``trigger(availableNow=True)`` over the parquet
events table and assert equality with the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ntz_wall_as_utc_instant(col: str):
    """NTZ wall clock → the TimestampType instant whose UTC wall
    clock is that value, independent of the session time zone (a
    plain cast would interpret the wall clock in the session zone —
    and throw/shift on DST-gap wall times there). The watermark/event
    -time device shared by every streaming operator in this module."""
    return F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, "
            f"cast('1970-01-01 00:00:00' as timestamp_ntz), {col})"
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """readStream over a parquet directory (file-source streaming —
    each file is a micro-batch input; at scale this is the Iceberg /
    Kafka source with the same downstream plan).

    ``schema=None`` infers from the files already present — fine for
    drains of existing data, but a landing directory that is still
    EMPTY at deploy time has nothing to infer from; pass the schema
    explicitly there so the stream starts and picks files up as they
    arrive."""
    if schema is None:
        try:
            schema = spark.read.parquet(path).schema
        except Exception as e:
            raise ValueError(
                f"cannot infer a streaming schema from '{path}' (empty "
                "or missing directory?) — pass schema= explicitly for "
                "not-yet-populated landing directories"
            ) from e
    return spark.readStream.schema(schema).parquet(path)


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window count/sum per event_type with a 2-hour
    watermark for late data.

    Event time must be TimestampType (Spark rejects NTZ watermarks),
    but a plain ``cast`` routes the wall clock through the session
    time zone — shifting every window in a non-UTC driver and, in
    fractional-offset zones (+5:45 et al.), misaligning the printed
    hour against the window boundary — whereas the batch mirror
    (entry_queries.events_hourly) truncates the NTZ wall clock
    tz-free. So the conversion is pinned: NTZ wall clock → epoch-us
    by NTZ diff (tz-free) → ``timestamp_micros`` (the instant whose
    UTC wall clock is the original), and the window boundary prints
    via epoch ARITHMETIC (``unix_micros`` + ``timestampadd`` from the
    naive epoch — NOT ``convert_timezone('UTC', ...)``, whose
    instant→NTZ round-trip through the session zone mislabels DST
    fall-back windows; see the inline comment) — stream ≡ batch in
    ANY session time zone (tested, incl. the America/New_York
    fall-back overlap)."""
    return (
        events.withColumn("ts", ntz_wall_as_utc_instant("ts"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
        .select(
            # instant → NTZ via epoch ARITHMETIC, not convert_timezone:
            # convert_timezone('UTC', <TimestampType>) first casts the
            # instant to NTZ through the SESSION zone, and in a DST
            # fall-back overlap that round-trip resolves the ambiguous
            # wall time to the earlier offset — two distinct windows
            # then print the same hour (probe-confirmed under
            # America/New_York). unix_micros of an instant is tz-free.
            F.date_format(
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(win.start), "
                    "cast('1970-01-01 00:00:00' as timestamp_ntz))"
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("hour"),
            "event_type", "n_events", "total_value",
        )
    )


def streaming_dedup(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact streaming dedup on key columns within the watermark
    horizon (dropDuplicatesWithinWatermark → bounded state). Output
    ``ts`` is the tz-free instant (UTC wall clock = source NTZ wall
    clock); which rows survive is key-driven and tz-independent
    either way, but the shared device avoids DST-gap wall times
    throwing under a non-UTC session."""
    return (
        events.withColumn("ts", ntz_wall_as_utc_instant("ts"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(key_cols)
    )
