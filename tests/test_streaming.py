"""Structured Streaming ops: availableNow over the events parquet must
reproduce the batch results exactly."""

import shutil

import pyspark.sql.functions as F
import pytest

from tabular_data_semantics_py_spark.streaming.events import (
    hourly_rollup_stream,
    stream_events_from_parquet,
    streaming_dedup,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source streaming requires a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-0.parquet")
    return str(d)


def _run_available_now(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "hourly" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_hourly_rollup_stream_matches_batch(spark, events_dir):
    events = stream_events_from_parquet(spark, events_dir)
    got = _run_available_now(hourly_rollup_stream(events), spark, "hourly")
    batch = (
        spark.read.parquet(EVENTS)
        .groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_streaming_dedup_bounded(spark, events_dir):
    events = stream_events_from_parquet(spark, events_dir)
    got = _run_available_now(
        streaming_dedup(events, ["user_id", "event_type"]), spark, "dedup"
    )
    n_stream = got.count()
    n_batch = (
        spark.read.parquet(EVENTS)
        .dropDuplicates(["user_id", "event_type"])
        .count()
    )
    # within one availableNow pass over a single file the watermark
    # never closes, so the stream dedups the full horizon == batch
    assert n_stream == n_batch


def test_hourly_rollup_stream_tz_free(spark, events_dir):
    """Stream ≡ tz-free batch hourly under a FRACTIONAL-offset session
    zone (+5:45): pins the NTZ-diff/timestamp_micros/convert_timezone
    chain — a session-tz cast would shift every window AND misalign
    the printed hour from the window boundary here."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        events = stream_events_from_parquet(spark, events_dir)
        got = _run_available_now(
            hourly_rollup_stream(events), spark, "hourly"
        )
        batch = (
            spark.read.parquet(EVENTS)
            .groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("ts")),
                    "yyyy-MM-dd HH:mm:ss",
                ).alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                .alias("total_value"),
            )
        )
        assert {tuple(r) for r in got.collect()} \
            == {tuple(r) for r in batch.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_streamed_hourly_feeds_daily_cascade(spark, events_dir):
    """The continuous-aggregate story end-to-end: the STREAMED hourly
    level re-aggregates to the daily level exactly — each hourly
    total is an exact 2-decimal value, so re-casting to decimal
    restores the lossless cascade — equal to the batch
    cascade_rollup daily (itself oracle-proven equal to
    daily-from-raw)."""
    from tabular_data_semantics_py_spark.operators.temporal import (
        cascade_rollup,
    )

    events = stream_events_from_parquet(spark, events_dir)
    hourly = _run_available_now(hourly_rollup_stream(events), spark, "hourly")
    daily_from_stream = (
        hourly.groupBy(
            F.substring("hour", 1, 10).alias("day"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,2)"))
            .cast("double").alias("total_value"),
        )
    )
    _, daily_raw = cascade_rollup(spark.read.parquet(EVENTS))
    g = {tuple(r) for r in daily_from_stream.collect()}
    b = {
        tuple(r)
        for r in daily_raw.select(
            "day", "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        ).collect()
    }
    assert g == b


def test_hourly_rollup_stream_dst_fall_back(spark, tmp_path):
    """Under a DST session zone, windows landing in the fall-back
    overlap must still print distinct, correct hours. Events span
    2024-11-03 04:00-08:00 (the America/New_York fall-back is
    05:00-06:00 UTC): a convert_timezone/cast round-trip through the
    session zone collapses the 05:00 and 06:00 windows onto one
    printed hour — probe-confirmed — while the epoch-arithmetic
    device keeps stream ≡ tz-free batch."""
    import pandas as pd

    rows = []
    for i, minutes in enumerate(range(0, 4 * 60, 7)):  # every 7 min
        rows.append((i, pd.Timestamp("2024-11-03 04:00:00")
                     + pd.Timedelta(minutes=minutes)))
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": [r[0] % 5 for r in rows],
            "event_type": ["e"] * len(rows),
            "value": [1.25] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    src = tmp_path / "dst_in"
    src.mkdir()
    pdf.to_parquet(src / "part-0.parquet")

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = _run_available_now(
            hourly_rollup_stream(
                stream_events_from_parquet(spark, str(src))
            ),
            spark, "hourly",
        )
        g = {tuple(r) for r in got.collect()}
        batch = (
            spark.read.parquet(str(src / "part-0.parquet"))
            .groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("ts")),
                    "yyyy-MM-dd HH:mm:ss",
                ).alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                .alias("total_value"),
            )
        )
        b = {tuple(r) for r in batch.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert g == b
    # all four hours distinct — the overlap did not collapse windows
    assert len({h for (h, *_r) in g}) == 4, sorted(g)
