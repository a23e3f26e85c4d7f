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
