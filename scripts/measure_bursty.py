"""Bursty-hot-key crossover row (VERDICT r05 #1 done-criterion).

The r5 equal-width time buckets bounded per-task rows only for
temporally-uniform hot keys: a bursty key (90% of its rows inside 1%
of its time span — incident traffic, crawler bursts) landed almost
entirely in ONE bucket and silently reverted to the legacy
one-fat-task bound. The r6 count-quantile edges bound buckets by
COUNT. This script measures, interleaved best-of-2 at N rows with 50%
of all rows on one BURSTY hot key:

- asof device (hot_threshold = N/32) vs legacy on the bursty input,
- the same pair on a temporally-uniform skewed input (the r5 grid),
- the realized max per-(key, bucket) row count (the bound itself).

Usage: python scripts/measure_bursty.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from tabular_data_semantics_py_spark.operators.temporal import (  # noqa: E402
    _bkt_of, _hot_bucket_stats, asof_join,
)
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402


def build(spark, n_rows: int, bursty: bool, n_users: int = 10_000):
    ids = spark.range(n_rows)
    pair = F.expr("id div 2")
    user = F.when(pair % 2 == 0, F.lit(0)).otherwise(pair % n_users)
    span, burst = 1_000_000_000, 10_000_000
    if bursty:
        # hot-key (user 0) rows: 90% inside 1% of the span; everyone
        # else (and 10% of the hot key) scattered over the full span
        ts = F.when(
            (user == 0) & (F.col("id") % 10 < 9),
            (F.col("id") * 7919) % burst,
        ).otherwise((F.col("id") * 104729) % span)
    else:
        ts = (F.col("id") * 7919) % span
    return ids.select(
        F.col("id").alias("event_id"),
        user.alias("user_id"),
        ts.cast("long").alias("ts_us"),
        (F.col("id") % 1000 / F.lit(10.0)).alias("value"),
        (F.col("id") % 2 == 1).alias("is_left"),
    ).localCheckpoint()


def run(df, th):
    l = df.where("is_left").select("event_id", "user_id", "ts_us", "value")
    r = df.where("NOT is_left").select("user_id", "ts_us", "event_id",
                                       "value")
    j = asof_join(l, r, on="user_id", ts_col="ts_us",
                  payload_cols=["event_id", "value"],
                  tiebreak_col="event_id", hot_threshold=th)
    j.agg(F.count("asof_event_id"), F.sum("asof_value")).collect()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    th = n_rows // 32
    spark = get_spark(app_name="bursty-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    variants = [("bursty_device", True, th), ("bursty_legacy", True, None),
                ("uniform_skew_device", False, th),
                ("uniform_skew_legacy", False, None)]
    for _name, bursty, t in variants:
        run(build(spark, 4000, bursty), t)  # warm plan shapes
    out = {name: float("inf") for name, _, _ in variants}
    for _rep in range(2):
        for name, bursty, t in variants:
            df = build(spark, n_rows, bursty)
            t0 = time.time()
            run(df, t)
            out[name] = min(out[name], time.time() - t0)

    # realized per-(key, bucket) bound on the bursty input
    df = build(spark, n_rows, True)
    stats = _hot_bucket_stats(
        df.select("user_id", F.col("ts_us").alias("_o")),
        "user_id", F.col("_o").cast("double"), th,
    )
    mx = (
        df.join(F.broadcast(stats), "user_id")
        .groupBy("user_id", _bkt_of(F.col("ts_us").cast("double"))
                 .alias("_b"))
        .count().agg(F.max("count")).collect()[0][0]
    )
    out.update(
        n_rows=n_rows, hot_threshold=th,
        max_bucket_rows=int(mx),
        max_bucket_over_threshold=round(mx / th, 3),
        bursty_device_vs_legacy=round(
            out["bursty_device"] / out["bursty_legacy"], 3
        ),
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
