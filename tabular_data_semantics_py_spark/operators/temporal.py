"""As-of join — "for each left row, the most recent right row at or
before its timestamp, per key" — re-expressed for Spark, which has no
native ASOF JOIN.

The scalable shape is a tagged union + one window pass: both sides
shuffle ONCE on the join key, each partition sorts by (ts, side), and
``last(payload, ignorenulls=True)`` carries the latest right payload
forward onto every subsequent left row. Compared to the naive
theta-join (``l.key = r.key AND r.ts <= l.ts`` + argmax), which
Catalyst can only execute as a per-key cross product, this is
O(n log n) per key with no range explosion — at 100 TB the window
sort rides the same shuffle the join would need anyway, and skew is
bounded by per-key row counts (a hot key costs one fat sorted
partition, not |L_key|×|R_key| pairs).

Semantics pinned against DuckDB's native ASOF LEFT JOIN (the
oracle): ties at equal timestamps match (``l.ts >= r.ts``), right
rows sharing (key, ts) are first collapsed deterministically, a left
row with no prior right row keeps NULL payload, and NULL timestamps
never match (left NULL-ts rows sort nulls-first — before any right
row — and naturally pick up a NULL payload; right NULL-ts rows are
dropped, as a NULL comparison can never satisfy the ASOF predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              payload_cols: list[str],
              tiebreak_col: str) -> DataFrame:
    """→ every ``left`` row plus ``asof_<ts_col>`` and
    ``asof_<payload>`` columns from the most recent ``right`` row
    with ``right.ts <= left.ts`` on the same ``on`` key (NULL when no
    such row exists).

    ``right`` rows sharing (key, ts) resolve deterministically to the
    max-``tiebreak_col`` row — the oracle mirrors this with a QUALIFY
    row_number dedup. Rather than pre-aggregating the right side
    (which would cost a second Exchange on (key, ts)), the tiebreak
    is folded into the window SORT: the union orders by
    (ts, side, tiebreak), so ``last(...)`` naturally keeps the
    greatest-tiebreak right row at each timestamp — the plan carries
    exactly ONE Exchange (asserted in tests). ``tiebreak_col`` must
    be unique per (key, ts) group on the right for full determinism.
    """
    lcols = left.columns
    rdtypes = dict(right.dtypes)

    r = right.where(F.col(ts_col).isNotNull())

    def _payload(null: bool):
        fields = [
            (F.lit(None).cast(dict(left.dtypes)[ts_col]) if null
             else F.col(ts_col)).alias(f"asof_{ts_col}")
        ] + [
            (F.lit(None).cast(rdtypes[c]) if null else F.col(c))
            .alias(f"asof_{c}")
            for c in payload_cols
        ]
        return F.struct(*fields).alias("_p")

    tb_type = rdtypes[tiebreak_col]
    tagged_r = r.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"),
        F.col(tiebreak_col).cast(tb_type).alias("_tb"), _payload(False),
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in (on, ts_col)],
    )
    tagged_l = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"), _payload(True),
        *[F.col(c) for c in lcols if c not in (on, ts_col)],
    )

    # asc = nulls first: a NULL-ts left row precedes every right row
    # and gets a NULL match for free (the oracle's NULL-never-matches);
    # _tb last in the sort makes the max-tiebreak right row the one
    # last() sees at each (ts, side=0) run
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                 F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = tagged_l.unionByName(tagged_r).withColumn(
        "_m",
        F.last(F.when(F.col("_side") == 0, F.col("_p")),
               ignorenulls=True).over(w),
    )
    return m.where(F.col("_side") == 1).select(
        *lcols,
        F.col("_m")[f"asof_{ts_col}"].alias(f"asof_{ts_col}"),
        *[F.col("_m")[f"asof_{c}"].alias(f"asof_{c}")
          for c in payload_cols],
    )


def range_agg(left: DataFrame, right: DataFrame, on: str, ord_col: str,
              lower: int, upper: int,
              value_col: str = "value") -> DataFrame:
    """→ every ``left`` row plus ``n_in_range`` / ``sum_in_range``:
    the count and value-sum of ``right`` rows whose ordering value
    lies in ``[l.ord + lower, l.ord + upper]`` on the same key — the
    "events in the trailing Δ window" range join (``upper = -1`` with
    microsecond ordinals = strictly before the left row).

    Spark shape: tagged union + ONE range-frame window
    (``rangeBetween(lower, upper)`` over the numeric ordinal) — a
    single shuffle on the key, no right-side replication, no
    theta-join cross product (the naive ``BETWEEN`` join is a per-key
    cartesian filter; the bucket-replication equi-join is the classic
    fallback but still duplicates the probe side). ``ord_col`` must
    be numeric (e.g. ``unix_micros``) and non-NULL on both sides —
    filter NULLs first; range frames have no NULL-ordering semantics.

    The value sum runs in decimal(18,2) and casts back to double, so
    the fold is associative and matches the oracle's sum exactly
    regardless of row order (same device as ``events_hourly``).
    """
    rsel = right.select(
        F.col(on), F.col(ord_col), F.lit(0).alias("_side"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in (on, ord_col)],
    )
    lsel = left.select(
        F.col(on), F.col(ord_col), F.lit(1).alias("_side"),
        F.lit(None).cast("decimal(18,2)").alias("_v"),
        *[F.col(c) for c in left.columns if c not in (on, ord_col)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ord_col).asc())
        .rangeBetween(lower, upper)
    )
    m = (
        lsel.unionByName(rsel)
        .withColumn(
            "n_in_range",
            F.count(F.when(F.col("_side") == 0, F.lit(1))).over(w),
        )
        .withColumn(
            "sum_in_range",
            F.sum(F.when(F.col("_side") == 0, F.col("_v"))).over(w)
            .cast("double"),
        )
    )
    return m.where(F.col("_side") == 1).select(
        *left.columns, "n_in_range", "sum_in_range"
    )


def cascade_rollup(events: DataFrame, ts_col: str = "ts",
                   key_cols: list[str] | None = None,
                   value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """→ (hourly, daily): the hypertable / continuous-aggregate
    rollup cascade — hourly buckets aggregated from raw events, daily
    buckets aggregated FROM THE HOURLY LEVEL (sum-of-counts,
    sum-of-sums), never from raw.

    That cascade is the whole point at 100 TB: coarse windows re-use
    the fine level's partial aggregates (a monotone row reduction per
    level, map-side partials throughout) instead of re-scanning the
    raw table, and the finest level is exactly what the streaming
    hourly rollup (streaming/events.py) maintains incrementally — so
    batch backfill and live continuous aggregates share one shape.
    Correctness of the re-aggregation is non-negotiable and
    checkable: counts are associative and the value sums run in
    decimal(18,2) (exact, order-independent), so daily-from-hourly is
    bit-identical to daily-from-raw — which is precisely what the
    ``events_rollup_daily`` oracle asserts by computing daily straight
    from the raw table.

    hourly: (bucket_ts, *keys, n_events, sum_dec); daily:
    (day string, *keys, n_events, total_value double).
    """
    keys = key_cols if key_cols is not None else ["event_type"]
    hourly = (
        events.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_dec"),
        )
    )
    daily = (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("bucket_ts")),
                          "yyyy-MM-dd").alias("day"),
            *keys,
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("total_value"),
        )
    )
    return hourly, daily
