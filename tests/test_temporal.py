"""asof_join (operators/temporal.py): tie-at-equal-ts matching,
(key, ts) right-side dedup, no-prior-row NULLs, NULL-timestamp
policy on both sides — pinned against a brute-force scalar reference
and spot values."""

import pytest
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.operators.temporal import asof_join

# (event_id, user_id, ts-as-long, value) — long "timestamps" keep the
# scalar reference trivial; the operator is type-generic over
# orderable ts columns
LEFT = [
    (100, 1, 50, 5.0),
    (101, 1, 10, 1.0),    # before any right row → NULL match
    (102, 1, 20, 2.0),    # ties exactly with right ts=20
    (103, 2, 99, 9.0),
    (104, 3, 40, 4.0),    # user with no right rows at all
    (105, 1, None, 0.0),  # NULL ts → NULL match, row kept
]
RIGHT = [
    (200, 1, 20, 0.2),
    (201, 1, 20, 0.3),    # same (user, ts): max event_id wins
    (202, 1, 45, 0.45),
    (203, 2, 98, 0.98),
    (204, 2, None, 0.99),  # NULL ts: never matches
]


def brute_asof(left, right):
    out = {}
    # dedup right to max event_id per (user, ts)
    best = {}
    for eid, uid, ts, val in right:
        if ts is None:
            continue
        k = (uid, ts)
        if k not in best or eid > best[k][0]:
            best[k] = (eid, val)
    for eid, uid, ts, val in left:
        match = None
        if ts is not None:
            cands = [(rts, b) for (ruid, rts), b in best.items()
                     if ruid == uid and rts <= ts]
            if cands:
                rts, (reid, rval) = max(cands)
                match = (rts, reid, rval)
        out[eid] = match
    return out


def test_asof_join_brute_force(spark):
    l = spark.createDataFrame(
        LEFT, "event_id long, user_id long, ts long, value double"
    )
    r = spark.createDataFrame(
        RIGHT, "event_id long, user_id long, ts long, value double"
    ).select("user_id", "ts", "event_id", "value")
    got = {
        row["event_id"]: row.asDict()
        for row in asof_join(
            l, r, on="user_id", ts_col="ts",
            payload_cols=["event_id", "value"], tiebreak_col="event_id",
        ).collect()
    }
    assert set(got) == {e for e, *_ in LEFT}  # every left row kept

    exp = brute_asof(LEFT, RIGHT)
    for eid, match in exp.items():
        g = got[eid]
        if match is None:
            assert (g["asof_ts"], g["asof_event_id"], g["asof_value"]) \
                == (None, None, None), g
        else:
            assert (g["asof_ts"], g["asof_event_id"], g["asof_value"]) \
                == match, (eid, g, match)

    # the pinned cases
    assert got[102]["asof_event_id"] == 201   # equal-ts match, dedup winner
    assert got[101]["asof_event_id"] is None  # nothing prior
    assert got[104]["asof_event_id"] is None  # user without right rows
    assert got[105]["asof_event_id"] is None  # NULL left ts
    assert got[103]["asof_event_id"] == 203   # NULL right ts skipped

    # the skew-safe path (hot_threshold=2: every user hot, multiple
    # time buckets) must reproduce the same pinned semantics —
    # including the hot-key NULL-ts row (NULL bucket) and the
    # carry-across-buckets patch
    got_hot = {
        row["event_id"]: row.asDict()
        for row in asof_join(
            l, r, on="user_id", ts_col="ts",
            payload_cols=["event_id", "value"], tiebreak_col="event_id",
            hot_threshold=2,
        ).collect()
    }
    assert got_hot == got


def test_asof_join_reserved_name_guard(spark):
    l = spark.createDataFrame([(1, 10, 0.5)], "user_id long, ts long, _p double")
    r = spark.createDataFrame([(1, 5, 1)], "user_id long, ts long, event_id long")
    with pytest.raises(ValueError, match="reserve internal column"):
        asof_join(l, r, on="user_id", ts_col="ts",
                  payload_cols=["event_id"], tiebreak_col="event_id")


def test_asof_join_single_shuffle(spark):
    """The plan carries no join node at all and exactly ONE Exchange
    (the window shuffle) — the whole point vs the theta-join shape.
    formatted_explain, not executedPlan().toString(): count_nodes
    parses the formatted '(N) Node' ids and returns 0 on any other
    format, which would make these assertions vacuous."""
    from tabular_data_semantics_py_spark.sources.bucketed import (
        count_nodes, formatted_explain,
    )

    l = spark.createDataFrame(
        LEFT, "event_id long, user_id long, ts long, value double"
    )
    r = spark.createDataFrame(
        RIGHT, "event_id long, user_id long, ts long, value double"
    ).select("user_id", "ts", "event_id", "value")
    plan = formatted_explain(asof_join(
        l, r, on="user_id", ts_col="ts",
        payload_cols=["event_id", "value"], tiebreak_col="event_id",
    ))
    assert count_nodes(plan, "Window") == 1, plan  # format sanity
    for join_node in ("SortMergeJoin", "BroadcastHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert count_nodes(plan, join_node) == 0, plan
    assert count_nodes(plan, "Exchange") == 1, plan

    # adaptive gate (VERDICT r05 #3): a threshold no key reaches
    # keeps the legacy single-window single-Exchange plan — the
    # device bookkeeping must not tax skew-free inputs
    plan_cold = formatted_explain(asof_join(
        l, r, on="user_id", ts_col="ts",
        payload_cols=["event_id", "value"], tiebreak_col="event_id",
        hot_threshold=1000,
    ))
    assert count_nodes(plan_cold, "Window") == 1, plan_cold
    assert count_nodes(plan_cold, "Exchange") == 1, plan_cold
    assert count_nodes(plan_cold, "BroadcastHashJoin") == 0, plan_cold

    # skew-safe path (threshold=2: keys genuinely hot): still no
    # shuffled join / cross product anywhere; the main data hits
    # exactly ONE Window sort (partitioned by (key, bucket)), the
    # second Window runs over the tiny carry frame. Exchange /
    # BroadcastHashJoin counts are asserted as UPPER bounds, not
    # exact pins (ADVICE r05: exact node counts encode one planner
    # version): ≤ 4 shuffles — the main window, the carry partials,
    # the carry cumulation, plus planner slack — and every join is a
    # broadcast of a ≤ N/threshold-bounded frame (the checkpointed
    # hot-stats, the carry inventory, the carry patch).
    plan_hot = formatted_explain(asof_join(
        l, r, on="user_id", ts_col="ts",
        payload_cols=["event_id", "value"], tiebreak_col="event_id",
        hot_threshold=2,
    ))
    assert count_nodes(plan_hot, "Window") == 2, plan_hot
    for join_node in ("SortMergeJoin", "BroadcastNestedLoopJoin",
                      "CartesianProduct"):
        assert count_nodes(plan_hot, join_node) == 0, plan_hot
    assert 1 <= count_nodes(plan_hot, "BroadcastHashJoin") <= 5, plan_hot
    assert count_nodes(plan_hot, "Exchange") <= 4, plan_hot


def test_range_agg_brute_force_and_boundaries(spark):
    """range_agg vs a scalar recomputation; pins both boundary
    inclusions ([l+lower, l+upper] closed), the empty-window policy
    (count 0, sum NULL), and the decimal-exact value sum."""
    from tabular_data_semantics_py_spark.operators.temporal import range_agg

    left = [(1, 7, 100), (2, 7, 105), (3, 7, 90), (4, 8, 50)]
    right = [
        (7, 90, 1.11),    # == l.ts+lower for l@100 (lower=-10): in
        (7, 99, 2.22),    # == l.ts+upper for l@100 (upper=-1): in
        (7, 100, 4.44),   # == l.ts: out (upper=-1 is strict)
        (7, 104, 8.88),
        (8, 49, 0.5),
    ]
    l = spark.createDataFrame(left, "event_id long, user_id long, ts_us long")
    r = spark.createDataFrame(right, "user_id long, ts_us long, value double")
    got = {
        row["event_id"]: row.asDict()
        for row in range_agg(l, r, on="user_id", ord_col="ts_us",
                             lower=-10, upper=-1).collect()
    }
    for eid, uid, ts in left:
        n = sv = 0
        for ruid, rts, rv in right:
            if ruid == uid and ts - 10 <= rts <= ts - 1:
                n += 1
                sv = round(sv + rv, 2)
        g = got[eid]
        assert g["n_in_range"] == n, (eid, g)
        if n == 0:
            assert g["sum_in_range"] is None, g
        else:
            assert g["sum_in_range"] == pytest.approx(sv), (eid, g)
    assert got[1]["n_in_range"] == 2          # 90 and 99, not 100
    assert got[3]["n_in_range"] == 0          # window [80, 89]: empty
    assert got[3]["sum_in_range"] is None

    # the skew-safe path (threshold=2: both users hot, several ord
    # buckets, right rows replicated across bucket boundaries) must
    # reproduce the same boundary-exact results
    got_hot = {
        row["event_id"]: row.asDict()
        for row in range_agg(l, r, on="user_id", ord_col="ts_us",
                             lower=-10, upper=-1,
                             hot_threshold=2).collect()
    }
    assert got_hot == got


def test_range_agg_join_free_plan(spark):
    from tabular_data_semantics_py_spark.operators.temporal import range_agg
    from tabular_data_semantics_py_spark.sources.bucketed import (
        count_nodes, formatted_explain,
    )

    l = spark.createDataFrame(
        [(1, 7, 100)], "event_id long, user_id long, ts_us long"
    )
    r = spark.createDataFrame(
        [(7, 90, 1.0)], "user_id long, ts_us long, value double"
    )
    plan = formatted_explain(range_agg(
        l, r, on="user_id", ord_col="ts_us", lower=-10, upper=-1
    ))
    assert count_nodes(plan, "Window") >= 1, plan  # format sanity
    for join_node in ("SortMergeJoin", "BroadcastHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert count_nodes(plan, join_node) == 0, plan
    assert count_nodes(plan, "Exchange") == 1, plan


def test_cascade_rollup_lossless(spark):
    """daily-from-hourly ≡ daily-from-raw, bit-exact: counts are
    associative and the value sums run in decimal — on a frame
    crossing hour and day boundaries with adversarial 2-decimal
    values."""
    from tabular_data_semantics_py_spark.operators.temporal import (
        cascade_rollup,
    )

    rows = [
        (1, "2024-01-01 00:00:00", "a", 0.1),
        (2, "2024-01-01 00:59:59", "a", 0.2),   # same hour
        (3, "2024-01-01 01:00:00", "a", 0.3),   # next hour, same day
        (4, "2024-01-01 23:59:59", "a", 10.07),
        (5, "2024-01-02 00:00:00", "a", 0.01),  # next day
        (6, "2024-01-01 12:00:00", "b", 1e9),
        (7, "2024-01-01 12:30:00", "b", 0.01),  # magnitude mismatch:
                                                 # float sum would drift
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    _, daily = cascade_rollup(e)
    got = {(r["day"], r["event_type"]): (r["n_events"], r["total_value"])
           for r in daily.collect()}

    direct = (
        e.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")),
                          "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("tv"),
        )
    )
    exp = {(r["day"], r["event_type"]): (r["n"], r["tv"])
           for r in direct.collect()}
    assert got == exp  # exact equality, doubles included
    assert got[("2024-01-01", "a")] == (4, 10.67)
    assert got[("2024-01-01", "b")] == (2, 1000000000.01)


def test_sessionize_brute_force_all_paths(spark):
    """sessionize (operators/temporal.py) vs a scalar gaps-and-islands
    reference, dense ties (2k events, 8 users, 200 ticks, gap 5) —
    legacy path and the bucket-split skew-safe path across thresholds
    (3 ≈ 84 buckets/user: boundary fragments chain constantly; 9999 =
    the no-hot-keys degenerate arm). Exact set equality including the
    decimal value sums."""
    import random
    from decimal import Decimal

    from tabular_data_semantics_py_spark.operators.temporal import (
        sessionize,
    )

    GAP = 5
    rng = random.Random(20260820)
    rows = [(i, rng.randrange(8), rng.randrange(200),
             round(rng.random() * 10, 2)) for i in range(2000)]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )

    by: dict = {}
    for _i, u, t, v in rows:
        by.setdefault(u, []).append((t, v))
    exp = set()
    for u, evs in by.items():
        evs.sort()
        cur = None
        for t, v in evs:
            if cur is None or t - cur[1] > GAP:
                if cur:
                    exp.add((u, cur[0], cur[1], cur[2], float(cur[3])))
                cur = [t, t, 0, Decimal("0")]
            cur[1] = t
            cur[2] += 1
            cur[3] += Decimal(str(v))
        if cur:
            exp.add((u, cur[0], cur[1], cur[2], float(cur[3])))

    for th in (None, 3, 40, 9999):
        got = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], float(r["total_dec"]))
            for r in sessionize(e, on="user_id", ord_col="ts", gap=GAP,
                                hot_threshold=th).collect()
        }
        assert got == exp, (th, list(got - exp)[:3], list(exp - got)[:3])


def test_events_temporal_queries_tz_free(spark):
    """events_asof / events_range_count results must not depend on
    the driver session time zone (the NTZ-diff epoch device; a
    unix_micros(cast) would shift every ts_us by the zone offset and
    break oracle parity — the regression this pins)."""
    from tabular_data_semantics_py_spark.entry_queries import QUERIES as qs
    sf = "/root/testdata/sf0.001"

    def snap():
        a = {r["event_id"]: (r["ts_us"], r["view_ts_us"])
             for r in qs["events_asof"](spark, sf).collect()}
        rc = {r["event_id"]: (r["ts_us"], r["n_views"],
                              r["sum_view_value"])
              for r in qs["events_range_count"](spark, sf).collect()}
        return a, rc

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = snap()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = snap()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == nyc


def test_session_window_boundary_semantics(spark):
    """Spark's session_window merge rule is INCLUSIVE: an event at
    exactly prev + gap still merges into the running session; a new
    session starts only when the gap is strictly exceeded — the same
    `> gap` convention as the custom events_sessions operator and
    the events_sessions_native oracle. (A first draft assumed the
    strict rule; this pins the empirical one.)"""
    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 00:30:00"),          # exactly gap: merges
        (3, 10, "2024-01-01 01:00:00.000001"),   # gap + 1us: NEW
        (4, 10, "2024-01-01 01:29:59"),          # inside: merges
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    s = (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"),
                  "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").cast("string").alias("st"),
                "n")
        .orderBy("st")
        .collect()
    )
    assert [(r["st"], r["n"]) for r in s] == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 01:00:00.000001", 2),
    ]


def test_asof_and_range_randomized_stress(spark):
    """Seeded randomized sweep: 2k rows, 40 users, timestamps drawn
    from [0, 30) so (key, ts) collisions and exact boundary hits are
    FREQUENT, plus NULL sprinkles — both operators vs brute force in
    one Spark action each (covers orders of magnitude more tie/dup
    configurations than the handcrafted cases above)."""
    import random

    from tabular_data_semantics_py_spark.operators.temporal import range_agg

    rng = random.Random(20260820)
    left, right = [], []
    for i in range(1000):
        uid = rng.randrange(40)
        ts = rng.randrange(30) if rng.random() > 0.02 else None
        left.append((i, uid, ts, round(rng.random() * 10, 2)))
    for i in range(1000, 2000):
        uid = rng.randrange(40)
        ts = rng.randrange(30) if rng.random() > 0.02 else None
        right.append((i, uid, ts, round(rng.random() * 10, 2)))

    l = spark.createDataFrame(
        left, "event_id long, user_id long, ts long, value double"
    )
    r = spark.createDataFrame(
        right, "event_id long, user_id long, ts long, value double"
    ).select("user_id", "ts", "event_id", "value")

    # --- asof vs brute (brute_asof also models the (key,ts) dedup) ---
    got = {
        row["event_id"]: row
        for row in asof_join(
            l, r, on="user_id", ts_col="ts",
            payload_cols=["event_id", "value"], tiebreak_col="event_id",
        ).collect()
    }
    exp = brute_asof(left, right)
    assert len(got) == len(left)
    for eid, match in exp.items():
        g = got[eid]
        trip = (g["asof_ts"], g["asof_event_id"], g["asof_value"])
        assert trip == (match if match else (None, None, None)), (eid, trip, match)

    # skew-safe path under the same adversarial tie/dup/NULL density:
    # threshold=5 makes every user hot with ~10 time buckets over the
    # 30-tick range, so bucket boundaries land ON colliding
    # timestamps and many buckets carry no right rows (exercising the
    # strictly-earlier carry patch); threshold=2000 exercises the
    # no-hot-keys degenerate arm of the same code path
    for th in (5, 2000):
        got_hot = {
            row["event_id"]: row
            for row in asof_join(
                l, r, on="user_id", ts_col="ts",
                payload_cols=["event_id", "value"],
                tiebreak_col="event_id", hot_threshold=th,
            ).collect()
        }
        assert len(got_hot) == len(left)
        for eid, match in exp.items():
            g = got_hot[eid]
            trip = (g["asof_ts"], g["asof_event_id"], g["asof_value"])
            assert trip == (match if match else (None, None, None)), \
                (th, eid, trip, match)

    # --- range_agg vs brute, window [ts-5, ts-1], legacy + skew-safe
    # (threshold=5 ≈ every user hot, ~6 one-tick buckets over the
    # 30-tick range — the width floor forces bucket ≥ frame width, so
    # nearly every right row replicates into 2 buckets and bucket
    # boundaries land on colliding timestamps) ---
    for th in (None, 5, 2000):
        got2 = {
            row["event_id"]: row
            for row in range_agg(
                l.where(F.col("ts").isNotNull()),
                r.where(F.col("ts").isNotNull()),
                on="user_id", ord_col="ts", lower=-5, upper=-1,
                hot_threshold=th,
            ).collect()
        }
        for eid, uid, ts, _v in left:
            if ts is None:
                continue
            hits = [rv for (reid, ruid, rts, rv) in right
                    if ruid == uid and rts is not None
                    and ts - 5 <= rts <= ts - 1]
            g = got2[eid]
            assert g["n_in_range"] == len(hits), (th, eid, g)
            if hits:
                from decimal import Decimal
                exp_sum = float(sum(Decimal(str(v)) for v in hits))
                assert g["sum_in_range"] == exp_sum, (th, eid, g, exp_sum)
            else:
                assert g["sum_in_range"] is None, (th, eid, g)


def test_bursty_hot_key_bucket_bound_and_exactness(spark):
    """The r6 count-quantile device on a temporally-BURSTY hot key —
    the shape that defeated the r5 equal-width buckets (VERDICT r05
    #1): 90% of the key's rows inside 1% of its time span. Asserts
    (a) the per-bucket row bound holds by COUNT (every (key, bucket)
    ≤ 1.35 × threshold — the 1.26× percentile rank-error bound plus
    implementation slack — where equal-width would have packed ~90%
    of the key into one bucket), and (b) sessionize over the bursty
    key is value-identical with the device on and off."""
    import math

    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.temporal import (
        _bkt_of, _hot_bucket_stats, sessionize,
    )

    n, th = 20_000, 1_000
    span, burst = 1_000_000_000, 10_000_000
    e = spark.range(n).select(
        F.lit(7).alias("user_id"),
        F.when(
            F.col("id") < int(n * 0.9),
            (F.col("id") * 7919) % burst,            # 90% in 1% of span
        ).otherwise((F.col("id") * 104729) % span)   # 10% over the span
        .cast("long").alias("ts_us"),
        (F.col("id") % 100).cast("double").alias("value"),
    ).localCheckpoint()

    stats = _hot_bucket_stats(
        e.select("user_id", F.col("ts_us").alias("_o")),
        "user_id", F.col("_o").cast("double"), th,
    )
    assert stats is not None
    per_bucket = (
        e.join(F.broadcast(stats), "user_id")
        .select(_bkt_of(F.col("ts_us").cast("double")).alias("_b"))
        .groupBy("_b").count().collect()
    )
    counts = {r["_b"]: r["count"] for r in per_bucket}
    assert sum(counts.values()) == n
    assert len(counts) >= math.ceil(n / th) * 0.5  # genuinely split
    assert max(counts.values()) <= 1.35 * th, sorted(counts.items())

    legacy = {
        (r["user_id"], r["session_start"]): r.asDict()
        for r in sessionize(e, on="user_id", ord_col="ts_us",
                            gap=50).collect()
    }
    device = {
        (r["user_id"], r["session_start"]): r.asDict()
        for r in sessionize(e, on="user_id", ord_col="ts_us", gap=50,
                            hot_threshold=th).collect()
    }
    assert legacy == device


def test_adaptive_gate_no_hot_keys_identical_results(spark):
    """hot_threshold on a skew-free input: the gate must return the
    legacy plan (asserted in test_asof_join_single_shuffle) with
    value-identical output."""
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.temporal import range_agg

    l = spark.range(200).select(
        F.col("id").alias("event_id"), (F.col("id") % 20).alias("user_id"),
        (F.col("id") * 37 % 1000).alias("ts_us"),
    ).localCheckpoint()
    r = spark.range(300).select(
        (F.col("id") % 20).alias("user_id"),
        (F.col("id") * 53 % 1000).alias("ts_us"),
        (F.col("id") % 10 / F.lit(2.0)).alias("value"),
    ).localCheckpoint()

    def run(th):
        return {
            r_["event_id"]: (r_["n_in_range"], r_["sum_in_range"])
            for r_ in range_agg(l, r, on="user_id", ord_col="ts_us",
                                lower=-100, upper=-1,
                                hot_threshold=th).collect()
        }

    assert run(None) == run(10_000)
