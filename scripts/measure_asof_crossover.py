"""Measure the asof_join skew-device crossover: the 4-variant grid
(uniform/skew × device/legacy) at growing row counts, 50% of all
rows on ONE key throughout.

The skew-safe mode (operators/temporal.asof_join hot_threshold)
trades two extra cheap passes — per-key hot stats and the per-bucket
carry aggregate — for a bounded max-task size (the legacy plan sorts
a hot key's entire history in ONE task). Both terms are visible
here: at small n the fixed overhead exceeds the fat sort it removes
(skew-dev > skew-legacy in absolute seconds), and the crossover
lands around ~8M rows (4M on the hot key) on this box; beyond it the
device wins by a margin that grows with hot-key size, because the
fat task is O(h log h) serial while the device's critical path stays
at O(threshold · log threshold). The skew/uniform RATIO under the
device stays ≤ ~1.4 at every size, vs 2.2-2.7 legacy.

Run EXCLUSIVELY (shared host):
    python scripts/measure_asof_crossover.py [n_rows ...]
Defaults: 2M 8M 16M. Results recorded in BENCH/BASELINE.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import _gc, ambient_probe  # noqa: E402
from tabular_data_semantics_py_spark.operators.temporal import (  # noqa: E402
    asof_join,
)
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402


def grid(spark, n_rows: int, n_users: int = 10_000, reps: int = 3):
    # one hot bucket ≈ one uniform shuffle partition's share (the
    # natural sizing rule at any scale: threshold = rows/width keeps
    # hot tasks the same size as everyone else's)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hot_threshold = max(100_000, n_rows // width)

    def build(skew: bool):
        ids = spark.range(n_rows)
        pair = F.expr("id div 2")
        user = pair % n_users
        if skew:
            user = F.when(pair % 2 == 0, F.lit(0)).otherwise(user)
        return ids.select(
            F.col("id").alias("event_id"),
            user.alias("user_id"),
            (F.col("id") * 7919 % 1_000_000_000).alias("ts_us"),
            (F.col("id") % 1000 / F.lit(10.0)).alias("value"),
            (F.col("id") % 2 == 1).alias("is_left"),
        ).localCheckpoint()

    def run(df, th):
        l = df.where("is_left").select("event_id", "user_id", "ts_us",
                                       "value")
        r = df.where("NOT is_left").select("user_id", "ts_us",
                                           "event_id", "value")
        j = asof_join(l, r, on="user_id", ts_col="ts_us",
                      payload_cols=["event_id", "value"],
                      tiebreak_col="event_id", hot_threshold=th)
        j.agg(F.count("asof_event_id"), F.sum("asof_value")).collect()

    variants = [("uniform_dev", False, hot_threshold),
                ("skew_dev", True, hot_threshold),
                ("uniform_legacy", False, None),
                ("skew_legacy", True, None)]
    for _name, skew, th in variants:
        run(build(skew).limit(1000), th)
    best = {name: float("inf") for name, _, _ in variants}
    for _rep in range(reps):
        for name, skew, th in variants:
            df = build(skew)
            _gc(spark)
            t0 = time.time()
            run(df, th)
            best[name] = min(best[name], time.time() - t0)
    return hot_threshold, best


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000,
                                               16_000_000]
    spark = get_spark(app_name="asof-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"ambient probe: {ambient_probe():.3f} s (healthy < 0.1)")
    for n in sizes:
        th, b = grid(spark, n)
        dev_ratio = b["skew_dev"] / b["uniform_dev"]
        leg_ratio = b["skew_legacy"] / b["uniform_legacy"]
        print(
            f"n={n:>9,} th={th:>9,} "
            + " ".join(f"{k}={v:.2f}s" for k, v in b.items())
            + f"  dev_ratio={dev_ratio:.2f} legacy_ratio={leg_ratio:.2f}"
            + ("  <-- device wins outright"
               if b["skew_dev"] < b["skew_legacy"] else "")
        )
    print(f"ambient probe: {ambient_probe():.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
