"""Regenerate docs/explain_temporal_hot.txt — the committed plan
evidence for the three skew-device operators (asof_join / range_agg /
sessionize with hot_threshold): no shuffled join or cross product
anywhere, the big data crosses exactly ONE Window sort partitioned by
(key, bucket), and every auxiliary input (hot stats, carry, bucket
inventory) enters via BroadcastHashJoin — frames bounded at
O(N/threshold) rows by construction.

Usage: python scripts/capture_explain_temporal.py
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from tabular_data_semantics_py_spark.operators.temporal import (  # noqa: E402
    asof_join,
    range_agg,
    sessionize,
)
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402
from tabular_data_semantics_py_spark.sources.bucketed import (  # noqa: E402
    count_nodes,
    formatted_explain,
)


def main() -> None:
    spark = get_spark(app_name="explain-capture-temporal",
                      master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    l = spark.range(1000).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 31 % 997).alias("ts"),
        (F.col("id") % 100 / F.lit(10.0)).alias("value"),
    )
    r = l.select("user_id", "ts", "event_id", "value")

    plans = {
        "asof_join(hot_threshold=50)": formatted_explain(asof_join(
            l, r, on="user_id", ts_col="ts",
            payload_cols=["event_id", "value"], tiebreak_col="event_id",
            hot_threshold=50,
        )),
        "range_agg(hot_threshold=50)": formatted_explain(range_agg(
            l, r, on="user_id", ord_col="ts", lower=-10, upper=-1,
            hot_threshold=50,
        )),
        # barrier=False: the production path lazily localCheckpoints
        # the session frame (one compute for both union branches),
        # which truncates explain at the checkpoint scan; the
        # unbarriered plan shows the full dataflow — including the
        # duplicated subtree the barrier exists to deduplicate
        "sessionize(hot_threshold=50, barrier=False)": formatted_explain(
            sessionize(l, on="user_id", ord_col="ts", gap=10,
                       hot_threshold=50, barrier=False)
        ),
        "sessionize(hot_threshold=50) [production: pass 2 above the "
        "checkpoint barrier]": formatted_explain(sessionize(
            l, on="user_id", ord_col="ts", gap=10, hot_threshold=50,
        )),
    }
    for name, plan in plans.items():
        print(f"{'=' * 72}\n== {name}\n{'=' * 72}")
        print(plan)
        counts = {n: count_nodes(plan, n) for n in (
            "Window", "Exchange", "BroadcastHashJoin", "SortMergeJoin",
            "CartesianProduct", "BroadcastNestedLoopJoin", "Generate",
        )}
        print(f"-- summary {name}: {counts}\n")


if __name__ == "__main__":
    buf = io.StringIO()
    with redirect_stdout(buf):
        main()
    sys.stdout.write(buf.getvalue())
