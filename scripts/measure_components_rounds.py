"""Measure connected_components round count + wall on worst-case path
graphs across node scales — reproduces docs/components_rounds.md.

The path (diameter n) is the adversarial topology for star
contraction: the measured round count should track ~log2(n) (Kiveris
et al., SoCC'14 prove O(log² n); O(log n) is the observed behavior).
Run EXCLUSIVELY (shared host): `python scripts/measure_components_rounds.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import run_components_scale  # noqa: E402
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402
from tabular_data_semantics_py_spark.operators.components import (  # noqa: E402
    connected_components,
)


def main():
    spark = get_spark()
    # warm codegen/checkpoint paths
    connected_components(
        spark.range(63).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
    ).count()
    print("| n (path nodes) | rounds | wall (s) | log2(n) |")
    print("|---|---|---|---|")
    import math

    for n in (10_000, 100_000, 1_000_000):
        stats: dict = {}
        edges = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        t0 = time.time()
        cc = connected_components(edges, stats=stats)
        n_nodes, n_comp = cc.agg(
            F.count(F.lit(1)), F.countDistinct("component")
        ).collect()[0]
        wall = time.time() - t0
        assert n_nodes == n and n_comp == 1, (n_nodes, n_comp)
        print(
            f"| {n:,} | {stats['rounds']} | {wall:.1f} "
            f"| {math.log2(n):.1f} |"
        )
    star = run_components_scale(spark, path=False)
    print(f"\nstar_1m (hot-hub skew): {star}")


if __name__ == "__main__":
    main()
