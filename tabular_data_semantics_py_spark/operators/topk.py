"""Bounded per-key min-k without a sort window.

``Window.partitionBy(key).orderBy(...)`` + ``row_number`` puts EVERY
row of a hot key into one task and sorts it before taking k — a
single-task sort at 10^8 rows per key (the scale-killer VERDICT r02
flagged in the fragment caps). This helper computes the same k
smallest rows per key via a two-level salted hash aggregation:

- level 1 groups by (key, xxhash64(order) % salt) and keeps each
  salted group's k smallest — the hot key's rows spread over ``salt``
  reducers, and map-side partial aggregation bounds any single buffer
  by the rows of that (key, salt) pair per partition;
- level 2 merges the ≤ salt×k per-key candidates and slices the exact
  global k — a bounded, skew-free aggregation.

The union of per-salt min-k is a superset of the global min-k, so the
result is EXACT (same multiset as sort-then-take-k; ties beyond the
order columns are immaterial because the element IS the ordered
struct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_min_k(
    df: DataFrame, keys: list[str], order_cols: list[str], k: int,
    salt: int = 64, distinct: bool = False, as_array: bool = False,
) -> DataFrame:
    """Per ``keys`` group, the ``k`` lexicographically-smallest rows by
    ``order_cols`` → one output row per kept element with columns
    ``keys + order_cols``. Skew-safe (no per-key sort task).

    ``distinct=True`` computes the k smallest DISTINCT elements
    without a separate dedup shuffle: duplicates of an element always
    hash to the same salt, so an ``array_distinct`` inside each salted
    buffer (after the sort, which keeps the array sorted) is a global
    dedup — the KMV sketch's shape (operators/sketches.py).
    """
    def _mink(arr):
        s = F.sort_array(arr)
        return F.slice(F.array_distinct(s) if distinct else s, 1, k)

    elem = F.struct(*[F.col(c) for c in order_cols])
    lvl1 = (
        df.groupBy(
            *keys,
            F.pmod(F.xxhash64(*order_cols), F.lit(salt)).alias("_salt"),
        )
        .agg(_mink(F.collect_list(elem)).alias("_cand"))
    )
    lvl2 = lvl1.groupBy(*keys).agg(
        _mink(F.flatten(F.collect_list("_cand"))).alias("_top")
    )
    if as_array:
        # keys + `_mins`: the sorted min-k element structs as one
        # array column — lets a consumer that needs per-group
        # aggregate FORM (e.g. the KMV sketch) skip the explode and a
        # third re-grouping Exchange
        return lvl2.select(*keys, F.col("_top").alias("_mins"))
    return lvl2.select(*keys, F.explode("_top").alias("_row")).select(
        *keys, "_row.*"
    )
