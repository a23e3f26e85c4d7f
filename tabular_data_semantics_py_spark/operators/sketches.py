"""KMV (k-minimum-values) distinct-count sketch — a DETERMINISTIC
cardinality estimator, unlike approx_count_distinct's HLL++ whose
binary sketch is neither inspectable nor oracle-checkable.

The estimator: hash every element with xxhash64, keep the k smallest
DISTINCT hashes per group; if fewer than k exist the count is exact,
otherwise est = (k−1)/u_k where u_k is the k-th smallest hash
normalized to [0, 1) (Bar-Yossef et al. 2002; relative error
≈ 1/√(k−2)). Everything is a pure function of the input set:

- exact small-set behavior (n < k → the true count),
- mergeable: the min-k of a union is the min-k of the concatenated
  per-part min-k lists — the property that makes the sketch a
  distributed partial aggregate (and a rollup-cascade citizen: coarse
  groups merge fine groups' sketches without rescanning),
- skew-safe: the per-group min-k runs on `bounded_min_k`'s two-level
  salted aggregation (operators/topk.py) — a hot group spreads over
  `salt` reducers instead of one sort task,
- oracle-checkable: the DuckDB oracle recomputes the same hashes via
  the pure-Python XXH64 mirror (functions/xxh64.py) and the same
  (k−1)/u_k arithmetic in identical IEEE-double ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import bounded_min_k

# 2^63 and 2^64 as exactly-representable doubles, for normalizing a
# signed xxhash64 into [0, 1): u = (h + 2^63) / 2^64
_TWO63 = 9.223372036854775808e18
_TWO64 = 1.8446744073709551616e19


def kmv_distinct(df: DataFrame, key_cols: list[str], id_col: str,
                 k: int = 64, salt: int = 64) -> DataFrame:
    """→ key_cols + (n_mins, kth_min, est_distinct): the KMV distinct
    estimate of ``id_col`` per group. NULL ids are excluded (xxhash64
    of NULL degenerates to the seed constant, which would alias every
    NULL onto one phantom element).
    """
    hashed = df.where(F.col(id_col).isNotNull()).select(
        *key_cols, F.xxhash64(F.col(id_col)).alias("_h")
    )
    # distinct=True folds the dedup into bounded_min_k's salted
    # buffers (duplicate hashes share a salt — no separate
    # .distinct() Exchange) and as_array=True keeps the per-group
    # min-k as one sorted array (no explode + third re-grouping
    # Exchange): TWO shuffles total, asserted in tests
    agg = bounded_min_k(hashed, key_cols, ["_h"], k, salt=salt,
                        distinct=True, as_array=True).select(
        *key_cols,
        F.transform(F.col("_mins"), lambda s: s["_h"]).alias("_hs"),
    )
    n = F.size("_hs")
    kth = F.element_at(F.col("_hs"), n)  # largest of the k smallest
    u = (kth.cast("double") + F.lit(_TWO63)) / F.lit(_TWO64)
    return agg.select(
        *key_cols,
        n.cast("long").alias("n_mins"),
        kth.alias("kth_min"),
        F.when(n < k, n.cast("double"))
        .otherwise(F.lit(float(k - 1)) / u)
        .alias("est_distinct"),
    )
