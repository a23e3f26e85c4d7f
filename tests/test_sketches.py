"""KMV distinct sketch (operators/sketches.py): exact small-set
path, duplicate/NULL handling, estimator accuracy on a corpus far
above k, and the mergeability property that makes it a distributed
partial aggregate."""

import pytest
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.functions.xxh64 import spark_xxhash64
from tabular_data_semantics_py_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k_and_duplicates_and_nulls(spark):
    rows = (
        [(i, "small") for i in range(10)]
        + [(0, "small"), (1, "small")]         # duplicates collapse
        + [(None, "small")]                     # NULL id excluded
        + [(i, "big") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: r.asDict()
           for r in kmv_distinct(df, ["lang"], "doc_id", k=64).collect()}

    # below k: the true count, exactly
    assert got["small"]["n_mins"] == 10
    assert got["small"]["est_distinct"] == 10.0
    # the kth_min is the max of the true 10 hashes
    hs = sorted(spark_xxhash64(i) for i in range(10))
    assert got["small"]["kth_min"] == hs[-1]

    # above k: estimator path, k mins kept
    assert got["big"]["n_mins"] == 64
    hs_big = sorted(spark_xxhash64(i) for i in range(200))
    assert got["big"]["kth_min"] == hs_big[63]
    u = (hs_big[63] + 2**63) / 2**64
    assert got["big"]["est_distinct"] == pytest.approx(63 / u)


def test_kmv_accuracy(spark):
    """Relative error ~ 1/sqrt(k-2) ≈ 5% at k=512; assert within 4
    sigma on 20k distinct ids (deterministic — no flake: the hashes
    are a pure function of the ids)."""
    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("lang")
    )
    (row,) = kmv_distinct(df, ["lang"], "doc_id", k=512).collect()
    assert abs(row["est_distinct"] - 20_000) / 20_000 < 4 / (510 ** 0.5)


def test_kmv_mergeability():
    """min-k(A ∪ B) == min-k(min-k(A) ++ min-k(B)) — the partial-
    aggregate law, checked on the scalar mirror."""
    k = 16
    a = [spark_xxhash64(i) for i in range(100)]
    b = [spark_xxhash64(i) for i in range(50, 220)]  # overlapping
    merged = sorted(set(sorted(set(a))[:k] + sorted(set(b))[:k]))[:k]
    direct = sorted(set(a) | set(b))[:k]
    assert merged == direct


def test_kmv_two_shuffles(spark):
    """The sketch plan carries exactly TWO Exchanges (bounded_min_k's
    two salted aggregation levels) — no separate dedup shuffle, no
    explode/re-group shuffle."""
    from tabular_data_semantics_py_spark.sources.bucketed import (
        count_nodes, formatted_explain,
    )

    df = spark.range(1000).select(
        (F.col("id") % 300).alias("doc_id"), F.lit("x").alias("lang")
    )
    plan = formatted_explain(kmv_distinct(df, ["lang"], "doc_id", k=64))
    assert count_nodes(plan, "Exchange") == 2, plan
