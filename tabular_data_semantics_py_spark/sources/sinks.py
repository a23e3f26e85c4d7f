"""Graph-table sink (SURVEY.md §2.1 S9).

The reference serializes rdflib graphs to Turtle files
(oaei/tabular2rdf.py:89-110). At scale the graph is a partitioned
columnar table: triples land bucketed by a hash of the subject so hot
subjects (Zipf-popular entities) spread across ``n_buckets`` writer
tasks instead of pinning one — the salting knob from the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_graph(
    triples: DataFrame, path: str, n_buckets: int = 64, write_salt: int = 8
) -> None:
    """(subj, pred, obj, obj_is_literal) → parquet partitioned by
    subject-hash bucket.

    The shuffle key is (bucket, salt), not bucket alone: repartitioning
    on the bucket would hand ALL of a Zipf-hot subject's triples to the
    one task owning its bucket — exactly the writer-task pin the bucket
    layout is meant to avoid. The salt (full-triple hash mod
    ``write_salt``) spreads each bucket over up to ``write_salt``
    writer tasks; files still land under their ``bucket=`` directory,
    so read-side subject pruning is untouched (a bucket dir just holds
    several files, which is how parquet datasets scale writers
    anyway)."""
    (
        triples.withColumn(
            "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
        )
        .repartition(
            F.col("bucket"),
            F.pmod(
                F.xxhash64("subj", "pred", "obj"), F.lit(write_salt)
            ).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_graph(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")
