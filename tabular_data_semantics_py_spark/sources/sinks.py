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
    triples: DataFrame, path: str, n_buckets: int = 64
) -> None:
    """(subj, pred, obj, obj_is_literal) → parquet partitioned by
    subject-hash bucket."""
    (
        triples.withColumn(
            "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_graph(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")
