"""Source-repository table: schemas, artifact discovery, fixture→DF.

The pipeline input is an Iceberg/parquet table with the exact
``input_hint`` shape: (repo, path, commit, lang, content). Artifact
discovery is a pure Catalyst filter so partition pruning / predicate
pushdown apply at the scan (the 10^12-file table never reaches Python:
only rows with lang='csv' AND path LIKE '%.csv' survive — the Spark
analogue of the reference's directory listing in
oaei/tabular2rdf.py:329-352).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..fixtures.generator import FixtureCorpus

REPO_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

ENTITY_INDEX_SCHEMA = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("label", StringType(), False),
        StructField("aliases", ArrayType(StringType()), False),
        StructField("types", ArrayType(StringType()), False),
        StructField("redirect_to", StringType(), True),
        StructField("is_disambiguation", BooleanType(), False),
        StructField("popularity", IntegerType(), False),
    ]
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("obj_is_literal", BooleanType(), False),
    ]
)


def discover_csv_artifacts(repos: DataFrame) -> DataFrame:
    """Filter the source table down to CSV artifacts and mint a
    ``table_id`` from the filename stem, sanitized around '#'/'?'
    exactly like the reference's output-name handling
    (oaei/tabular2rdf.py:96-110)."""
    stem = F.regexp_extract(F.col("path"), r"([^/]+)\.csv$", 1)
    return (
        repos.where((F.col("lang") == "csv") & F.col("path").endswith(".csv"))
        .withColumn("table_id", F.split(stem, r"[#?]").getItem(0))
    )


def corpus_to_dataframes(
    spark: SparkSession, corpus: FixtureCorpus
) -> dict[str, DataFrame]:
    """Materialize the fixture corpus as DataFrames (the test/bench
    stand-in for reading the Iceberg catalog)."""
    repos = spark.createDataFrame(corpus.repos, REPO_SCHEMA)
    index = spark.createDataFrame(
        [
            (e.uri, e.label, e.aliases, e.types, e.redirect_to,
             e.is_disambiguation, e.popularity)
            for e in corpus.entities
        ],
        ENTITY_INDEX_SCHEMA,
    )
    triples = spark.createDataFrame(corpus.triples, TRIPLE_SCHEMA)
    prop_meta = spark.createDataFrame(
        corpus.property_meta, "pred string, domain_uri string, range_uri string"
    )
    edges = spark.createDataFrame(
        corpus.edges, "class_uri string, parent_uri string"
    )
    equiv = spark.createDataFrame(corpus.equivalent, "a string, b string")
    classes = spark.createDataFrame(
        corpus.classes, "class_uri string, label string"
    )
    return {
        "source_repos": repos,
        "entity_index": index,
        "kg_triples": triples,
        "property_meta": prop_meta,
        "ontology_edges": edges,
        "ontology_equivalent": equiv,
        "ontology_classes": classes,
    }
