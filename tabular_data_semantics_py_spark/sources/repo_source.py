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
    # two deliberate choices here:
    # 1. go through pandas so createDataFrame takes the Arrow path —
    #    list-of-tuples input is backed by a pickled Python RDD whose
    #    every downstream job pays a Python-worker round trip
    # 2. right-size the tiny dimension tables to one partition; at
    #    real scale a parquet scan's maxPartitionBytes does the same
    import pandas as pd

    def _pdf(rows, columns):
        return pd.DataFrame(rows, columns=columns)

    repos = spark.createDataFrame(
        _pdf(corpus.repos, ["repo", "path", "commit", "lang", "content"]),
        REPO_SCHEMA,
    )
    index = spark.createDataFrame(
        _pdf(
            [
                (e.uri, e.label, e.aliases, e.types, e.redirect_to,
                 e.is_disambiguation, e.popularity)
                for e in corpus.entities
            ],
            ["uri", "label", "aliases", "types", "redirect_to",
             "is_disambiguation", "popularity"],
        ),
        ENTITY_INDEX_SCHEMA,
    ).coalesce(1)
    triples = spark.createDataFrame(
        _pdf(corpus.triples, ["subj", "pred", "obj", "obj_is_literal"]),
        TRIPLE_SCHEMA,
    ).coalesce(4)
    prop_meta = spark.createDataFrame(
        _pdf(corpus.property_meta, ["pred", "domain_uri", "range_uri"]),
        "pred string, domain_uri string, range_uri string",
    ).coalesce(1)
    edges = spark.createDataFrame(
        _pdf(corpus.edges, ["class_uri", "parent_uri"]),
        "class_uri string, parent_uri string",
    ).coalesce(1)
    equiv = spark.createDataFrame(
        _pdf(corpus.equivalent, ["a", "b"]), "a string, b string"
    ).coalesce(1)
    classes = spark.createDataFrame(
        _pdf(corpus.classes, ["class_uri", "label"]),
        "class_uri string, label string",
    ).coalesce(1)
    def _dim(rows, schema: str):
        cols = [c.split()[0] for c in schema.split(",")]
        return spark.createDataFrame(_pdf(rows, cols), schema).coalesce(1)

    out = {
        "source_repos": repos,
        "entity_index": index,
        "kg_triples": triples,
        "property_meta": prop_meta,
        "ontology_edges": edges,
        "ontology_equivalent": equiv,
        "ontology_classes": classes,
        # OWL projection constructs (P3/P5-P11 operands; tiny dims)
        "extra_domains": _dim(
            corpus.extra_domains, "pred string, domain_uri string"
        ),
        "complex_domains": _dim(
            corpus.complex_domains, "pred string, domain_uri string"
        ),
        "complex_ranges": _dim(
            corpus.complex_ranges, "pred string, range_uri string"
        ),
        "restrictions": _dim(
            corpus.restrictions,
            "cls string, kind string, pred string, filler string",
        ),
        "inverse_props": _dim(corpus.inverse_props, "p string, q string"),
        "equivalent_props": _dim(
            corpus.equivalent_props, "p string, q string"
        ),
        "data_property_meta": _dim(
            corpus.data_property_meta, "pred string, domain_uri string"
        ),
        "data_restrictions": _dim(
            corpus.data_restrictions, "cls string, pred string"
        ),
        "conjunct_atoms": _dim(
            corpus.conjunct_atoms, "cls string, sup string"
        ),
        "complex_restrictions": _dim(
            corpus.complex_restrictions,
            "cls string, pred string, filler string",
        ),
        "cross_sameas": _dim(
            corpus.cross_sameas, "uri string, wd_uri string"
        ),
        "wd_equiv": _dim(corpus.wd_equiv, "wd_cls string, dbo_cls string"),
    }
    # materialize once: python-list createDataFrame is backed by a
    # pickled RDD, so *every* job consuming it would re-run a Python
    # deserialization stage; localCheckpoint converts to JVM blocks
    return {k: v.localCheckpoint() for k, v in out.items()}
