"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (north_rule shape)::

  zip -r tds.zip tabular_data_semantics_py_spark
  spark-submit --py-files tds.zip scripts/run_pipeline.py \\
      --source  s3://bucket/source_repos/    # Iceberg/parquet (repo,path,commit,lang,content)
      --index   s3://bucket/entity_index/ \\
      --triples s3://bucket/kg_triples/ \\
      --props   s3://bucket/property_meta/ \\
      --edges   s3://bucket/ontology_edges/ \\
      --equiv   s3://bucket/ontology_equiv/ \\
      --out     s3://bucket/kg_out/          # checkpoints + outputs

With no arguments it runs the deterministic fixture corpus (sandbox
mode) and writes to ./_kg_out. Resumable: rerunning with the same
--out resumes from the last completed stage checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# Resolve the package from --py-files (spark-submit puts the zip on
# sys.path for driver and executors) when present; fall back to the
# repo checkout for bare `python scripts/run_pipeline.py` runs.
try:
    import tabular_data_semantics_py_spark  # noqa: F401
except ImportError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source")
    ap.add_argument("--index")
    ap.add_argument("--triples")
    ap.add_argument("--props")
    ap.add_argument("--edges")
    ap.add_argument("--equiv")
    ap.add_argument("--out", default="_kg_out")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tabular_data_semantics_py_spark.plans.pipeline import run_pipeline

    spark = SparkSession.builder.appName("tds-kg-pipeline").getOrCreate()

    if args.source:
        dfs = {
            "source_repos": spark.read.parquet(args.source),
            "entity_index": spark.read.parquet(args.index),
            "kg_triples": spark.read.parquet(args.triples),
            "property_meta": spark.read.parquet(args.props),
            "ontology_edges": spark.read.parquet(args.edges),
            "ontology_equivalent": spark.read.parquet(args.equiv),
        }
    else:  # sandbox: deterministic fixture corpus
        from tabular_data_semantics_py_spark.fixtures.generator import make_corpus
        from tabular_data_semantics_py_spark.sources.repo_source import (
            corpus_to_dataframes,
        )

        dfs = corpus_to_dataframes(spark, make_corpus())

    res = run_pipeline(
        spark, dfs, checkpoint_dir=args.out, resume=not args.no_resume
    )
    n = res.stages["triples"].count()
    print(json.dumps({"triples": n, "out": args.out}))


if __name__ == "__main__":
    main()
