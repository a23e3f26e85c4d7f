"""Regenerate docs/explain_srp_lsh.txt — the committed plan evidence
for the SRP-LSH embedding near-dup operator:

- the signature GEMM (MapInPandas) appears NOWHERE in the consumer
  plan: it materialized exactly once into the band_rows barrier and
  every consumer (both bucket-join sides + the hot-bucket count)
  scans the barrier instead of recomputing the pass — the property
  that matters at 10^9 vectors;
- the candidate set (tiny vs n²) drives broadcast joins back to the
  embedding table for the exact verify.

Usage: python scripts/capture_explain_srp.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tabular_data_semantics_py_spark.operators.similarity import (  # noqa: E402
    srp_lsh_pairs,
)
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402
from tabular_data_semantics_py_spark.sources.bucketed import (  # noqa: E402
    count_nodes,
    formatted_explain,
)


def main() -> None:
    spark = get_spark(
        app_name="explain-srp", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    plan = srp_lsh_pairs(emb, spark, 0.4, max_bucket_size=64)
    text = formatted_explain(plan)
    # node-id count, NOT substring count: the formatted form prints
    # each node twice (tree + detail section)
    n_mip = count_nodes(text, "MapInPandas")
    out = os.path.join(
        os.path.dirname(__file__), "..", "docs", "explain_srp_lsh.txt"
    )
    with open(out, "w") as f:
        f.write(
            "srp_lsh_pairs(emb, 0.4, max_bucket_size=64) physical plan "
            "over sf0.01 embeddings.\n"
            f"MapInPandas nodes in the consumer plan: {n_mip} "
            "(signature pass materialized once into the band_rows "
            "barrier; 4 recomputations before the barrier was added).\n\n"
        )
        f.write(text)
    print(f"wrote {out} (MapInPandas nodes: {n_mip})")
    spark.stop()


if __name__ == "__main__":
    main()
