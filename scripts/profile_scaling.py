"""Per-action profile of the kg_pipeline scaling job.

Usage: python scripts/profile_scaling.py <parallelism> [kg_sf]

Runs the same protocol as ``bench.py --scaling`` for one parallelism
level and prints a JSON breakdown: wall per eager barrier action
(BARRIER_TIMES), the final triples count action, and everything else
(driver/plan-analysis residue). Comparing the local[2] vs local[8]
breakdowns shows which actions scale with cores and which are the
serial floor.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from tabular_data_semantics_py_spark import barriers  # noqa: E402
from tabular_data_semantics_py_spark.plans.pipeline import run_pipeline  # noqa: E402
from tabular_data_semantics_py_spark.sources.repo_source import (  # noqa: E402
    load_or_build_corpus_dfs,
)


def main() -> None:
    p = int(sys.argv[1])
    kg_sf = float(sys.argv[2]) if len(sys.argv) > 2 else float(
        os.environ.get("SPARK_GRAFT_SCALING_KG_SF", "2.5")
    )
    high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8"))
    spark = bench._scaling_session(p, high)
    bench.run_kg_pipeline(spark, 0.001)  # warmup

    n_tables, epc = bench._corpus_params(kg_sf)
    reps = int(os.environ.get("TDS_PROFILE_REPS", "2"))
    out = []
    for rep in range(reps):
        bench._gc(spark, unpersist=True)
        dfs = load_or_build_corpus_dfs(spark, n_tables, epc)
        barriers.BARRIER_TIMES.clear()
        with bench.weather_monitor() as wm:
            t0 = time.time()
            res = run_pipeline(spark, dfs)
            t_plan = time.time() - t0
            t1 = time.time()
            n = res.stages["triples"].count()
            t_count = time.time() - t1
            total = time.time() - t0
        bt = list(barriers.BARRIER_TIMES)
        out.append(
            {
                "rep": rep,
                "parallelism": p,
                "kg_sf": kg_sf,
                "total_sec": round(total, 2),
                "plan_phase_sec": round(t_plan, 2),
                "final_count_sec": round(t_count, 2),
                "barriers": {k: round(v, 2) for k, v in bt},
                "barrier_sum_sec": round(sum(v for _, v in bt), 2),
                "other_sec": round(t_plan - sum(v for _, v in bt), 2),
                "triples": n,
                "weather_probe_sec": [round(min(wm.samples), 4),
                                      round(wm.worst, 4)],
            }
        )
        print(json.dumps(out[-1]))
    spark.stop()


if __name__ == "__main__":
    main()
