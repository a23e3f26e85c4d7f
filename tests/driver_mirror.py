"""Local mirror of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir, compare row count + column names + order-insensitive
values. Usable as a script (fast iteration) and from pytest."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=repr)
    return [c for c in sorted(cols)], out


def compare_query(spark, con, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duckdb={dc}")
    if len(sr) != len(dr):
        problems.append(f"row counts differ: spark={len(sr)} duckdb={len(dr)}")
    if not problems and sr != dr:
        diff_s = [r for r in sr if r not in set(dr)][:3]
        diff_d = [r for r in dr if r not in set(sr)][:3]
        problems.append(
            f"values differ; only-spark={diff_s} only-duckdb={diff_d}"
        )
    return problems, len(sr)


def run_all(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import duckdb

    from tabular_data_semantics_py_spark.session import get_spark

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    # sf-parametric oracles (doc_minhash_signatures recomputes
    # signatures from the table itself) follow the compared sf dir
    os.environ["TDS_ORACLE_SF_DIR"] = sf_dir

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                results[name] = ("ROWS_ONLY", n, [])
            except Exception as e:  # noqa: BLE001
                results[name] = ("ERROR", 0, [repr(e)[:300]])
            continue
        try:
            problems, n = compare_query(spark, con, name, fn, oracles[name], sf_dir)
            results[name] = ("OK" if not problems else "MISMATCH", n, problems)
        except Exception as e:  # noqa: BLE001
            results[name] = ("ERROR", 0, [repr(e)[:300]])
    return results


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    sf_dir = os.environ.get("TDS_MIRROR_SF_DIR", "/root/testdata/sf0.01")
    res = run_all(sf_dir=sf_dir, only=only)
    bad = 0
    for name, (status, n, problems) in res.items():
        print(f"{status:9s} {name:28s} rows={n}")
        for p in problems:
            print(f"          {p}")
            bad += 1
    sys.exit(1 if bad else 0)
