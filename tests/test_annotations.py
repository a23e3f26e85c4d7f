"""S2/S10: SemTab annotation CSV round-trips and S9 graph sink."""

import pyspark.sql.functions as F

from tabular_data_semantics_py_spark.sources.annotations import (
    read_cea_csv,
    read_cta_csv,
    write_cea_csv,
    write_cta_csv,
)
from tabular_data_semantics_py_spark.sources.sinks import read_graph, write_graph


def test_cea_roundtrip(spark, pipeline, tmp_path):
    cea = pipeline.stages["cea"]
    p = str(tmp_path / "cea_csv")
    write_cea_csv(cea, p)
    back = read_cea_csv(spark, p)
    got = {
        (r.table_id, r.col, r.row, tuple(r.entities)) for r in back.collect()
    }
    want = {
        (r.table_id, r.col, r.row, (r.uri,)) for r in cea.collect()
    }
    assert got == want


def test_cea_multi_roundtrip(spark, pipeline, dfs, tmp_path):
    """Multi-entity CEA: tied candidates become space-joined multi-URI
    CEA cells that survive the SemTab CSV round-trip (reference
    challenge_utils.py:336-346 format)."""
    from tabular_data_semantics_py_spark.operators.annotate import cea_multi

    cm = cea_multi(
        pipeline.stages["cells_m"], pipeline.stages["candidates"],
        pipeline.stages["entity_types"],
    )
    rows = cm.collect()
    assert any(" " in r.uris for r in rows), "fixture must produce a tie"
    p = str(tmp_path / "cea_multi_csv")
    write_cea_csv(cm, p)
    back = read_cea_csv(spark, p)
    got = {
        (r.table_id, r.col, r.row, tuple(r.entities)) for r in back.collect()
    }
    want = {
        (r.table_id, r.col, r.row, tuple(r.uris.split(" "))) for r in rows
    }
    assert got == want


def test_cta_roundtrip(spark, pipeline, tmp_path):
    cta = pipeline.stages["cta"]
    p = str(tmp_path / "cta_csv")
    write_cta_csv(cta, p)
    back = read_cta_csv(spark, p)
    got = {
        (r.table_id, r.col, r.cls, tuple(r.ancestors)) for r in back.collect()
    }
    want = {
        (r.table_id, r.col, r.cls,
         tuple(r.ancestors.split(" ")) if r.ancestors else ())
        for r in cta.collect()
    }
    assert got == want


def test_cea_short_row_guard(spark, tmp_path):
    """Length guard: rows with < 4 fields are skipped
    (challenge_utils.py:44-45)."""
    p = tmp_path / "bad"
    p.mkdir()
    (p / "f.csv").write_text(
        '"t1","0","1","http://x/e1"\n"t1","0"\n"t1","1","2","http://x/e2 http://x/e3"\n'
    )
    df = read_cea_csv(spark, str(p))
    rows = {(r.table_id, r.col, r.row, tuple(r.entities)) for r in df.collect()}
    assert rows == {
        ("t1", 0, 1, ("http://x/e1",)),
        ("t1", 1, 2, ("http://x/e2", "http://x/e3")),
    }


def test_graph_sink_roundtrip(spark, pipeline, tmp_path):
    tri = pipeline.stages["triples"]
    p = str(tmp_path / "graph")
    write_graph(tri, p, n_buckets=8)
    back = read_graph(spark, p)
    assert back.count() == tri.count()
    assert set(back.columns) == {"subj", "pred", "obj", "obj_is_literal"}
    # bucketing spread: more than one bucket dir materialized
    import os

    buckets = [d for d in os.listdir(p) if d.startswith("bucket=")]
    assert len(buckets) > 1


def test_graph_sink_hot_subject_spreads_over_writers(spark, tmp_path):
    """A Zipf-hot subject must NOT pin one writer task: its bucket dir
    holds multiple data files (one per (bucket, write-salt) shuffle
    partition), while read-side bucket pruning still sees one dir."""
    import os

    from pyspark.sql import functions as F

    hot = spark.range(20_000).select(
        F.lit("http://x/HOT").alias("subj"),
        F.lit("http://x/p").alias("pred"),
        F.concat(F.lit("o"), F.col("id").cast("string")).alias("obj"),
        F.lit(False).alias("obj_is_literal"),
    )
    p = str(tmp_path / "graph_hot")
    write_graph(hot, p, n_buckets=8, write_salt=8)

    buckets = [d for d in os.listdir(p) if d.startswith("bucket=")]
    assert len(buckets) == 1  # one subject -> one bucket dir (pruning)
    files = [
        f for f in os.listdir(os.path.join(p, buckets[0]))
        if f.endswith(".parquet")
    ]
    assert len(files) > 1  # ...written by multiple salted tasks
    assert read_graph(spark, p).count() == 20_000
