"""Streaming KMV (streaming/kmv.py): the incrementally-maintained
sketch must equal the batch operator over everything ingested so far
— after the first wave, and after a second wave continued from the
CHECKPOINT (restart state continuity) — bit-for-bit, est_distinct
included (mergeability makes the incremental update exact; the
arithmetic mirrors the batch IEEE ops)."""

import pandas as pd

from tabular_data_semantics_py_spark.operators.sketches import kmv_distinct
from tabular_data_semantics_py_spark.streaming.events import (
    stream_events_from_parquet,
)
from tabular_data_semantics_py_spark.streaming.kmv import kmv_stream

DOCS = "/root/testdata/sf0.001/documents.parquet"
K = 16  # below the per-language doc counts → estimator path exercised


def _drain(spark, src, ckpt, out):
    q = (
        kmv_stream(stream_events_from_parquet(spark, src), k=K)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow query did not finish"
    latest = {}
    for r in spark.read.parquet(out).collect():
        if r["key"] not in latest or r["upd"] > latest[r["key"]]["upd"]:
            latest[r["key"]] = r.asDict()
    return latest


def _batch(spark, paths):
    rows = kmv_distinct(
        spark.read.parquet(*paths), ["lang"], "doc_id", k=K
    ).collect()
    return {
        r["lang"]: (r["n_mins"], r["kth_min"], r["est_distinct"])
        for r in rows
    }


def test_stream_kmv_equals_batch_with_restart(spark, tmp_path):
    pdf = pd.read_parquet(DOCS)
    half = len(pdf) // 2
    src = tmp_path / "in"
    src.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    w0, w1 = str(src / "w0.parquet"), str(src / "w1.parquet")
    pdf.iloc[:half].to_parquet(w0)

    got1 = _drain(spark, str(src), ckpt, out)
    exp1 = _batch(spark, [w0])
    assert {k: (v["n_mins"], v["kth_min"], v["est_distinct"])
            for k, v in got1.items()} == exp1

    # wave 2 continues from the checkpoint (restart): the final
    # sketch must equal batch-over-everything, which only holds if
    # wave-1 state was durably restored
    pdf.iloc[half:].to_parquet(w1)
    got2 = _drain(spark, str(src), ckpt, out)
    exp2 = _batch(spark, [w0, w1])
    assert {k: (v["n_mins"], v["kth_min"], v["est_distinct"])
            for k, v in got2.items()} == exp2
    # and the second wave genuinely advanced the sketch
    assert any(v["upd"] == 2 for v in got2.values())
