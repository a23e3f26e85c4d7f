"""Bucketed lexical-index join: no Exchange above the index scan
(SURVEY.md §4.2; VERDICT r03 #7). The committed artifact
docs/explain_bucketed_index.txt shows the same plan at capture time."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.operators.candidates import (
    build_index_keys,
)
from tabular_data_semantics_py_spark.sources.bucketed import (
    exact_match_bucketed,
    write_bucketed_index,
)


def _index_fixture(spark):
    rows = [
        (f"http://x/e{i}", f"Alpha Beta {i}", [f"ab {i}"], [], None, False, i)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows,
        "uri string, label string, aliases array<string>, "
        "types array<string>, redirect_to string, "
        "is_disambiguation boolean, popularity int",
    )


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_table(spark, tmp_path):
    index_keys = build_index_keys(_index_fixture(spark))
    write_bucketed_index(
        index_keys, table="tds_index_keys_test", n_buckets=8,
        path=str(tmp_path / "idx"),
    )
    yield "tds_index_keys_test"
    spark.sql("DROP TABLE IF EXISTS tds_index_keys_test")


def test_bucketed_join_plans_without_index_exchange(spark, bucketed_table):
    mentions = spark.createDataFrame(
        [(f"alpha beta {i}",) for i in range(50)], "mention_norm string"
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast: the demonstration is the shuffle shape a
    # 10^8-row index forces (it can never broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = exact_match_bucketed(spark, mentions, bucketed_table)
        plan = _explain_str(joined)
        # the index scan reads the bucket layout...
        assert "Bucketed: true" in plan, plan
        # ...and the ONLY Exchange node in the plan is the mention
        # side shuffling into it; the bucketed side has none. (The
        # formatted explain prints each node twice — once in the tree,
        # once in the detail section — so count node ids, not text.)
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        got = {(r.mention_norm, r.uri) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    # result equality with the inline (unbucketed) join
    index_keys = build_index_keys(_index_fixture(spark))
    ref = (
        mentions.join(
            index_keys, mentions.mention_norm == index_keys.key_norm
        ).select("mention_norm", "uri", F.lit(1.0).alias("score"))
    )
    want = {(r.mention_norm, r.uri) for r in ref.collect()}
    assert got == want and len(got) == 50
