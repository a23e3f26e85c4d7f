"""Regenerate docs/explain_bucketed_index.txt — the committed evidence
that the exact-match candidates equi-join plans with NO Exchange above
the bucketed lexical-index scan (sources/bucketed.py; SURVEY.md §4.2).

Usage: python scripts/capture_explain_bucketed.py
"""

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from tabular_data_semantics_py_spark.operators.candidates import (  # noqa: E402
    build_index_keys,
)
from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402
from tabular_data_semantics_py_spark.sources.bucketed import (  # noqa: E402
    exact_match_bucketed,
    write_bucketed_index,
)


def main() -> None:
    spark = get_spark(app_name="explain-bucketed", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (f"http://x/e{i}", f"Alpha Beta {i}", [f"ab {i}"], [], None, False, i)
        for i in range(500)
    ]
    index = spark.createDataFrame(
        rows,
        "uri string, label string, aliases array<string>, "
        "types array<string>, redirect_to string, "
        "is_disambiguation boolean, popularity int",
    )
    with tempfile.TemporaryDirectory() as td:
        write_bucketed_index(
            build_index_keys(index), table="tds_index_keys_demo",
            n_buckets=8, path=os.path.join(td, "idx"),
        )
        mentions = spark.createDataFrame(
            [(f"alpha beta {i}",) for i in range(100)],
            "mention_norm string",
        )
        # a 10^8-row index can never broadcast — show the shuffle shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = exact_match_bucketed(spark, mentions, "tds_index_keys_demo")
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan.explain("formatted")
        txt = buf.getvalue()
        sys.stdout.write(txt)
        import re

        n_exchange = len(re.findall(r"\(\d+\) Exchange", txt))
        sys.stdout.write(
            f"\n-- {n_exchange} Exchange(s) in the plan: the mention side "
            "shuffles into the bucket layout; the index scan "
            "(Bucketed: true) has none above it.\n"
        )
        spark.sql("DROP TABLE IF EXISTS tds_index_keys_demo")
    spark.stop()


if __name__ == "__main__":
    main()
