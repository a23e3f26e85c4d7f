"""Regenerate docs/explain_source_scan.txt — the committed evidence
that the discovery predicate + projection push into the source scan.

Usage: python scripts/capture_explain.py
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tabular_data_semantics_py_spark.session import get_spark  # noqa: E402
from tabular_data_semantics_py_spark.sources.repo_source import (  # noqa: E402
    discover_csv_artifacts,
    load_or_build_corpus_dfs,
)


def main() -> None:
    spark = get_spark(app_name="explain-capture", master="local[4]")
    dfs = load_or_build_corpus_dfs(spark, 24, 8)
    plan = discover_csv_artifacts(dfs["source_repos"]).select(
        "repo", "path", "content"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan.explain("formatted")
    sys.stdout.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
