"""BPE-ish regex tokenizer (functions/text.token_stats_bpe): the
three alternatives partition every non-space character, counts sum,
and the Spark regexp_extract_all segmentation agrees with an
independent Python `re` recompute of the same pattern."""

import re

from tabular_data_semantics_py_spark.functions.text import (
    BPE_PATTERN,
    token_stats_bpe,
)

CASES = [
    "hello world",
    "doc-42.v1!",
    "a1b2c3",
    "...",
    "x 99 bottles, 99!",
    "",
    "   ",
    "MiXeD CaSe AND 007 #tags <eof>",
]


def _py_tokens(s: str) -> list[str]:
    return re.findall(BPE_PATTERN, s)


def test_bpe_pattern_partitions_nonspace():
    for s in CASES:
        toks = _py_tokens(s)
        # concatenation restores the input minus spaces: nothing
        # dropped, nothing duplicated
        assert "".join(toks) == s.replace(" ", "")


def test_token_stats_bpe_spark_matches_python(spark):
    rows = [(i, s) for i, s in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_stats_bpe(df).collect()}
    for i, s in rows:
        toks = _py_tokens(s)
        r = got[i]
        assert r["n_bpe"] == len(toks)
        assert r["n_alpha"] == sum(1 for t in toks if t[0].isalpha())
        assert r["n_num"] == sum(1 for t in toks if t[0].isdigit())
        assert r["n_mark"] == (
            r["n_bpe"] - r["n_alpha"] - r["n_num"]
        )
        # the three classes partition the token stream
        assert r["n_alpha"] + r["n_num"] + r["n_mark"] == r["n_bpe"]
