"""Pure-Python XXH64 (functions/xxh64.py) vs Spark's JVM xxhash64 —
the oracle implementation must be bit-exact for every length class
(empty, <4, <8, <32, >=32 bytes), unicode, and chained int seeds."""

import random

import pandas as pd
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.functions.xxh64 import spark_xxhash64


def test_xxh64_matches_spark(spark):
    rng = random.Random(7)
    vals = ["", "a", "ab", "abc", "abcd", "hello world", "x" * 7, "y" * 8,
            "z" * 31, "w" * 32, "q" * 33, "m" * 100, "Zürich", "日本語",
            "tok\x1ftok2\x1ftok3"]
    vals += ["".join(rng.choice("abcdef \x1fé") for _ in range(rng.randint(0, 50)))
             for _ in range(30)]
    df = spark.createDataFrame(pd.DataFrame({"s": vals}))
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64(F.col("s"), F.lit(5)).alias("h2"),
        F.xxhash64(F.col("s"), F.lit(1 << 40)).alias("h3"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r.s) == r.h1, repr(r.s)
        assert spark_xxhash64(r.s, (5, "int")) == r.h2, repr(r.s)
        assert spark_xxhash64(r.s, 1 << 40) == r.h3, repr(r.s)
