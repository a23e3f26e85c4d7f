"""Driver-contract guard: a representative subset of queries() must
match their oracle_sql() under the driver's comparison semantics
(row count + column names + order-insensitive values). The full sweep
lives in tests/driver_mirror.py (run as a script)."""

import duckdb
import pytest

from driver_mirror import TABLES, compare_query

SF_DIR = "/root/testdata/sf0.01"

SUBSET = [
    "kg_cells_parse",
    "kg_closure",
    "kg_cea",
    "kg_cta",
    "kg_cpa",
    "kg_triples",
    "pricing_summary",
    "events_sessions",
    "doc_jaccard_pairs",
    "doc_minhash_lsh",
    "doc_neardup_canonical",
    "emb_knn",
    "doc_lang_id",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_all_oracle_keys_have_queries(contract):
    qs, oracles = contract
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, contract, name):
    qs, oracles = contract
    problems, n = compare_query(spark, duck, name, qs[name], oracles[name], SF_DIR)
    assert not problems, problems
    assert n > 0


def test_entry_smoke(spark, contract):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "obj_is_literal"}
