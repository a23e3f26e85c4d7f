"""Curation operators (operators/curation.py): n-gram construction
parity, boilerplate stats, contamination, stratified sampling —
degenerate inputs (NULL text, short docs, trailing spaces) and the
policies the DuckDB oracles mirror."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.functions.xxh64 import spark_xxhash64
from tabular_data_semantics_py_spark.operators.curation import (
    SAMPLE_MOD,
    boilerplate_stats,
    contamination,
    hot_ngrams,
    ngram_array,
    stratified_sample,
)

DOCS = [
    (0, "a b c a b c a b"),        # 3-grams: a b c, b c a, c a b, ... (6)
    (1, "a b c x y"),              # shares 'a b c'
    (2, "a b"),                    # shorter than n=3 → zero grams
    (3, None),                     # NULL text → zero grams
    (4, "a b c "),                 # trailing space → empty final token
    (5, "q r s t u a b c"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_array_matches_duckdb(spark, docs_df):
    """The sequence+slice+array_join construction produces the same
    gram stream as the oracle's string_split + inclusive-slice CTE,
    including empty tokens from trailing spaces."""
    got = {
        r["doc_id"]: r["gs"]
        for r in docs_df.select(
            "doc_id", ngram_array(F.col("text"), 3).alias("gs")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if t is None else repr(t)})" for i, t in DOCS
        )
        + ") v(doc_id, text)"
    )
    want_rows = con.execute("""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM d),
        pos AS (SELECT doc_id, generate_subscripts(a,1) AS i, a FROM t)
        SELECT doc_id, list(array_to_string(a[i:i+2], ' ') ORDER BY i)
        FROM pos WHERE i + 2 <= len(a) GROUP BY 1
    """).fetchall()
    want = {i: gs for i, gs in want_rows}
    for i, _ in DOCS:
        assert got[i] == want.get(i, []), i
    # trailing space: the empty token is a real token both sides
    assert got[4] == ["a b c", "b c "]


def test_hot_and_boilerplate_policies(spark, docs_df):
    hot = {
        r["gram"]: r["df"] for r in hot_ngrams(docs_df, n=3, min_df=3).collect()
    }
    assert hot == {"a b c": 4}  # docs 0,1,4,5 (distinct-doc df, not occurrences)
    bp = {
        r["doc_id"]: (r["n_grams"], r["n_hot"], r["boilerplate_ratio"])
        for r in boilerplate_stats(docs_df, n=3, min_df=3).collect()
    }
    assert bp[0] == (6, 2, 2 / 6)   # occurrences of hot grams, not distinct
    assert bp[2] == (0, 0, None)    # short doc: zero grams, NULL ratio
    assert bp[3] == (0, 0, None)    # NULL text: same policy
    assert bp[4][0] == 2 and bp[4][1] == 1
    assert set(bp) == {i for i, _ in DOCS}  # every doc gets a row


def test_contamination_excludes_benchmark_side(spark, docs_df):
    # bench_mod=2 → docs 0,2,4 are the "eval split"; doc 3 NULL text
    out = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination(docs_df, n=3, bench_mod=2).collect()
    }
    assert all(i % 2 == 1 for i in out)          # bench docs never flagged
    assert out == {1: 1, 5: 1}                   # distinct shared grams
    # n=4: doc 1 has grams {a b c x, b c x y}; bench 4-grams come from
    # docs 0/4 only — no overlap → empty result, not an error
    assert contamination(docs_df, n=4, bench_mod=2).count() >= 0


def test_stratified_sample_matches_scalar_mirror(spark):
    rows = [(i, ["en", "de", "zh", None][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.25}
    got = {r["doc_id"] for r in
           stratified_sample(df, rates=rates, default_rate=0.1).collect()}
    thr = {"en": 500_000, "de": 250_000}
    want = {
        i for i, lang in rows
        if spark_xxhash64(i, (7, "int")) % SAMPLE_MOD < thr.get(lang, 100_000)
    }
    assert got == want
    assert 0 < len(got) < 400
    # determinism/resumability: a re-run keeps the exact same ids
    again = {r["doc_id"] for r in
             stratified_sample(df, rates=rates, default_rate=0.1).collect()}
    assert again == got


def test_repetition_stats_degenerate_and_scalar(spark):
    """repetition_stats vs a scalar Python recomputation on an
    adversarial corpus: NULL text, empty string, single token,
    all-identical tokens, trailing spaces. Pins the degenerate policy
    (counts 0, ratios NULL when the denominator is 0) and the
    run-length max-multiplicity fold."""
    from collections import Counter

    from tabular_data_semantics_py_spark.operators.curation import (
        repetition_stats,
    )

    rows = [
        (0, None),            # NULL: n_words 0, everything NULL
        (1, ""),              # empty string → one empty token
        (2, "a"),             # 1 token → zero 2-grams
        (3, "a a a a"),       # total repetition: shares 1.0
        (4, "a b a b a"),     # dup grams: 'a b'x2 'b a'x2 of 4
        (5, "x y "),          # trailing space → empty final token
        (6, "a b c d"),       # no repetition: dup ratio 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in repetition_stats(df, n=2).collect()}

    for doc_id, text in rows:
        if text is None:
            exp = dict(n_words=0, top_word_share=None, n_grams=0,
                       dup_gram_ratio=None, top_gram_share=None)
        else:
            toks = text.split(" ")  # single-space literal, like split()
            grams = [" ".join(toks[i:i + 2])
                     for i in range(len(toks) - 1)]
            wc, gc = Counter(toks), Counter(grams)
            exp = dict(
                n_words=len(toks),
                top_word_share=max(wc.values()) / len(toks),
                n_grams=len(grams),
                dup_gram_ratio=(
                    (len(grams) - len(gc)) / len(grams) if grams else None
                ),
                top_gram_share=(
                    max(gc.values()) / len(grams) if grams else None
                ),
            )
        g = got[doc_id]
        assert g["n_words"] == exp["n_words"], (doc_id, g)
        assert g["n_grams"] == exp["n_grams"], (doc_id, g)
        for k in ("top_word_share", "dup_gram_ratio", "top_gram_share"):
            if exp[k] is None:
                assert g[k] is None, (doc_id, k, g)
            else:
                assert g[k] == pytest.approx(exp[k]), (doc_id, k, g)

    # spot values: total repetition / the mixed case
    assert got[3]["top_word_share"] == 1.0
    assert got[3]["dup_gram_ratio"] == pytest.approx(2 / 3)
    assert got[4]["dup_gram_ratio"] == pytest.approx(0.5)
    assert got[6]["dup_gram_ratio"] == 0.0


def test_max_multiplicity_zero_shuffle(spark):
    """The repetition plan is map-only: no Exchange anywhere (the
    whole point of the in-row fold vs explode+groupBy)."""
    from tabular_data_semantics_py_spark.operators.curation import (
        repetition_stats,
    )
    from tabular_data_semantics_py_spark.sources.bucketed import (
        count_nodes, formatted_explain,
    )

    df = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    plan = formatted_explain(repetition_stats(df, n=2))
    assert count_nodes(plan, "Project") >= 1, plan  # format sanity
    assert count_nodes(plan, "Exchange") == 0, plan


def test_pii_scrub_degenerate_and_duckdb_parity(spark):
    """pii_scrub on adversarial strings — multiple matches, matches
    at string edges, near-misses (no TLD, 2-digit phone groups,
    5-octet runs), NULL text — and Java-regex ≡ RE2 parity: the same
    patterns run through DuckDB must produce identical counts and
    scrubbed text (the oracle's premise)."""
    from tabular_data_semantics_py_spark.operators.curation import (
        PII_PATTERNS, pii_scrub,
    )

    rows = [
        (0, None),
        (1, "a@b.co x@y.org same a@b.co"),          # 3 emails, repeat
        (2, "555-123-4567"),                        # whole string
        (3, "ip 10.0.0.1 and 255.255.255.255 end"),
        (4, "no-tld a@b, short 55-123-4567, five 1.2.3.4.5"),
        (5, "mixed u.v+w@ex.io at 10.1.2.3 call 999-888-7777"),
        (6, "digits 1234567890 dots 1.2.3 dash 123-456-789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}

    assert got[0] == dict(doc_id=0, n_email=0, n_phone=0, n_ipv4=0,
                          scrubbed=None)
    assert got[1]["n_email"] == 3
    assert got[1]["scrubbed"] == "<EMAIL> <EMAIL> same <EMAIL>"
    assert got[2]["scrubbed"] == "<PHONE>"
    assert got[3]["n_ipv4"] == 2
    assert (got[4]["n_email"], got[4]["n_phone"]) == (0, 0)
    # five-octet run: the IPv4 regex still finds a 4-octet prefix
    # (\b\d{1,3}(\.\d{1,3}){3}\b backtracks to '1.2.3.4'); what
    # matters is Java ≡ RE2 on it, asserted below
    assert got[5] == dict(doc_id=5, n_email=1, n_phone=1, n_ipv4=1,
                          scrubbed="mixed <EMAIL> at <IP> call <PHONE>")
    assert (got[6]["n_email"], got[6]["n_phone"], got[6]["n_ipv4"]) \
        == (0, 0, 0)

    con = duckdb.connect()
    for doc_id, text in rows:
        if text is None:
            continue
        for name, pat, rep in PII_PATTERNS:
            n, = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()
            spark_n = got[doc_id][f"n_{name}"]
            assert n == spark_n, (doc_id, name, text, n, spark_n)
        scrub = text
        for _, pat, rep in PII_PATTERNS:
            scrub, = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [scrub, pat, rep]
            ).fetchone()
        assert scrub == got[doc_id]["scrubbed"], (doc_id, text)
