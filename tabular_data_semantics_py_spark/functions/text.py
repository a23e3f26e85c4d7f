"""Text-analysis column functions for training-data curation:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure ``pyspark.sql.functions`` expressions (JVM,
whole-stage codegen) with exact ANSI-SQL oracle equivalents — no
Python in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic marker-token sets for the n-gram/stopword language
# heuristic (vote = number of tokens that are markers; argmax lang,
# lexicographic tie-break)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "schnell"),
    "en": ("the", "a", "of", "fast", "slow"),
    "es": ("el", "la", "de", "tabla", "rapido"),
    "fr": ("le", "la", "et", "vite", "table"),
}

STOPWORDS = ("the", "a", "of", "to", "in", "and", "is")


def _tokens(text_col):
    return F.split(text_col, " ")


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, n_distinct, n_chars)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """→ per-doc quality features: counts kept integral so the SQL
    oracle matches exactly; ratios derived as single IEEE divisions."""
    toks = _tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_distinct.alias("n_distinct"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-token language-ID heuristic → (doc_id, predicted_lang,
    marker_hits). Argmax over per-language marker-token counts,
    lexicographic language tie-break (deterministic)."""
    toks = _tokens(F.col(text_col))

    def _score(lang: str, markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
            F.lit(lang).alias("lang"),
        )

    scores = [_score(lang, ms) for lang, ms in sorted(LANG_MARKERS.items())]
    # argmax by (hits desc, lang asc): sort structs desc on hits then
    # asc lang — struct ordering is field-wise, so negate hits
    best = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-s["hits"]).alias("neg_hits"), s["lang"].alias("lang"),
                    s["hits"].alias("hits"),
                )
                for s in scores
            ]
        )
    )[0]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("predicted_lang"),
        best["hits"].alias("marker_hits"),
    )


# BPE-ish pre-tokenization pattern (GPT-2-family shape, ASCII-scoped):
# a letter run, a digit run, or a single non-alphanumeric mark. The
# alternatives are disjoint, so Java-regex (Spark) and RE2 (DuckDB
# oracle) produce identical token streams — no engine-specific
# leftmost-longest vs leftmost-first divergence to worry about.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats_bpe(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_bpe, n_alpha, n_num, n_mark): token counts under
    the BPE-ish regex pre-tokenizer — the whitespace-independent
    count an LLM-training token-budget estimate needs. Pure codegen:
    ``regexp_extract_all`` + array ``filter``/``size``, no Python."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    n_of = lambda pat: F.size(  # noqa: E731
        F.filter(toks, lambda t: t.rlike(pat))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_bpe"),
        n_of("^[A-Za-z]").alias("n_alpha"),
        n_of("^[0-9]").alias("n_num"),
        n_of("^[^A-Za-z0-9]").alias("n_mark"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fp): sha256 of the whitespace-normalized lowercase
    text — the exact-dedup / lineage fingerprint."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(norm, 256).alias("fp")
    )
