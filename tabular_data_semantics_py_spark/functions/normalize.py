"""Mention / URI normalization (SURVEY.md §2.2 F1-F10).

Pure-Python scalar cores (used by the plain-Python oracle executor and
wrapped as **vectorized pandas UDFs** for Spark — never row-at-a-time
Python UDFs). Each function cites the reference behavior it pins.

Normalization rule (pinned; both oracle and Spark use exactly this):
1. strip stray quotes          (test/challenge_utils.py:664-666)
2. drop parenthesized groups   (kg/dbpedia.py:22-31,62-70)
3. strip accents: NFD + drop combining marks
                               (oaei/dbpedia_fragment.py:72-78)
4. lowercase, collapse whitespace
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd

_BRACKET_RE = re.compile(r"\(([^)]*)\)")
_WS_RE = re.compile(r"\s+")


def strip_accents(s: str) -> str:
    """NFD-normalize and drop combining marks + non-ASCII
    (oaei/dbpedia_fragment.py:72-78)."""
    nfd = unicodedata.normalize("NFD", s)
    return "".join(c for c in nfd if not unicodedata.combining(c) and ord(c) < 128)


def bracket_parts(s: str) -> list[str]:
    """Extract parenthesized qualifier groups longer than 2 chars
    (kg/dbpedia.py:22-31: each >2-char item becomes its own query)."""
    return [p.strip() for p in _BRACKET_RE.findall(s) if len(p.strip()) > 2]


def normalize_mention(s: str) -> str:
    if s is None:
        return ""
    s = s.replace('"', "")  # challenge_utils.py:664-666 quote-strip
    s = _BRACKET_RE.sub(" ", s)  # kg/dbpedia.py:62-70 bracket removal
    s = strip_accents(s)
    s = s.lower()
    return _WS_RE.sub(" ", s).strip()


def entity_name(uri: str) -> str:
    """Local name after '#' or the last '/' segment
    (util/utilities.py:44-63)."""
    if "#" in uri:
        frag = uri.rsplit("#", 1)[1]
        if frag:
            return frag
    return uri.rstrip("/").rsplit("/", 1)[-1]


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def norm_edit_similarity(a: str, b: str) -> float:
    """1 - levenshtein/max_len in [0,1]."""
    if not a and not b:
        return 1.0
    m = max(len(a), len(b))
    return 1.0 - _levenshtein(a, b) / m


def token_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def lexical_score(mention_norm: str, key_norm: str) -> float:
    """Fuzzy lexical score: mean of normalized edit similarity and
    token Jaccard — the Arrow-batched scorer's scalar core (stands in
    for the remote lookup's ranking, kg/lookup.py:95-106)."""
    return 0.5 * norm_edit_similarity(mention_norm, key_norm) + \
        0.5 * token_jaccard(mention_norm, key_norm)


# --- Spark vectorized wrappers ---------------------------------------------

def prenorm_expr(col):
    """JVM expression for the UDF-free prefix of ``normalize_mention``:
    quote-strip, bracket removal, lowercase, whitespace collapse — all
    whole-stage-codegen, so the full cell table never enters Python.
    Only accent-stripping needs Python, and
    ``normalize_mention(prenorm(s)) == normalize_mention(s)`` (property
    test in tests/test_normalize.py), so it can run *after* dedup to
    distinct prenormed mentions — orders of magnitude smaller at scale.
    """
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, '"', "")
    c = F.regexp_replace(c, r"\(([^)]*)\)", " ")
    c = F.lower(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def prenorm_py(s: str) -> str:
    """Python mirror of ``prenorm_expr`` (for property-testing the
    prenorm→normalize composition)."""
    if s is None:
        return ""
    s = s.replace('"', "")
    s = _BRACKET_RE.sub(" ", s)
    s = s.lower()
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", s).strip(" \t\n\x0b\f\r")

def make_normalize_udf():
    """pandas UDF: normalize a string column (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def normalize_udf(col: pd.Series) -> pd.Series:
        return col.map(lambda s: normalize_mention(s) if s is not None else "")

    return normalize_udf


def make_strip_accents_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def strip_accents_udf(col: pd.Series) -> pd.Series:
        return col.map(lambda s: strip_accents(s) if s is not None else None)

    return strip_accents_udf


def make_lexical_score_udf():
    """pandas UDF (Arrow-batched) scoring (mention_norm, key_norm)
    pairs — the hot fuzzy path; a batch of ~10k short strings per
    Arrow chunk, no per-row Python dispatch from the JVM."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def lexical_score_udf(m: pd.Series, k: pd.Series) -> pd.Series:
        return pd.Series(
            [lexical_score(a or "", b or "") for a, b in zip(m, k)],
            dtype="float64",
        )

    return lexical_score_udf


def iter_batches(it: Iterator, fn):  # pragma: no cover - helper
    for batch in it:
        yield fn(batch)
