"""Property-based tests (SURVEY.md §5.1 item 4) — pure-Python cores,
no Spark session needed."""

import csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from tabular_data_semantics_py_spark.fixtures.generator import (
    FixtureCorpus,
    _mk_csv,
)
from tabular_data_semantics_py_spark.fixtures.oracle import parse_csv_content
from tabular_data_semantics_py_spark.functions.normalize import (
    lexical_score,
    normalize_mention,
)

# text alphabet covering the perturbation space: accents, quotes,
# brackets, commas, whitespace
CELL = st.text(
    alphabet="abcXYZ áéßü\"(),\\0123456789",
    min_size=0, max_size=24,
)


@given(CELL)
def test_normalize_idempotent(s):
    once = normalize_mention(s)
    assert normalize_mention(once) == once


@given(CELL)
def test_prenorm_composes_with_normalize(s):
    """normalize(prenorm(s)) == normalize(s): the JVM prenorm split in
    operators/candidates.py must not change any mention_norm value."""
    from tabular_data_semantics_py_spark.functions.normalize import (
        prenorm_py,
    )

    assert normalize_mention(prenorm_py(s)) == normalize_mention(s)


@given(st.text(min_size=0, max_size=32))  # arbitrary unicode
def test_prenorm_composes_unicode(s):
    from tabular_data_semantics_py_spark.functions.normalize import (
        prenorm_py,
    )

    assert normalize_mention(prenorm_py(s)) == normalize_mention(s)


@given(CELL)
def test_normalize_ascii_lower(s):
    out = normalize_mention(s)
    assert out == out.lower()
    assert all(ord(c) < 128 for c in out)
    assert "  " not in out and out == out.strip()


@given(CELL, CELL)
def test_lexical_score_bounds_and_identity(a, b):
    na, nb = normalize_mention(a), normalize_mention(b)
    s = lexical_score(na, nb)
    assert 0.0 <= s <= 1.0
    assert lexical_score(na, na) == 1.0
    assert lexical_score(na, nb) == lexical_score(nb, na)


@settings(max_examples=50)
@given(
    st.lists(
        st.lists(CELL.filter(lambda c: "\n" not in c and "\r" not in c),
                 min_size=3, max_size=3),
        min_size=1, max_size=6,
    )
)
def test_csv_roundtrip(rows):
    """Render with the writer the fixtures use, parse with the pinned
    reference semantics: full-width rows survive byte-exactly."""
    header = ["a", "b", "c"]
    content = _mk_csv(header, rows)
    got_header, got_rows = parse_csv_content(content)
    assert got_header == header
    # rows that the csv module round-trips at full width must match;
    # every returned row must be header-width
    assert all(len(r) == 3 for _i, r in got_rows)
    by_idx = dict(got_rows)
    for i, row in enumerate(rows):
        if i in by_idx:
            assert by_idx[i] == row


def _mini_corpus_closure():
    corpus = FixtureCorpus(
        seed=0,
        classes=[(c, c) for c in "ABCDEF"],
        edges=[("B", "A"), ("C", "B"), ("D", "B"), ("E", "C"), ("F", "A")],
        equivalent=[("D", "F")],
        entities=[], triples=[], property_meta=[], tables=[], repos=[],
    )
    return corpus.closure()


def test_closure_triangle_inequality():
    clo = _mini_corpus_closure()
    nodes = set(clo) | {a for d in clo.values() for a in d}
    for x in clo:
        for y, dxy in clo[x].items():
            for z, dyz in clo.get(y, {}).items():
                if z in clo[x] and z != x:
                    assert clo[x][z] <= dxy + dyz


def test_closure_equivalence_bidirectional_zero():
    clo = _mini_corpus_closure()
    assert clo["D"]["F"] == 0 and clo["F"]["D"] == 0
    # D reaches A via B (depth 2) and via F (0 + 1): min wins
    assert clo["D"]["A"] == 1


@settings(max_examples=50)
@given(st.lists(st.sampled_from(["t1", "t2", "t3"]), min_size=1, max_size=30),
       st.randoms())
def test_vote_argmax_permutation_invariant(votes, rnd):
    """A3/A4: the winner under (count desc, name asc) is invariant
    under input permutation (the reference's dict-order tie-break is
    not — this is the pinned rule)."""
    def winner(vs):
        counts = {}
        for v in vs:
            counts[v] = counts.get(v, 0) + 1
        return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]

    shuffled = list(votes)
    rnd.shuffle(shuffled)
    assert winner(votes) == winner(shuffled)


# ---------------------------------------------------------------------------
# Hot-key bucket-split arithmetic (operators/temporal.py): the
# count-quantile edge scheme (r6). The operators rely on three
# invariants for ANY ascending edge array, however the percentile
# grid produced it: the edge-search bucket map is monotone and lands
# in [0, nb-1] (equal ords share a bucket — the carry patch and the
# sessionize fragment chaining both assume a match's bucket never
# exceeds the left row's); and for range_agg, with edges spaced at
# least one frame width apart, the [b_min, b_min+0/1] replica span
# derived by the single-fold-plus-next-edge shortcut covers every
# bucket holding a frame-matching left row. These mirror the
# operator's expressions 1:1 in Python floats (= IEEE doubles) and
# let hypothesis hunt for a combination that breaks them.
# NOTE input-range precondition (ADVICE r05): ord columns are cast to
# double for the bucket salt, so ordinals beyond 2**52 can lose
# integer exactness; the operators require |ord| <= 2**52 (micros
# since 1970 are ~2**51 in year 2100) and the strategies pin that
# domain.
# ---------------------------------------------------------------------------


def _mirror_edges(ords, th, gap):
    """Python mirror of _hot_bucket_stats' edge construction over an
    EXACT quantile grid (percentile_approx error only moves edges,
    never breaks the invariants below, which hold for any ascending
    array surviving the spacing fold)."""
    import math

    n = len(ords)
    s = sorted(float(x) for x in ords)
    grid_q = 256
    nb = min(math.ceil(n / th), grid_q)
    raw = []
    for i in range(1, nb):
        k = math.floor(i * grid_q / nb)  # 1-based grid index
        # exact-quantile stand-in for the percentile grid point
        idx = min(len(s) - 1, max(0, round(k / grid_q * (n - 1))))
        raw.append(s[idx])
    edges = []
    for e in raw:
        if not edges or e >= edges[-1] + max(gap, 1e-9):
            edges.append(e)
    return edges


def _bkt(edges, x):
    """Mirror of temporal._bkt_of: number of edges <= x."""
    return sum(1 for e in edges if float(x) >= e)


ORDS = st.lists(
    st.integers(min_value=-(2**52), max_value=2**52),
    min_size=2, max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(
    ords=ORDS,
    th=st.integers(min_value=1, max_value=8),
    lower=st.integers(min_value=-(2**40), max_value=2**40),
    span=st.integers(min_value=0, max_value=2**40),
)
def test_range_bucket_replica_span_covers_every_match(ords, th, lower, span):
    upper = lower + span
    edges = _mirror_edges(ords, th, float(upper - lower))
    nb = len(edges) + 1
    for x in ords:
        assert 0 <= _bkt(edges, x) <= nb - 1
    for l in ords:
        for r in ords:
            if not (l + lower <= r <= l + upper):
                continue  # r outside l's frame: irrelevant
            b_l = _bkt(edges, l)
            b_min = _bkt(edges, float(r) - float(upper))
            # the operator's b_max shortcut: at most one edge can sit
            # in (r-upper, r-lower] given the spacing floor
            nxt = edges[b_min] if b_min < len(edges) else None
            b_max = b_min + (
                1 if nxt is not None and float(r) - float(lower) >= nxt
                else 0
            )
            assert b_min <= b_l <= b_max, (l, r, b_min, b_l, b_max)


@settings(max_examples=300, deadline=None)
@given(ords=ORDS, th=st.integers(min_value=1, max_value=8))
def test_asof_bucket_map_monotone_and_bounded(ords, th):
    """asof/sessionize bucket salt: equal ords share a bucket, the
    map is non-decreasing (so a match can only precede or share the
    left row's bucket — exactly what the carry patch assumes), and
    every bucket id lands in [0, nb-1]."""
    edges = _mirror_edges(ords, th, 0.0)
    nb = len(edges) + 1
    s = sorted(ords)
    for a, c in zip(s, s[1:]):
        assert _bkt(edges, a) <= _bkt(edges, c), (a, c)
        if a == c:
            assert _bkt(edges, a) == _bkt(edges, c)
    for x in ords:
        assert 0 <= _bkt(edges, x) <= nb - 1, (x, _bkt(edges, x), nb)
