"""IVF ANN quality + block-GEMM equivalence (operators/similarity.py).

The driver's testdata embeddings are isotropic random (mean pairwise
cosine ≈ 0, measured in ROUND_NOTES), where no inverted-file index can
keep recall without probing most cells — that is a property of the
data, not the index. Recall is therefore asserted on a deterministic
*clustered* corpus (the regime IVF exists for), plus a monotonicity
sanity check on the real testdata.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tabular_data_semantics_py_spark.operators.similarity import (
    cosine_pairs,
    cosine_pairs_blocked,
    ivf_knn,
    knn_bruteforce,
)

SF001 = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def clustered_emb(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(60):
            v = c + 0.15 * rng.normal(size=32)
            rows.append((vid, v.astype(float).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>"
    ).localCheckpoint()


def test_ivf_recall_on_clustered_data(spark, clustered_emb):
    """Trained IVF with n_probe=2/8 (25% of cells scanned) keeps
    recall@3 >= 0.9 on clusterable data."""
    q = list(range(0, 480, 24))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(clustered_emb, q, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(
            clustered_emb, spark, q, k=3, n_centroids=8, n_probe=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@3 = {recall}"


def test_ivf_probe_monotone_on_testdata(spark):
    """On the isotropic testdata, recall must still rise with n_probe
    and reach 1.0 at n_probe == n_centroids (full scan ≡ exact)."""
    emb = spark.read.parquet(SF001).localCheckpoint()
    q = list(range(10))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, q, k=3).collect()
    }

    def recall(p):
        a = {
            (r.query_id, r.neighbor_id)
            for r in ivf_knn(emb, spark, q, k=3, n_centroids=8, n_probe=p)
            .collect()
        }
        return len(exact & a) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0
    assert r2 <= r8


def test_blocked_gemm_equals_fold_pairs(spark):
    """cosine_pairs_blocked ≡ cosine_pairs (exact fold verification on
    GEMM candidates), with no collect of the fact table."""
    emb = spark.read.parquet(SF001).localCheckpoint()
    base = {(r.i, r.j) for r in cosine_pairs(emb, 0.4).collect()}
    fast = {
        (r.i, r.j)
        for r in cosine_pairs_blocked(emb, 0.4, n_blocks=4).collect()
    }
    assert base == fast


def test_srp_neardup_equals_exact_on_tight_clusters(spark):
    """srp_lsh_pairs at 256 bits x 32 bands on tight clusters
    (within-cluster cos ~ 0.97): P(miss) <= (1 - p^8)^32 ~ 6e-11 per
    pair, so the LSH output must equal the brute-force cosine set
    exactly — the near-dup regime the operator exists for."""
    from tabular_data_semantics_py_spark.operators.similarity import (
        srp_lsh_pairs,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(25):
            v = c + 0.03 * rng.normal(size=32)
            rows.append((vid, v.astype(float).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>"
    ).localCheckpoint()

    exact = {(r.i, r.j) for r in cosine_pairs(emb, 0.9).collect()}
    assert len(exact) > 100  # the fixture really is clustered
    lsh = {
        (r.i, r.j)
        for r in srp_lsh_pairs(
            emb, spark, 0.9, n_bits=256, n_bands=32
        ).collect()
    }
    assert lsh == exact


def test_srp_hot_bucket_guard_subset(spark):
    """max_bucket_size only ever drops pairs (recall trade), never
    invents them, and survivors still pass the exact verify."""
    from tabular_data_semantics_py_spark.operators.similarity import (
        srp_lsh_pairs,
    )

    emb = spark.read.parquet(SF001).localCheckpoint()
    full = {
        (r.i, r.j)
        for r in srp_lsh_pairs(emb, spark, 0.4).collect()
    }
    capped = {
        (r.i, r.j)
        for r in srp_lsh_pairs(emb, spark, 0.4, max_bucket_size=3).collect()
    }
    assert capped <= full
    exact = {(r.i, r.j) for r in cosine_pairs(emb, 0.4).collect()}
    assert full <= exact


def test_ivf_knn_empty_query_set(spark):
    """Empty / unknown query ids degrade to an empty result with the
    normal schema instead of a numpy axis error."""
    emb = spark.read.parquet(SF001).localCheckpoint()
    for qids in ([], [10**12]):
        res = ivf_knn(emb, spark, query_ids=qids, k=3)
        assert res.columns == ["query_id", "neighbor_id", "rank"]
        assert res.count() == 0


def test_srp_canonicalize_collapses_tight_clusters(spark):
    """On the tight-cluster fixture (within-cluster cos ~0.97,
    cross-cluster ~0) the SRP near-dup graph at 256x32 equals the
    exact cosine graph (P(miss) ~ 6e-11/pair), whose components are
    exactly the 6 planted clusters — so canonicalization must map
    every vector to its cluster's min vec_id, cover ALL vectors, and
    mark exactly one canonical survivor per cluster. Brute-force
    union-find over the exact cosine pairs is the ground truth."""
    from tabular_data_semantics_py_spark.operators.similarity import (
        srp_neardup_canonicalize,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(25):
            v = c + 0.03 * rng.normal(size=32)
            rows.append((vid, v.astype(float).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>"
    ).localCheckpoint()

    # ground truth: union-find over the exact cosine pair graph
    parent = {v: v for v in range(vid)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exact = [(r.i, r.j) for r in cosine_pairs(emb, 0.9).collect()]
    assert len(exact) > 100
    for i, j in exact:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
    cmin = {}
    for v in range(vid):
        r = find(v)
        cmin[r] = min(cmin.get(r, v), v)
    want = {v: cmin[find(v)] for v in range(vid)}

    got = {
        r.vec_id: (r.canonical_id, r.is_canonical)
        for r in srp_neardup_canonicalize(
            emb, spark, 0.9, n_bits=256, n_bands=32
        ).collect()
    }
    assert set(got) == set(want)  # total coverage, no drops/dups
    for v, (canon, is_c) in got.items():
        assert canon == want[v]
        assert is_c == (canon == v)
    assert sum(1 for c, _ in got.values() if c in got and got[c][1]) == vid
    assert len({c for c, _ in got.values()}) == 6  # one per planted cluster


def test_degenerate_vectors_never_pair_rank_or_crash(spark):
    """Zero-norm, NULL, and NULL-element embeddings are droppable rows,
    not job killers: cosine is NULL under the nullif guard (no ANSI
    DIVIDE_BY_ZERO abort), the numpy stages pre-filter what they can't
    convert, and a NULL score can never become everyone's rank-1
    neighbor via the NULL-first struct sort. Every path family must
    agree: only the one well-defined pair survives."""
    from tabular_data_semantics_py_spark.operators.similarity import (
        srp_lsh_pairs,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),   # zero norm: cosine undefined
        (3, None),          # NULL vector
        (4, [0.5, None]),   # NULL element
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()

    pairs = {(r.i, r.j) for r in cosine_pairs(emb, 0.5).collect()}
    assert pairs == {(0, 1)}
    assert {
        (r.i, r.j) for r in cosine_pairs_blocked(emb, 0.5).collect()
    } == pairs
    assert {
        (r.i, r.j)
        for r in srp_lsh_pairs(
            emb, spark, 0.5, n_bits=256, n_bands=32
        ).collect()
    } == pairs

    knn = knn_bruteforce(emb, [0], k=4).collect()
    assert [(r.neighbor_id, r.rank) for r in knn] == [(1, 1)]
    ivf = ivf_knn(emb, spark, query_ids=[0], k=4, n_centroids=2).collect()
    assert all(r.neighbor_id == 1 for r in ivf)


def test_quantize_int8_degenerates_and_roundtrip(spark):
    """quantize_int8: NULL / all-zero / NaN-component vectors → NULL
    scale+codes; NULL element → NULL code only; codes within int8
    range with the max-|x| component at exactly ±127; dequantization
    error bounded by 0.5/scale per component."""
    from tabular_data_semantics_py_spark.operators.similarity import (
        quantize_int8,
    )

    rows = [
        (0, [1.0, -2.0, 0.5]),
        (1, None),
        (2, [0.0, 0.0]),
        (3, [1.0, float("nan")]),
        (4, [3.0, None, -3.0]),
        (5, [-4.0, 2.0]),           # max |x| on the negative side
        (6, [1.0, float("inf")]),   # Inf: scale would be 0 -> NULL
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r.asDict() for r in quantize_int8(df).collect()}

    for vid in (1, 2, 3, 6):
        assert got[vid]["scale"] is None and got[vid]["qvec"] is None, got[vid]

    assert got[4]["qvec"] == [127, None, -127]
    assert got[5]["qvec"] == [-127, 64]  # floor(2*31.75+0.5)=floor(64.0)

    for vid, vec in rows:
        g = got[vid]
        if g["scale"] is None:
            continue
        for x, q in zip(vec, g["qvec"]):
            if x is None:
                assert q is None
                continue
            assert -127 <= q <= 127
            assert abs(x - q / g["scale"]) <= 0.5 / g["scale"] + 1e-12
