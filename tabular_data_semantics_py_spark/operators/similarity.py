"""Embedding similarity search: brute-force cosine (correctness
baseline) and IVF-bucketed ANN (scale path).

Cosine is computed with ``aggregate``/``zip_with`` column expressions
— sequential IEEE-double folds that stay inside whole-stage codegen
and match an ANSI-SQL oracle bit-for-bit. The ANN path uses numpy GEMM
inside ``mapInPandas`` against a broadcast centroid/query matrix — the
pattern that scales to 10^9 vectors (per-partition BLAS, no shuffle of
the big side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a, b):
    """Sequential-fold cosine: dot/(sqrt(dot_aa)*sqrt(dot_bb)) over
    double-cast arrays — deterministic, SQL-oracle-matchable."""
    ad, bd = _as_double(a), _as_double(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold — embedding near-dup
    detection. O(n²) reference implementation; the LSH/IVF variants
    bound the candidate set at scale."""
    a = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cos") >= threshold)
        .select("i", "j")
    )


def knn_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank): exact top-k cosine neighbors
    for the given query ids. The query side is tiny → broadcast
    nested-loop join; rank ties broken by neighbor id."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    spark,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Block nested-loop cosine pairs via numpy GEMM in mapInPandas:
    the full (normalized) matrix is broadcast, each partition GEMMs
    its block against it — no O(n²) shuffle rows, per-partition BLAS.
    At true scale the broadcast side becomes a loop over matrix
    chunks; the plumbing is identical. Output ≡ ``cosine_pairs``.
    """
    import numpy as np

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    b = spark.sparkContext.broadcast((ids, Mn))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_m = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = Vn @ all_m.T
            bi = pdf[id_col].to_numpy()
            mask = (sims >= threshold) & (bi[:, None] < all_ids[None, :])
            r, c = np.nonzero(mask)
            yield pd.DataFrame({"i": bi[r], "j": all_ids[c]})

    return emb.select(id_col, vec_col).mapInPandas(run, "i long, j long")


def ivf_knn(
    emb: DataFrame,
    spark,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (the first n_centroids
    vectors by id — a k-means seed step, pinned for reproducibility),
    partition vectors by nearest centroid, search only the n_probe
    closest centroids per query. numpy GEMM in mapInPandas on both
    sides; approximate by construction (rows-only correctness check).
    """
    import numpy as np

    cent_rows = (
        emb.orderBy(id_col).limit(n_centroids).select(id_col, vec_col).collect()
    )
    C = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    bC = spark.sparkContext.broadcast(Cn)

    out_schema = f"{id_col} long, centroid int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cl = bC.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "centroid": (Vn @ Cl.T).argmax(axis=1)}
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(assign, out_schema)
    inv = emb.join(assigned, id_col)

    q_rows = emb.where(F.col(id_col).isin(query_ids)).collect()
    Q = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probes = np.argsort(-(Qn @ Cn.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(r[id_col]), int(c))
        for r, pr in zip(q_rows, probes)
        for c in pr
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, centroid int")
    qdf = spark.createDataFrame(
        [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in q_rows],
        f"query_id long, qv array<double>",
    )
    cand = (
        inv.join(F.broadcast(probe_df), "centroid")
        .join(F.broadcast(qdf), "query_id")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )
