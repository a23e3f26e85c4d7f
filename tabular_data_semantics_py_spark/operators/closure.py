"""Ontology transitive closure with min-depth (SURVEY.md §2.3 J6/J7).

The reference computes ancestor distances per class with a SPARQL
path-count query against a remote endpoint
(kg/endpoints.py:481-487,517-525) and merges equivalent classes
(kg/endpoints.py:469-477). Here the closure is built once, as a
DataFrame, by iterative self-join **doubling** — O(log diameter)
shuffles instead of O(diameter) — and then broadcast everywhere it is
consumed (the hierarchy is tiny: dbpedia.owl is 2.3k classes, fixture
is ~30; even a 10^6-class ontology closure is a few GB and still a
broadcast-or-bucketed dimension, never a fact-table shuffle).

Equivalence edges traverse at depth 0 in both directions, so an
equivalent class surfaces as a depth-0 "ancestor"; strict subsumption
has depth ≥ 1.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_closure(
    edges: DataFrame,
    equivalent: DataFrame | None = None,
) -> DataFrame:
    """edges(class_uri, parent_uri) [+ equivalent(a, b)] →
    closure(class_uri, ancestor_uri, depth) with minimal depth.

    The ontology is a broadcast-scale dimension by design (SURVEY.md
    §1.1: dbpedia.owl is 2.3k classes; even 10^6 classes collect in
    MBs), so the closure is computed once on the driver with Dijkstra
    over the collected edge list — one collect + one Arrow
    createDataFrame instead of O(log diameter) shuffle jobs. For a
    hierarchy too big to collect, fall back to
    ``build_closure_distributed``.
    """
    edge_rows = [(r[0], r[1], 1) for r in edges.collect()]
    if equivalent is not None:
        for r in equivalent.collect():
            edge_rows.append((r[0], r[1], 0))
            edge_rows.append((r[1], r[0], 0))

    adj: dict[str, list[tuple[str, int]]] = {}
    nodes: set[str] = set()
    for s, d, w in edge_rows:
        adj.setdefault(s, []).append((d, w))
        nodes.add(s)
        nodes.add(d)

    out_rows: list[tuple[str, str, int]] = []
    for src in sorted(nodes):
        dist: dict[str, int] = {src: 0}
        heap: list[tuple[int, str]] = [(0, src)]
        while heap:
            dd, n = heapq.heappop(heap)
            if dd > dist.get(n, 1 << 30):
                continue
            for m, w in adj.get(n, ()):
                nd = dd + w
                if nd < dist.get(m, 1 << 30):
                    dist[m] = nd
                    heapq.heappush(heap, (nd, m))
        for dst, dd in dist.items():
            if dst != src:
                out_rows.append((src, dst, dd))

    import pandas as pd

    spark = edges.sparkSession
    pdf = pd.DataFrame(out_rows, columns=["class_uri", "ancestor_uri", "depth"])
    return spark.createDataFrame(
        pdf, "class_uri string, ancestor_uri string, depth int"
    ).coalesce(1)


def build_closure_distributed(
    edges: DataFrame,
    equivalent: DataFrame | None = None,
    max_doublings: int = 4,
) -> DataFrame:
    """Distributed variant (iterative self-join doubling) for
    hierarchies too large to collect.

    ``max_doublings`` bounds path length at 2^max_doublings edges —
    16 by default, deeper than any real class hierarchy (dbpedia.owl
    tops out at depth ~8).
    """
    step = edges.select(
        F.col("class_uri").alias("src"),
        F.col("parent_uri").alias("dst"),
        F.lit(1).alias("depth"),
    )
    if equivalent is not None:
        eq = equivalent.select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            F.lit(0).alias("depth"),
        ).union(
            equivalent.select(
                F.col("b").alias("src"), F.col("a").alias("dst"),
                F.lit(0).alias("depth"),
            )
        )
        step = step.union(eq)

    clo = step.groupBy("src", "dst").agg(F.min("depth").alias("depth"))
    for _ in range(max_doublings):
        # truncate lineage each round: the self-join doubles the plan
        # tree per iteration, so without this Catalyst analysis cost is
        # O(2^iterations) even though the data is tiny
        clo = clo.localCheckpoint()
        hop = (
            clo.alias("l")
            .join(clo.alias("r"), F.col("l.dst") == F.col("r.src"))
            .select(
                F.col("l.src").alias("src"),
                F.col("r.dst").alias("dst"),
                (F.col("l.depth") + F.col("r.depth")).alias("depth"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        clo = (
            clo.union(hop)
            .groupBy("src", "dst")
            .agg(F.min("depth").alias("depth"))
        )
    return clo.select(
        F.col("src").alias("class_uri"),
        F.col("dst").alias("ancestor_uri"),
        "depth",
    )


def closure_to_map(closure: DataFrame) -> dict[str, dict[str, int]]:
    """Collect the (tiny) closure to a driver dict for broadcasting
    into the compatibility pandas UDFs (kg_matching.py:596-624 role)."""
    out: dict[str, dict[str, int]] = {}
    for row in closure.collect():
        out.setdefault(row["class_uri"], {})[row["ancestor_uri"]] = row["depth"]
    return out
