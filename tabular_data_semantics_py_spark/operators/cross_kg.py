"""D4 — the genuine cross-KG hop (SURVEY.md §2.7, reference
``matching/kg_matching.py:394-440`` __getTypesWikidataStrategy):

dbpedia-role entity → sameAs → wikidata-role twin(s) → their
wd-namespace rdf:type set (killed entirely if it contains the
disambiguation marker, kg_matching.py:417-420 / Q4167410) →
equivalent dbo classes (P1709/P2888-role equivalence rows) →
superclass closure expansion → dbo-namespace filter, top concepts
removed.

All value-based joins against broadcast-scale dimensions (sameAs
edges, wd-class equivalences, closure); the only fact-table touch is
one rdf:type scan filtered to the wd namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    AVOID_TOP_CONCEPTS,
    ONTOLOGY_NS,
    RDF_TYPE,
    WD_DISAMBIGUATION_CLASS,
    WD_ONTOLOGY_NS,
)


def wikidata_strategy_types(
    cross_sameas: DataFrame,
    kg_triples: DataFrame,
    wd_equiv: DataFrame,
    closure: DataFrame,
) -> DataFrame:
    """→ (uri, types_wd:array<string> sorted): the D4 type set per
    source entity that has at least one surviving (non-disambiguation)
    wikidata twin with mappable types."""
    # wd rdf:type edges, wd-namespace filtered (incl. the kill marker)
    wd_types = kg_triples.where(
        (F.col("pred") == RDF_TYPE)
        & F.col("obj").startswith(WD_ONTOLOGY_NS)
    ).select(F.col("subj").alias("wd_uri"), F.col("obj").alias("wd_cls"))

    # per-twin kill: a twin typed as a disambiguation page contributes
    # nothing (kg_matching.py:417-420)
    killed = wd_types.where(
        F.col("wd_cls") == WD_DISAMBIGUATION_CLASS
    ).select("wd_uri").distinct()
    alive = wd_types.join(F.broadcast(killed), "wd_uri", "left_anti")

    dbo = (
        cross_sameas.join(alive, "wd_uri")
        .join(F.broadcast(wd_equiv), "wd_cls")
        .select("uri", F.col("dbo_cls").alias("t"))
    )
    anc = dbo.join(
        F.broadcast(
            closure.where(F.col("ancestor_uri").startswith(ONTOLOGY_NS))
        ),
        dbo.t == F.col("class_uri"),
    ).select("uri", F.col("ancestor_uri").alias("t"))

    avoid = F.array(*[F.lit(x) for x in sorted(AVOID_TOP_CONCEPTS)])
    return (
        dbo.union(anc)
        .groupBy("uri")
        .agg(
            F.array_sort(
                F.array_except(F.collect_set("t"), avoid)
            ).alias("types_wd")
        )
        .where(F.size("types_wd") > 0)
    )
