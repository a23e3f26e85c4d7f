"""Full OWL2Vec*-style ontology projection (SURVEY.md §2.9 P1-P11).

Re-expresses the reference's ``ontology/ontology_projection.py``
extraction as one declarative union of join pipelines over the
ontology-construct dimension tables. Reference anchors per family:

- P1 atomic subsumptions + P2 equivalence→two subsumptions
  (ref 325-347, queries 941-994)
- P3 rdf:type with the OWL meta-class blocklist (ref 379-389,
  query 1046-1066)
- P5 direct domain×range edges + STRUCTURAL propagation: TBox
  subjects/fillers gain subClassOf to the property's other atomic
  domains/ranges, ABox role subjects/objects gain rdf:type
  (ref 447-462, 692-763 __propagateDomain/Range(T|A)box__)
- P6 complex (union/intersection) domain×range cross product
  (ref 465-479, queries 1125-1150) — no propagation, by reference
- P7 restriction edges (some/only/min/max/exactly, RHS + LHS):
  (cls, prop, filler) + TBox propagation (ref 483-508, 848-933)
- P8 named-inverse reversal over the property's accumulated triples
  (ref 519-526, query 1181 — symmetric)
- P9 equivalent-property copy (ref 529-537, queries 1008-1042)
- P10 object role assertions from the ABox (ref 511-514) + ABox
  domain/range propagation
- P11 complex-axiom conjuncts: atomic conjunct → subsumption,
  restriction conjunct (incl. union fillers) → direct edge, no
  propagation (ref 797-844)
- data properties (ref 560-607): domain propagation only —
  restrictions propagate TBox, role assertions propagate ABox;
  literal triples themselves are excluded (include_literals=False)

Everything is select/join/union/distinct over broadcast-scale
dimension tables plus two fact-table joins (role assertions ⋈ tiny
property dims) — pure Catalyst, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    AVOID_PREDICATES,
    META_CLASSES,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
)

_T3 = ["subj", "pred", "obj"]


def _tri(df: DataFrame, s, p, o) -> DataFrame:
    return df.select(s.alias("subj"), p.alias("pred"), o.alias("obj"))


def ontology_projection_full(dfs: dict[str, DataFrame]) -> DataFrame:
    """→ (subj, pred, obj) distinct — the full projection graph."""
    edges = dfs["ontology_edges"]
    equiv = dfs["ontology_equivalent"]
    pm = dfs["property_meta"]
    xd = dfs["extra_domains"]
    cdom = dfs["complex_domains"]
    crng = dfs["complex_ranges"]
    restr = dfs["restrictions"]
    inv_p = dfs["inverse_props"]
    eq_p = dfs["equivalent_props"]
    dpm = dfs["data_property_meta"]
    drestr = dfs["data_restrictions"]
    conj = dfs["conjunct_atoms"]
    crestr = dfs["complex_restrictions"]
    tr = dfs["kg_triples"]

    sub = F.lit(RDFS_SUBCLASSOF)
    typ = F.lit(RDF_TYPE)

    # P1 + P2
    p1 = _tri(edges, F.col("class_uri"), sub, F.col("parent_uri"))
    p2 = _tri(equiv, F.col("a"), sub, F.col("b")).union(
        _tri(equiv, F.col("b"), sub, F.col("a"))
    )

    # atomic domain/range dimension (pm ∪ extra domains)
    doms = pm.select("pred", "domain_uri").union(
        xd.select("pred", "domain_uri")
    ).distinct()
    rngs = pm.select("pred", "range_uri").distinct()

    # P5 direct: cross product of atomic domains × ranges per property
    p5 = _tri(
        doms.join(rngs, "pred"),
        F.col("domain_uri"), F.col("pred"), F.col("range_uri"),
    )

    # P6 complex domain × range cross product (no propagation)
    p6 = _tri(
        cdom.join(crng, "pred"),
        F.col("domain_uri"), F.col("pred"), F.col("range_uri"),
    )

    # P7 restriction edges
    p7 = _tri(restr, F.col("cls"), F.col("pred"), F.col("filler"))

    # P10 object role assertions (ABox, blocklist-filtered)
    roles = tr.where(
        (~F.col("obj_is_literal"))
        & (F.col("pred") != RDF_TYPE)
        & ~F.col("pred").isin(*sorted(AVOID_PREDICATES))
    ).select(*_T3)

    # the reference's per-property triple_dict: direct + complex +
    # restriction + role triples — the base for inverse/equivalent
    # propagation (P8/P9)
    td = p5.union(p6).union(p7).union(roles)

    inv_sym = inv_p.union(
        inv_p.select(F.col("q").alias("p"), F.col("p").alias("q"))
    )
    p8 = _tri(
        td.join(F.broadcast(inv_sym), td.pred == inv_sym.p),
        F.col("obj"), F.col("q"), F.col("subj"),
    )

    eq_sym = eq_p.union(
        eq_p.select(F.col("q").alias("p"), F.col("p").alias("q"))
    )
    p9 = _tri(
        td.join(F.broadcast(eq_sym), td.pred == eq_sym.p),
        F.col("subj"), F.col("q"), F.col("obj"),
    )

    # P5 structural propagation — TBox: subjects/fillers of the
    # domain-range and restriction rows subsume the property's other
    # atomic domains/ranges (self-skipped, ref __propagate*Tbox__)
    tbox_pairs = p5.union(p7)  # (s, pred, o) rows processed as TBox
    tbox_dom = _tri(
        tbox_pairs.join(doms, "pred").where(
            F.col("subj") != F.col("domain_uri")
        ),
        F.col("subj"), sub, F.col("domain_uri"),
    )
    tbox_rng = _tri(
        tbox_pairs.join(rngs, "pred").where(
            F.col("obj") != F.col("range_uri")
        ),
        F.col("obj"), sub, F.col("range_uri"),
    )
    # ABox: role subjects/objects get rdf:type of the property's
    # domains/ranges (no self-skip, ref __propagate*Abox__)
    abox_dom = _tri(
        roles.join(doms, "pred"), F.col("subj"), typ, F.col("domain_uri")
    )
    abox_rng = _tri(
        roles.join(rngs, "pred"), F.col("obj"), typ, F.col("range_uri")
    )

    # data properties: TBox restriction + ABox assertion domain
    # propagation only (include_literals=False)
    data_tbox = _tri(
        drestr.join(dpm, "pred").where(F.col("cls") != F.col("domain_uri")),
        F.col("cls"), sub, F.col("domain_uri"),
    )
    data_abox = _tri(
        tr.where(F.col("obj_is_literal")).join(dpm, "pred"),
        F.col("subj"), typ, F.col("domain_uri"),
    )

    # P3 rdf:type with meta-class blocklist
    p3 = _tri(
        tr.where(
            (F.col("pred") == RDF_TYPE)
            & ~F.col("obj").isin(*sorted(META_CLASSES))
        ),
        F.col("subj"), typ, F.col("obj"),
    )

    # P11 complex-axiom conjuncts
    p11a = _tri(conj, F.col("cls"), sub, F.col("sup"))
    p11r = _tri(crestr, F.col("cls"), F.col("pred"), F.col("filler"))

    return (
        p1.union(p2).union(td).union(p8).union(p9)
        .union(tbox_dom).union(tbox_rng)
        .union(abox_dom).union(abox_rng)
        .union(data_tbox).union(data_abox)
        .union(p3).union(p11a).union(p11r)
        .distinct()
    )
