"""Type-enrichment cascade (SURVEY.md §2.7 D1-D6).

Reimplements the reference's order-dependent strategy fallback
(matching/kg_matching.py:301-355 lookup strategy, 357-389 predicate
strategy, 522-590 type analysis, 596-624 compatibility) as a column
pipeline: every strategy's output is its own array column and the
cascade is an explicit ``when`` chain — no per-row Python in the
relational parts.

Join strategy at scale: ``kg_triples`` is the big fact table; all
aggregations on it are partial-agg friendly groupBys keyed by entity
URI. ``property_meta`` and the ontology closure are tiny dimensions
(broadcast). Compatibility checks — set-vs-set reachability in the
class DAG — use an Arrow-batched pandas UDF over the broadcast closure
map: the one place a join would need a quadratic explode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, StringType
from pyspark.sql.window import Window

from ..constants import (
    AVOID_TOP_CONCEPTS,
    ONTOLOGY_NS,
    PREDICATE_TOP_RANGE,
    RDF_TYPE,
)


def _avoid_tops_lit():
    return F.array(*[F.lit(x) for x in sorted(AVOID_TOP_CONCEPTS)])


def _aslist(v) -> list:
    """Arrow hands array columns to pandas UDFs as numpy arrays whose
    truthiness is ambiguous — normalize to a plain list."""
    if v is None:
        return []
    return list(v)


def _compatible(t: str, ref: list[str], cl: dict[str, dict[str, int]]) -> bool:
    """t ∈ {s} ∪ ancestors(s) ∪ descendants(s) for some s ∈ ref
    (kg_matching.py:596-624)."""
    for s in ref:
        if t == s or t in cl.get(s, {}) or s in cl.get(t, {}):
            return True
    return False


def build_entity_types(
    entity_index: DataFrame,
    kg_triples: DataFrame,
    property_meta: DataFrame,
    closure: DataFrame,
    closure_map: dict[str, dict[str, int]],
) -> DataFrame:
    """→ (uri, types:array<string> sorted) — the D-cascade result,
    ancestor-expanded, AVOID_TOP_CONCEPTS removed."""

    cl = closure_map  # tiny; captured into the Arrow UDFs below

    @pandas_udf(BooleanType())
    def compat_one(t: pd.Series, ref: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _compatible(a, _aslist(b), cl) if a is not None else False
                for a, b in zip(t, ref)
            ]
        )

    @pandas_udf(ArrayType(StringType()))
    def compat_filter(ts: pd.Series, ref: pd.Series) -> pd.Series:
        out = []
        for arr, r in zip(ts, ref):
            al = _aslist(arr)
            rl = _aslist(r)
            kept = [t for t in al if _compatible(t, rl, cl)]
            out.append(kept if kept else al)  # kg_matching.py:345-350 fallback
        return pd.Series(out)

    # D1/D2: lookup-strategy types — index types, ns-filtered, cleared
    # for disambiguation pages (kg_matching.py:417-420)
    lookup = entity_index.select(
        "uri",
        F.when(F.col("is_disambiguation"), F.array().cast("array<string>"))
        .otherwise(
            F.array_except(
                F.filter(
                    F.col("types"),
                    lambda t: t.startswith(F.lit(ONTOLOGY_NS)),
                ),
                _avoid_tops_lit(),
            )
        )
        .alias("lookup_types"),
    )

    # endpoint types: rdf:type edges (kg/endpoints.py:452-466 role)
    endpoint = (
        kg_triples.where(
            (F.col("pred") == RDF_TYPE)
            & F.col("obj").startswith(ONTOLOGY_NS)
        )
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.collect_set("obj").alias("endpoint_types"))
    )

    # D3 predicate strategy: top-2 range types where entity is object,
    # top-1 domain type where subject if compatible (kg_matching.py:357-389)
    rel = kg_triples.where(
        (~F.col("obj_is_literal")) & (F.col("pred") != RDF_TYPE)
    )
    pm = F.broadcast(property_meta)
    rv = (
        rel.join(pm, "pred")
        .groupBy(F.col("obj").alias("uri"), F.col("range_uri"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w_r = Window.partitionBy("uri").orderBy(F.desc("votes"), F.asc("range_uri"))
    top_ranges = (
        rv.withColumn("rn", F.row_number().over(w_r))
        .where(F.col("rn") <= PREDICATE_TOP_RANGE)
        .groupBy("uri")
        .agg(F.collect_set("range_uri").alias("range_types"))
    )
    dv = (
        rel.join(pm, "pred")
        .groupBy(F.col("subj").alias("uri"), F.col("domain_uri"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w_d = Window.partitionBy("uri").orderBy(F.desc("votes"), F.asc("domain_uri"))
    top_domain = (
        dv.withColumn("rn", F.row_number().over(w_d))
        .where(F.col("rn") == 1)
        .select("uri", F.col("domain_uri").alias("domain_type"))
    )
    pred_types = (
        top_ranges.join(top_domain, "uri", "full_outer")
        .withColumn(
            "range_types",
            F.coalesce(F.col("range_types"), F.array().cast("array<string>")),
        )
        .withColumn(
            "pred_types",
            F.when(
                (F.size("range_types") > 0)
                & F.col("domain_type").isNotNull()
                & compat_one(F.col("domain_type"), F.col("range_types")),
                F.array_union("range_types", F.array(F.col("domain_type"))),
            ).otherwise(F.col("range_types")),
        )
        .select("uri", "pred_types")
    )

    empty = F.array().cast("array<string>")
    base = (
        lookup.join(endpoint, "uri", "left")
        .join(pred_types, "uri", "left")
        .withColumn("endpoint_types", F.coalesce("endpoint_types", empty))
        .withColumn("pred_types", F.coalesce("pred_types", empty))
        .withColumn(
            "base_types",
            # D2 cascade (kg_matching.py:301-355): lookup hit wins; else
            # endpoint types compat-filtered against predicate types
            # (raw endpoint fallback); else predicate types alone.
            F.when(F.size("lookup_types") > 0, F.col("lookup_types"))
            .when(
                (F.size("endpoint_types") > 0) & (F.size("pred_types") > 0),
                compat_filter(F.col("endpoint_types"), F.col("pred_types")),
            )
            .when(F.size("endpoint_types") > 0, F.col("endpoint_types"))
            .otherwise(F.col("pred_types")),
        )
        .select("uri", "base_types")
        # pinned-width repartition before the checkpoint: AQE coalesces
        # the tiny join output to 1 partition, which would serialize
        # the explode→closure-join→collect_set chain fused on top of it
        .repartition(
            entity_index.sparkSession.sparkContext.defaultParallelism,
            "uri",
        )
        .localCheckpoint(True)  # consumed twice below
    )

    # ancestor expansion via the broadcast closure dimension
    # (kg/endpoints.py:452-466 superclass closure role)
    anc = (
        base.select("uri", F.explode("base_types").alias("t"))
        .join(
            F.broadcast(
                closure.where(F.col("ancestor_uri").startswith(ONTOLOGY_NS))
            ),
            F.col("t") == F.col("class_uri"),
        )
        .groupBy("uri")
        .agg(F.collect_set("ancestor_uri").alias("anc_types"))
    )
    return (
        base.join(anc, "uri", "left")
        .withColumn("anc_types", F.coalesce("anc_types", empty))
        .select(
            "uri",
            F.array_sort(
                F.array_except(
                    F.array_union("base_types", "anc_types"), _avoid_tops_lit()
                )
            ).alias("types"),
        )
    )


def make_most_specific_udf(closure_map: dict[str, dict[str, int]],
                           agent_class: str):
    """Most-specific-class reduction (challenge_utils.py:196-245):
    drop Agent, then any class that is a strict (depth ≥ 1) ancestor
    of another class in the set. Arrow-batched; the closure map is a
    tiny broadcast dimension."""
    cl = closure_map

    @pandas_udf(ArrayType(StringType()))
    def most_specific(types: pd.Series) -> pd.Series:
        out = []
        for arr in types:
            ts = [t for t in _aslist(arr) if t != agent_class]
            kept = [
                t
                for t in ts
                if not any(
                    u != t and cl.get(u, {}).get(t, 0) >= 1 for u in ts
                )
            ]
            out.append(sorted(kept))
        return pd.Series(out)

    return most_specific
