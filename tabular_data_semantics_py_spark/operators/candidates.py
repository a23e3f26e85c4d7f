"""Candidate entity generation: cell mention → top-k KG entities
(SURVEY.md §2.3 J1 + J3; reference matching/kg_matching.py:476-507,
kg/lookup.py:212-219 rebuilt as local joins — no per-row HTTP).

Dataflow (each stage cites the scale rationale):

1. mention dedup  — ``dropDuplicates`` on the normalized mention
   before any expensive work, then join results back: the reference's
   memo-cache pattern (challenge_utils.py:103-118) as dataflow. At
   100 TB the distinct-mention table is orders of magnitude smaller
   than the cell table.
2. exact match    — equi-join distinct mentions × index keys. This is
   a plain shuffle-hash/broadcast join Catalyst can pick freely; the
   index is NOT assumed broadcastable (10^8-entity scale), mentions
   are. Hot mentions ("USA" in every table) skew the *cells→mention*
   groupBy, not this join, because dedup already collapsed them.
3. fuzzy fallback — only mentions with no exact hit. Token blocking
   (shared ≥1 token) bounds the candidate pairs, then an Arrow-batched
   pandas UDF scores (edit similarity + token Jaccard)
   — kg/lookup.py:95-106's ranking, vectorized.
4. redirect resolution — ≤ REDIRECT_MAX_HOPS chained left joins on the
   redirect edge table (challenge_utils.py:441-453 bounded closure),
   dedup by final URI keeping max score.
5. top-k          — window (score desc, popularity desc, uri asc),
   pinned tie-break (SURVEY.md §7 Determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..barriers import parquet_barrier
from ..constants import FUZZY_MIN_SCORE, TOP_K_CANDIDATES
from ..functions.normalize import (
    make_lexical_score_udf,
    make_normalize_udf,
    prenorm_expr,
)


def build_index_keys(
    entity_index: DataFrame, fused: bool = False
) -> DataFrame:
    """entity_index → (uri, popularity, key_norm) — one row per
    normalized label/alias surface form (kg/lookup.py:162-209 role).

    Normalization is JVM prenorm over the exploded keys + accent-strip
    (the only Python step) on *distinct* prenormed surface forms only —
    at a 10^8-entity index the Python surface is the distinct-label
    table, not the exploded key table. The join back is unhinted so
    AQE picks broadcast when the bridge is small.
    """
    normalize = make_normalize_udf()
    sc = entity_index.sparkSession.sparkContext
    keys = entity_index.select(
        "uri",
        "popularity",
        F.explode(
            # coalesce: array_union(x, NULL) is NULL, so an entity
            # with NULL aliases (legal under the nullable source
            # schemas) would otherwise lose its LABEL key too and
            # become unmatchable by both the exact and fuzzy paths
            F.array_union(
                F.array(F.col("label")),
                F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
            )
        ).alias("key_raw"),
    ).withColumn("key_prenorm", prenorm_expr(F.col("key_raw")))
    bridge = (
        keys.where(F.col("key_prenorm") != "")
        .select("key_prenorm")
        # pinned-width dedup shuffle: keeps the accent-strip UDF below
        # parallel (AQE byte-coalescing would pack the small distinct
        # table into 1 partition; see generate_candidates)
        .repartition(sc.defaultParallelism, "key_prenorm")
        .dropDuplicates(["key_prenorm"])
        .withColumn("key_norm", normalize(F.col("key_prenorm")))
    )
    if not fused:
        # UDF column consumed by the join below across separate
        # actions; in fused mode the consumers share one action and
        # the dedup exchange collapses via ReuseExchange
        bridge = bridge.localCheckpoint(True)
    return (
        keys.join(bridge, "key_prenorm")
        .where(F.col("key_norm") != "")
        .dropDuplicates(["uri", "key_norm"])
        .select("uri", "popularity", "key_norm")
    )


def generate_candidates(
    data_cells: DataFrame,
    entity_index: DataFrame,
    top_k: int = TOP_K_CANDIDATES,
    max_token_df: int | None = None,
    fused: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (cells_with_mention, candidates).

    cells_with_mention: data cells + ``mention_norm`` column.
    candidates: (mention_norm, uri, score, popularity) — redirect-
    resolved, deduped, top-k ranked per mention.

    ``max_token_df``: hot-token cap for the fuzzy blocking index (same
    trade-off as dedup.jaccard_pairs) — tokens appearing in more than
    this many index keys are dropped from *pairing*, bounding the
    blocked-join fan-out under Zipfian mentions; scoring stays exact
    on the surviving pairs. None = no cap (fixture-exact).
    """
    score_udf = make_lexical_score_udf()
    normalize = make_normalize_udf()

    # JVM prenorm over the full cell table — pure whole-stage codegen,
    # no Python, no materialization (kills the round-1 full-corpus
    # localCheckpoint). Accent-strip runs only on distinct prenorms.
    cells_pre = data_cells.withColumn(
        "mention_prenorm", prenorm_expr(F.col("cell"))
    )
    bridge = (
        cells_pre.where(F.col("mention_prenorm") != "")
        .select("mention_prenorm")
        # pinned-width dedup shuffle (see n_score_parts note below):
        # keeps the accent-strip UDF parallel under AQE coalescing
        .repartition(
            data_cells.sparkSession.sparkContext.defaultParallelism,
            "mention_prenorm",
        )
        .dropDuplicates(["mention_prenorm"])  # A10 dedup-then-join-back
        .withColumn("mention_norm", normalize(F.col("mention_prenorm")))
    )
    # parquet barrier, not localCheckpoint: the UDF column is consumed
    # by joins across separate actions, and the parquet scan's size
    # statistics let Catalyst broadcast the bridge when (and only
    # when) it is small
    bridge = parquet_barrier(bridge, "mention_bridge")
    cells = (
        cells_pre.join(bridge, "mention_prenorm", "left")
        .withColumn("mention_norm", F.coalesce("mention_norm", F.lit("")))
        .drop("mention_prenorm")
    )
    mentions = bridge.select("mention_norm").dropDuplicates(["mention_norm"])

    # in fused mode these flow into one action (ReuseExchange dedups
    # the shared subtrees); eager barriers only when stages are
    # consumed across separate driver actions
    def _mat(df: DataFrame) -> DataFrame:
        return df if fused else df.localCheckpoint(True)

    index_keys = _mat(build_index_keys(entity_index, fused=fused))

    exact = _mat(
        mentions.join(
            index_keys, mentions.mention_norm == index_keys.key_norm
        ).select("mention_norm", "uri", F.lit(1.0).alias("score"))
    )

    # fuzzy fallback for mentions with no exact hit (token blocking)
    unmatched = mentions.join(
        exact.select("mention_norm").distinct(), "mention_norm", "left_anti"
    )
    m_tok = unmatched.select(
        "mention_norm",
        F.explode(F.split(F.col("mention_norm"), " ")).alias("tok"),
    )
    i_tok = index_keys.select(
        "uri", "key_norm", F.explode(F.split(F.col("key_norm"), " ")).alias("tok")
    )
    if max_token_df is not None:
        from .dedup import drop_hot_keys

        i_tok = drop_hot_keys(i_tok, ["tok"], max_token_df)
    # Pin the dedup shuffle's width on a prefix of the dedup keys:
    # AQE's byte-based partition coalescing is blind to the per-row
    # *Python* cost of the scorer below — at fixture scale it packs
    # the whole pair table into 1-2 partitions and serializes the
    # pandas UDF regardless of core count. An explicit repartition is
    # never coalesced; (mention_norm, uri) ⊆ the dedup key, so the
    # dedup AND the groupBy below both run exchange-free on it (no
    # extra shuffle vs the unhinted plan).
    sc = data_cells.sparkSession.sparkContext
    n_score_parts = max(
        sc.defaultParallelism * 2,
        int(data_cells.sparkSession.conf.get("spark.sql.shuffle.partitions")),
    )
    blocked = (
        m_tok.join(i_tok, "tok")
        .select("mention_norm", "uri", "key_norm")
        .repartition(n_score_parts, "mention_norm", "uri")
        .dropDuplicates(["mention_norm", "uri", "key_norm"])
    )
    fuzzy = (
        blocked.withColumn(
            "pair_score", score_udf(F.col("mention_norm"), F.col("key_norm"))
        )
        .groupBy("mention_norm", "uri")
        .agg(F.max("pair_score").alias("score"))
        .where(F.col("score") >= F.lit(FUZZY_MIN_SCORE))
        .select("mention_norm", "uri", "score")
    )

    cands = exact.unionByName(fuzzy)

    # redirect resolution: bounded 2-hop chained left joins. Only
    # advance to a redirect target that exists in the index — a
    # dangling redirect keeps the source URI (the oracle's
    # COALESCE(c.uri, b.uri, a.uri) LEFT-JOIN semantics).
    #
    # NO broadcast hint (VERDICT r04 #4): redirect pages are ordinary
    # entities, so the redirect table is a MATERIAL fraction of the
    # entity index — at the 10^8-entity target it is far past
    # broadcast size, and a forced hint would OOM executors (the same
    # reason the index join below carries no hint). Parquet stats /
    # AQE pick broadcast on their own while the table is small —
    # docs/explain_redirect_join.txt pins the fixture-scale plan at
    # BroadcastHashJoin with no hint present.
    redirects = (
        entity_index.where(F.col("redirect_to").isNotNull())
        .join(
            entity_index.select(F.col("uri").alias("_tgt")),
            F.col("redirect_to") == F.col("_tgt"),
            "left_semi",
        )
        .select(F.col("uri").alias("r_src"), F.col("redirect_to").alias("r_dst"))
    )
    for _ in range(2):  # REDIRECT_MAX_HOPS
        cands = (
            cands.join(redirects, cands.uri == redirects.r_src, "left")
            .select(
                "mention_norm",
                F.coalesce(F.col("r_dst"), F.col("uri")).alias("uri"),
                "score",
            )
        )

    # keep only URIs present in the index; attach final popularity;
    # dedup by final URI keeping max score. The index side's parquet
    # stats drive the join strategy: broadcast while small, shuffle
    # join at 10^8-entity scale — no hint needed
    ent_pop = entity_index.select("uri", "popularity")
    cands = (
        cands.join(ent_pop, "uri")
        .groupBy("mention_norm", "uri")
        .agg(F.max("score").alias("score"), F.first("popularity").alias("popularity"))
    )

    w = Window.partitionBy("mention_norm").orderBy(
        F.desc("score"), F.desc("popularity"), F.asc("uri")
    )
    ranked = (
        cands.withColumn("cand_rank", F.row_number().over(w))
        .where(F.col("cand_rank") <= top_k)
    )
    return cells, ranked
