"""Plan-truncating stage barriers sized for the storage they use.

Two kinds of barrier, chosen by expected size:

- ``ckpt`` (small dims / bridges): eager ``localCheckpoint`` — executor
  storage blocks, sub-second, fine for anything broadcast-scale.
- ``parquet_barrier`` (fact-scale stage outputs): a snappy-parquet
  round trip through the session scratch dir. A ``localCheckpoint`` of
  a fact table occupies the unified-memory *storage* pool, and every
  later shuffle/aggregation then fights it for *execution* memory —
  measured on the sf2.5 bench corpus this turns the second
  materialization of a run from 11 s into 92 s (eviction thrash). At
  the 100 TB target a full-corpus executor-storage checkpoint is
  impossible by construction; stage outputs live on (distributed)
  storage, which is exactly what this barrier models. Parquet is also
  5-10x smaller than the in-memory rows for the string-heavy KG
  tables, and successive runs overwrite instead of stacking blocks.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

# per-process generation counter: every barrier write gets a fresh
# directory, so DataFrames returned by *earlier* pipeline runs in the
# same session stay valid (a shared overwrite path breaks any
# still-referenced lazy plan over the previous files — observed as
# FileNotFoundException in a session that runs the pipeline twice).
_SEQ = itertools.count()


def _scratch_dir(spark: SparkSession) -> str:
    app_id = spark.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"tds_stage_{app_id}")


def parquet_barrier(
    df: DataFrame, name: str, by: list[str] | None = None
) -> DataFrame:
    """Materialize ``df`` to scratch parquet and return a fresh native
    scan of it (plan truncated, storage pool untouched).

    Each call writes a new generation dir (bounded only by
    ``clear_scratch``): disk is reclaimed by ``clear_scratch`` between
    standalone pipeline reps (bench does) or at session end; at real
    scale the checkpoint_dir mode owns stage storage instead.

    The write is repartitioned to ``defaultParallelism`` files: AQE
    byte-coalescing otherwise packs a small-in-bytes barrier into ONE
    file, and since each Spark-written file is a single row group, a
    one-file barrier is unsplittable — every downstream stage over it
    collapses to one task no matter the core count (measured: the
    cea_linked scan ran 1.2M rows single-task, 4-6 s serial per
    consumer). One extra small shuffle at write time buys parallel
    scans for every consumer.

    ``by`` (unused, kept for call-site documentation): the stage's
    natural partitioning key. The write itself relies on the session's
    AQE floor (coalescePartitions.minPartitionSize=16k, session.py): a
    shuffle-fed stage lands at ~bytes/16k partitions — data-
    proportional width, so a small-sf barrier is a handful of files
    (cheap task dispatch) and a large one is executor-wide, and every
    barrier input here is shuffle-fed or scan-wide. Probing the plan
    width via ``df.rdd`` is NOT an option: under AQE that conversion
    materializes the query stages, executing the upstream once for the
    probe and again for the write.
    """
    spark = df.sparkSession
    path = os.path.join(_scratch_dir(spark), f"{name}-g{next(_SEQ)}")
    df.write.parquet(path)
    return spark.read.parquet(path)


def clear_scratch(spark: SparkSession) -> None:
    """Delete every stage-barrier generation of this session. Only safe
    when no DataFrame from a previous ``run_pipeline`` call is still
    live (bench drops them before calling)."""
    shutil.rmtree(_scratch_dir(spark), ignore_errors=True)
