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

import os
import tempfile

from pyspark.sql import DataFrame


def _scratch_dir(df: DataFrame) -> str:
    app_id = df.sparkSession.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"tds_stage_{app_id}")


def parquet_barrier(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` to scratch parquet and return a fresh native
    scan of it (plan truncated, storage pool untouched).

    Keyed by (applicationId, name) and written with mode=overwrite: one
    pipeline run at a time per session (the repo's usage), bounded
    disk. DataFrames returned by a *previous* run become invalid once
    the same stage is overwritten — drop them first (bench does).
    """
    path = os.path.join(_scratch_dir(df), name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
