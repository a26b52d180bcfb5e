"""Deterministic dense docID assignment, distributed.

The reference addresses documents by user-supplied ``_id`` strings
(``/root/reference/scripts/index/index.py:430``). Our engine needs dense,
deterministic ``long`` docIDs for delta-compressed postings and reproducible
top-k tie-breaks (SURVEY.md §7.0): global rank ordered by the unique key
columns (default ``repo, path, commit``).

Scalable pattern (no global single-partition window): range-repartition by the
key, rank *within* each partition, then add per-partition offsets computed
from a small count job. The input is persisted between the two jobs so the
sampled range boundaries cannot shift.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel


def assign_dense_doc_ids(df: DataFrame, order_cols: List[str],
                         num_partitions: Optional[int] = None) -> DataFrame:
    """Add ``doc_id`` = dense global rank by ``order_cols`` (must be a unique
    key for determinism across runs/partitionings)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (df.repartitionByRange(n, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id())
              .persist(StorageLevel.MEMORY_AND_DISK))
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (part.join(F.broadcast(off_df), "_pid")
               .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("_off"))
               .drop("_pid", "_off"))
    return out
