"""Deterministic dense docID assignment, distributed.

The reference addresses documents by user-supplied ``_id`` strings
(``/root/reference/scripts/index/index.py:430``). Our engine needs dense,
deterministic ``long`` docIDs for delta-compressed postings and reproducible
top-k tie-breaks (SURVEY.md §7.0): global rank ordered by the unique key
columns (default ``repo, path, commit``).

Scalable pattern, ONE shuffle total (round-2 rework — the round-1 version
added a second full shuffle because ``Window.partitionBy(_pid)`` hash-
repartitions data that is already range-partitioned):

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` — the only
   exchange; also the final on-disk order (contiguous docID ranges per file).
2. ``monotonically_increasing_id()`` projected ABOVE the sort (it is a
   nondeterministic expression, so Catalyst cannot reorder it below) encodes
   ``partition_id << 33 | local_row_number`` — a free within-partition rank.
3. persist, then one cheap job collects per-partition counts → cumulative
   offsets, broadcast-joined back (map-side, preserves partitioning/order).

``doc_id = local_row_number + offset[partition]`` is the exact global rank.
Determinism: the key is unique, so the within-partition sort order is stable;
shuffle files outlive the job, so a recomputed cached block re-reads the same
shuffle partition and reproduces the same ids.

Returns ``(df, release, n_rows)`` — call ``release()`` once the downstream
write has materialized to unpin the cached blocks (ADVICE.md r1: a leaked
persist stays pinned for the application lifetime across multi-segment
builds). ``n_rows`` is the exact total row count, already known from the
per-partition counts — callers need no separate counting job (r3 serial-
section work, VERDICT r2 next #10).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

_LOCAL_MASK = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits = row


def assign_dense_doc_ids(df: DataFrame, order_cols: List[str],
                         num_partitions: Optional[int] = None,
                         ) -> Tuple[DataFrame, Callable[[], None], int]:
    """Add ``doc_id`` = dense global rank by ``order_cols`` (must be a unique
    key for determinism across runs/partitionings)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Pin the input for the duration of the exchange (r8, guide §2.4): the
    # range exchange's boundary-sampling job executes the WHOLE child plan —
    # unpersisted, that re-ran the source scan + normalization (filter,
    # sha256, truncation) once per build just to sketch key boundaries
    # (measured ~1 s of the 2.2 s phase at bench scale). The pin is released
    # as soon as the shuffled/persisted `part` is materialized by the counts
    # job below. doc_id values are partitioning-independent (global rank by a
    # unique key), so this changes no output byte. At very large inputs the
    # cache degrades to disk and trades a second source scan for a local
    # spill write — parity at worst.
    base = df.persist(StorageLevel.MEMORY_AND_DISK)
    part = (base.repartitionByRange(n, *[F.col(c) for c in order_cols])
                .sortWithinPartitions(*[F.col(c) for c in order_cols])
                .withColumn("_mid", F.monotonically_increasing_id())
                .persist(StorageLevel.MEMORY_AND_DISK))
    pid = F.shiftright("_mid", 33).cast("int")
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy(pid.alias("_pid"))
                  .agg(F.count("*").alias("cnt")).collect()}
    base.unpersist()  # `part` is materialized; the input pin has done its job
    offsets, acc = [], 0
    for p in sorted(counts):  # range partitions are globally ordered by pid
        offsets.append((p, acc))
        acc += counts[p]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    out = (part.withColumn("_pid", pid)
               .join(F.broadcast(off_df), "_pid")
               .withColumn("doc_id",
                           (F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK))
                            + F.col("_off")).cast("long"))
               .drop("_pid", "_off", "_mid"))
    return out, lambda: part.unpersist(), acc
