"""Incremental (streaming) index ingest — a Spark-first EXTENSION.

The reference is strictly batch (SURVEY.md §2.9: bulk load with refresh
disabled, then search; its ``refresh_interval`` is ES near-real-time
visibility, not stream processing). This module is the Structured-Streaming
analog of that refresh model: each micro-batch becomes one immutable index
*segment* (exactly like an ES refresh producing a Lucene segment), and
compaction merges segments into a queryable index (the ES force-merge /
stage-merge analog, one Spark job via merging.merge_indexes).

Exactly-once: ``foreachBatch`` epochs are idempotent — a segment whose
lineage marker exists is skipped on replay, so sink retries cannot duplicate
documents (the streaming analog of the reference's completion-marker files).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_alps_spark import fsio
from elasticsearch_alps_spark.config import IndexConfig
from elasticsearch_alps_spark.indexing.builder import IndexPaths, build_index
from elasticsearch_alps_spark.merging.merger import merge_indexes


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, root: str,
                 cfg: Optional[IndexConfig] = None, *,
                 text_col: str = "content",
                 id_cols: Sequence[str] = ("repo", "path", "commit"),
                 doc_id_col: Optional[str] = None,
                 shards: Optional[int] = None):
        self.spark = spark
        self.root = root
        self.cfg = cfg or IndexConfig()
        self.text_col = text_col
        self.id_cols = tuple(id_cols)
        self.doc_id_col = doc_id_col
        self.shards = shards
        if "://" not in self.segments_root:  # Hadoop FSs create implicitly
            os.makedirs(self.segments_root, exist_ok=True)

    @property
    def segments_root(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def compacted_dir(self) -> str:
        return os.path.join(self.root, "compacted")

    def segment_dirs(self) -> list:
        out = []
        if "://" not in self.segments_root:
            names = sorted(os.listdir(self.segments_root))
        else:  # J3 index discovery on hdfs/s3a roots (fsio, r2)
            names = fsio.list_dirs(self.segments_root, self.spark)
        for name in names:
            d = os.path.join(self.segments_root, name)
            if fsio.exists(os.path.join(d, "stats.json")):
                out.append(d)
        return out

    def _segment_dir(self, epoch_id: int) -> str:
        return os.path.join(self.segments_root, f"epoch_{epoch_id:010d}")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch sink: one micro-batch → one immutable segment.
        Idempotent on epoch replay (segment stats.json is the marker)."""
        seg = self._segment_dir(epoch_id)
        if fsio.exists(os.path.join(seg, "stats.json")):
            return  # epoch replayed after a failure — already ingested
        if batch_df.isEmpty():
            return
        build_index(self.spark, batch_df, seg, self.cfg,
                    text_col=self.text_col, id_cols=self.id_cols,
                    doc_id_col=self.doc_id_col, shards=self.shards)

    def start(self, stream_df: DataFrame, checkpoint: Optional[str] = None,
              **trigger):
        """Attach to a streaming DataFrame; returns the StreamingQuery."""
        return (stream_df.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation",
                        checkpoint or os.path.join(self.root, "_checkpoint"))
                .trigger(**(trigger or {"availableNow": True}))
                .start())

    def compact(self) -> IndexPaths:
        """Merge all segments into one queryable index (the force-merge
        analog; SURVEY.md §3.3's 95→1 hierarchy collapsed to one shuffle).

        Engine-assigned IDs: postings-level merge (docIDs rebased by
        cumulative offsets). User-supplied ``doc_id_col``: offsets would
        corrupt the external IDs, and the same logical doc re-ingested in a
        later segment must REPLACE the earlier one (I9 upsert) — so compact
        re-builds from the unioned doc stores with last-segment-wins
        ``upsert_by_id`` instead (re-analyzes, like the reference's remote
        reindex merge, merge.py:255-281). Caveat: segment doc stores hold
        P4-truncated text, so content_sha256 of a >truncate_chars doc is
        recomputed over the truncated form here."""
        segs = self.segment_dirs()
        if not segs:
            raise RuntimeError("no segments to compact")
        if len(segs) == 1:
            return IndexPaths(segs[0])
        if self.doc_id_col:
            from functools import reduce
            from pyspark.sql import functions as F
            from elasticsearch_alps_spark.indexing.builder import upsert_by_id
            union = reduce(
                DataFrame.unionByName,
                [self.spark.read.parquet(IndexPaths(s).docs)
                     .withColumn("_seg", F.lit(i))
                 for i, s in enumerate(segs)])
            docs = (upsert_by_id(union, ["doc_id"], order_col="_seg")
                    .drop("_seg", "content_sha256"))
            out = build_index(self.spark, docs, self.compacted_dir, self.cfg,
                              text_col=self.text_col,
                              id_cols=self.id_cols,
                              doc_id_col=self.doc_id_col, shards=self.shards)
        else:
            out = merge_indexes(self.spark, segs, self.compacted_dir,
                                self.cfg, shards=self.shards)
        fsio.write_json(os.path.join(self.root, "_compaction.json"),
                        {"segments": segs}, spark=self.spark, indent=2)
        return out
