"""Structured-Streaming incremental ingest: micro-batch → segment →
compaction, with exactly-once epoch idempotency."""

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_alps_spark.config import IndexConfig
from elasticsearch_alps_spark.fixtures import generate_documents
from elasticsearch_alps_spark.indexing.builder import build_index
from elasticsearch_alps_spark.queries.engine import SearchEngine
from elasticsearch_alps_spark.streaming.incremental import IncrementalIndexer

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    rows = sorted(generate_documents(120, seed=11), key=lambda r: (r[0], r[1], r[2]))
    src = str(base / "src")
    # two parquet files → two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(rows[:60], SCHEMA).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(rows[60:], SCHEMA).coalesce(1).write.parquet(f"{src}/f2")
    return base, rows, src


def test_stream_ingest_and_compact(spark, stream_setup):
    base, rows, src = stream_setup
    cfg = IndexConfig(build_packed=False)
    ix = IncrementalIndexer(spark, str(base / "idx"), cfg, shards=2)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(f"{src}/*"))
    q = ix.start(stream)
    q.awaitTermination(120)
    segs = ix.segment_dirs()
    assert len(segs) == 2
    compacted = ix.compact()

    # compacted streaming index answers queries identically to a batch build
    full = build_index(spark, spark.createDataFrame(rows, SCHEMA),
                       str(base / "full"), cfg, shards=2)
    es = SearchEngine(spark, compacted.root)
    eb = SearchEngine(spark, full.root)
    for query in ("def", "parse json config"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in es.match_query(query).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in eb.match_query(query).collect()]
        assert a == b, query


def test_epoch_replay_is_idempotent(spark, stream_setup):
    base, rows, _ = stream_setup
    cfg = IndexConfig(build_packed=False)
    ix = IncrementalIndexer(spark, str(base / "idx2"), cfg, shards=2)
    bdf = spark.createDataFrame(rows[:30], SCHEMA)
    ix.process_batch(bdf, 7)
    marker = os.path.join(ix._segment_dir(7), "stats.json")
    mtime = os.path.getmtime(marker)
    ix.process_batch(bdf, 7)  # replayed epoch → no-op
    assert os.path.getmtime(marker) == mtime
    assert len(ix.segment_dirs()) == 1
