"""Input adapters — the reference's two ingest pipelines as DataFrame ops.

1. FineWeb web-corpus parquet (``/root/reference/scripts/index/index.py``):
   columns (text, id, metadata-JSON) → indexed doc {text, url, document_id}
   with P1 empty filter, P2 JSON url extraction, P3 empty-url filter,
   P4 >100k truncation (applied downstream by the index builder).
2. SFT conversations Arrow/nested (``scripts/index/index_arrow.py:290-450``):
   messages: list<struct<role, content{parts[{type,text}], blocks[{text}],
   text}>> flattened to one "role: text\\n\\nrole: text" blob per
   conversation, keeping only user/assistant turns (P6).

Both are pure Catalyst (higher-order array functions / get_json_object) — no
Python in the row path.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_arrow_stream(spark: SparkSession, path: str,
                      pattern: Optional[str] = "*.arrow",
                      schema=None) -> DataFrame:
    """S3: distributed reader for a directory of Arrow IPC *stream* files —
    the reference's actual SFT input (``index_arrow.py:282-289`` opens
    ``pa.ipc.open_stream`` per shard; shards are named
    ``data-00001-of-00097.arrow`` — pass ``pattern='data-*-of-*.arrow'`` for
    the S5 shard filter).

    Plan: ``binaryFile`` scan (one whole-file row per shard, split across
    executors) → ``mapInArrow`` decodes each file's bytes with
    ``pyarrow.ipc.open_stream`` and emits its record batches — Arrow
    end-to-end, no per-row Python. IPC files are not splittable mid-stream,
    so parallelism = number of shards (the reference's corpora ship hundreds
    of shards; at 100 TB re-stage pathological single-file inputs to parquet
    first).

    ``schema``: a pyarrow.Schema; inferred from the first matching file's
    stream header when omitted (driver-side filesystem access required for
    inference — always pass it explicitly on object stores)."""
    import pyarrow as pa

    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    bin_df = reader.load(path).select("path", "content")
    if schema is None:
        first = bin_df.select("path").orderBy("path").first()
        if first is None:
            raise FileNotFoundError(f"no files match {pattern!r} under {path}")
        local = first["path"]
        local = local[7:] if local.startswith("file:///") else \
            local[5:] if local.startswith("file:") else local
        if not os.path.exists(local):
            raise ValueError(
                f"cannot infer schema from non-local path {first['path']!r} — "
                "pass schema= explicitly")
        with pa.OSFile(local, "rb") as f:
            schema = pa.ipc.open_stream(f).schema
    spark_schema = spark.createDataFrame(schema.empty_table()).schema

    def decode(batches):
        for batch in batches:
            content = batch.column(batch.schema.get_field_index("content"))
            for i in range(batch.num_rows):
                rdr = pa.ipc.open_stream(content[i].as_py())
                for out in rdr:
                    # normalize to the declared schema (field order/metadata)
                    tbl = (pa.Table.from_batches([out])
                           .select(schema.names).combine_chunks())
                    yield from tbl.to_batches()

    return bin_df.mapInArrow(decode, spark_schema)


def read_source_table(spark: SparkSession, location: str,
                      source_format: str = "parquet",
                      pattern: Optional[str] = None, **options) -> DataFrame:
    """Unified ingest entry point over the source formats SURVEY.md §1.2
    names for the reference's corpora:

    - ``parquet``: directory of parquet files (S1); ``pattern`` maps to
      ``pathGlobFilter`` (S5 shard filtering), extra ``options`` pass through
      (e.g. ``recursiveFileLookup`` for S6 folder sharding).
    - ``arrow``: directory of Arrow IPC stream shards → ``read_arrow_stream``.
    - ``iceberg``: an Iceberg table name (``catalog.db.table``) or path —
      needs the ``iceberg-spark-runtime`` JAR and a configured catalog on the
      cluster. Not installed in this sandbox, so the missing-dependency case
      raises a RuntimeError naming the JAR instead of a raw ClassNotFound
      (I7's atomic-commit/refresh analog comes from Iceberg snapshots when
      this path is active)."""
    fmt = source_format.lower()
    if fmt == "parquet":
        reader = spark.read
        if pattern:
            reader = reader.option("pathGlobFilter", pattern)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.parquet(location)
    if fmt == "arrow":
        return read_arrow_stream(spark, location, pattern or "*.arrow",
                                 options.get("schema"))
    if fmt == "iceberg":
        try:
            reader = spark.read.format("iceberg")
            for k, v in options.items():
                reader = reader.option(k, v)
            # the iceberg source accepts both table identifiers and paths
            return reader.load(location)
        except Exception as e:  # surface a setup hint, not a bare stack
            msg = str(e)
            if "DATA_SOURCE_NOT_FOUND" in msg or "iceberg" in msg.lower() \
                    or "ClassNotFound" in msg:
                raise RuntimeError(
                    "Iceberg source requires the iceberg-spark-runtime JAR "
                    "on the cluster classpath and a configured catalog "
                    "(spark.sql.catalog.<name>) — see Apache Iceberg's Spark "
                    "quickstart") from e
            raise
    raise ValueError(f"unknown source_format {source_format!r} "
                     "(expected parquet | arrow | iceberg)")


def fineweb_adapter(df: DataFrame, text_col: str = "text", id_col: str = "id",
                    metadata_col: str = "metadata") -> DataFrame:
    """FineWeb parquet → (doc_key, text, url) rows ready for build_index.

    Mirrors index.py:362-443: read (text, id, metadata); P1 drop null/blank
    text (395-396); P2 url from the metadata JSON (398-413); P3 drop docs
    without url (416-418). Truncation (P4) happens inside build_index.
    """
    t = F.col(text_col)
    url = F.get_json_object(F.col(metadata_col), "$.url")
    return (df
            .filter(t.isNotNull() & t.rlike(r"\S"))
            .withColumn("url", url)
            .filter(F.col("url").isNotNull() & (F.length("url") > 0))
            .select(F.col(id_col).alias("document_id"), t.alias("text"), "url"))


def sft_conversation_adapter(df: DataFrame,
                             id_col: str = "conversation_id",
                             messages_col: str = "messages",
                             metadata_col: str = "original_metadata") -> DataFrame:
    """SFT conversations → (conversation_id, original_metadata, text).

    Mirrors index_arrow.py:290-450: keep only role ∈ {user, assistant}
    messages; per message take content.parts[].text ++ content.blocks[].text
    ++ content.text (non-null, non-blank); format "role: text"; join messages
    with blank lines; drop conversations that flatten to nothing.
    """
    m = F.col(messages_col)
    kept = F.filter(m, lambda x: x["role"].isin("user", "assistant"))

    def msg_text(x):
        parts = F.coalesce(
            F.transform(x["content"]["parts"], lambda p: p["text"]),
            F.array().cast("array<string>"))
        blocks = F.coalesce(
            F.transform(x["content"]["blocks"], lambda b: b["text"]),
            F.array().cast("array<string>"))
        direct = F.coalesce(
            F.array(x["content"]["text"]), F.array().cast("array<string>"))
        pieces = F.filter(
            F.concat(parts, blocks, direct),
            lambda s: s.isNotNull() & s.rlike(r"\S"))
        return F.array_join(pieces, " ")

    formatted = F.transform(kept, lambda x: F.concat(
        x["role"], F.lit(": "), msg_text(x)))
    nonempty = F.filter(formatted,
                        lambda s: ~s.rlike(r"^(user|assistant): *$"))
    text = F.array_join(nonempty, "\n\n")
    return (df.select(F.col(id_col).alias("conversation_id"),
                      F.col(metadata_col).alias("original_metadata"),
                      text.alias("text"))
              .filter(F.col("text").rlike(r"\S")))
