"""Streaming operators beyond segment ingestion (build-brief §streaming).

The reference is batch-only (SURVEY.md §2.9); `incremental.py` already covers
micro-batch → immutable segments. This module adds the two structured-
streaming shapes the brief names explicitly, as engine operators a training-
data pipeline runs alongside indexing:

- watermarked windowed aggregation (late data handled by the watermark, the
  G6 ingest-rate monitor as a stream);
- a custom stateful operator via ``applyInPandasWithState``: first-seen
  dedup keyed on a content hash — the streaming analog of
  ``extras.dedup.exact_duplicates`` (only the first occurrence of each key
  ever crosses the operator; duplicates in later micro-batches are dropped
  by per-key state, which a 1000-executor cluster shards by the groupBy key).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_doc_counts(stream_df: DataFrame, ts_col: str = "ts",
                        window: str = "1 minute",
                        watermark: str = "2 minutes",
                        by: List[str] = ()) -> DataFrame:
    """Docs-per-window (optionally per ``by`` columns) with a watermark:
    events later than ``watermark`` behind the max seen event time are
    dropped; in append mode a window only emits once the watermark passes
    its end (exactly-once downstream writes)."""
    g = [F.window(F.col(ts_col), window)] + [F.col(c) for c in by]
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(*g)
            .agg(F.count("*").alias("n_docs"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *[F.col(c) for c in by], "n_docs"))


def streaming_first_seen(stream_df: DataFrame, key_col: str = "content_sha256",
                         payload_cols: Iterable[str] = ("doc_id",),
                         state_ttl_ms: Optional[int] = None) -> DataFrame:
    """Stateful streaming exact-dedup: emit each key's FIRST row (ever),
    drop every later occurrence — ``applyInPandasWithState`` keyed by
    ``key_col`` with a boolean seen-flag per key.

    State is O(1) per distinct key and partitioned by the group key, so it
    scales horizontally. ``state_ttl_ms`` bounds state for unbounded key
    spaces (r3, VERDICT r2 wrong #5): each key's seen-flag expires
    ``state_ttl_ms`` of processing time after its last occurrence, after
    which a recurrence is treated as first-seen again — the standard
    memory/recall trade of TTL'd streaming dedup. ``None`` keeps state
    forever (exact, unbounded).

    Output/payload column types are derived from ``stream_df.schema`` (r3,
    ADVICE r2: the previous hardcoded ``long`` corrupted non-long payloads).

    TTL firing caveat (Spark semantics, r4 doc): ``hasTimedOut`` is only
    delivered for a group when a micro-batch runs WITHOUT data for that
    group — a key that appears in every batch never expires (its TTL resets
    each sighting, which is what a dedup wants), and a key whose TTL has
    lapsed only gets evicted once some OTHER data triggers a batch. E.g.
    with ``state_ttl_ms=1``::

        batch 1: {k1}            # k1 state created
        ...> state_ttl_ms elapses
        batch 2: {k2}            # k1 absent → its timeout fires → evicted
        batch 3: {k1}            # k1 is first-seen again (emitted)

    Without the intervening batch 2, batch 3 would arrive while k1's
    timeout is pending-but-undelivered and k1 would still count as seen
    (tested: test_first_seen_state_ttl_expires).
    """
    payload_cols = list(payload_cols)
    ddl = {f.name: f.dataType.simpleString() for f in stream_df.schema.fields}
    out_schema = ", ".join(f"{c} {ddl[c]}" for c in [key_col, *payload_cols])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()  # TTL expired with no new occurrence → forget key
            return
        seen = state.exists
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.head(1)
        state.update((True,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)  # reset TTL on every sight
        if not seen and first is not None:
            yield first[[key_col, *payload_cols]]

    return (stream_df
            .select(key_col, *payload_cols)
            .groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, "seen boolean",
                                    "append", timeout))
