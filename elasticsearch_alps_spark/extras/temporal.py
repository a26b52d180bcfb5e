"""Temporal operators: sessionization and point-in-interval joins.

Training-data pipelines constantly need these shapes (attribute a log line
to a deploy window, an event to a user session, a sample to a collection
epoch). Both are expressed in the form that survives 100 TB:

- ``sessionize``: lag + running-sum windows, one shuffle keyed by the
  session key (§2.8 window shape; exact INTERVAL-comparison gap semantics —
  no second-truncation ambiguity across engines).
- ``point_in_interval_join``: NOT a range theta-join (O(|P|·|I|) per key).
  Intervals explode to the coarse time buckets they span, points map to one
  bucket, and the match is an equi-join on (key, bucket) + an exact
  BETWEEN refilter — the standard bucketed-range-join decomposition. Bucket
  granularity trades explode factor against join selectivity; intervals
  spanning b buckets emit b rows (pick granularity ≥ typical interval
  length).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, on: str = "user_id", ts_col: str = "ts",
               order_cols: Sequence[str] = (), gap_seconds: int = 1800,
               out_col: str = "session_id") -> DataFrame:
    """Add ``out_col`` = 1-based session index per ``on`` key: a new session
    starts when the gap to the previous event exceeds ``gap_seconds``
    (strictly greater; microsecond-exact via timestamp+INTERVAL compare)."""
    w = Window.partitionBy(on).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap_seconds} SECOND")),
        1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def session_intervals(df: DataFrame, on: str = "user_id", ts_col: str = "ts",
                      order_cols: Sequence[str] = (),
                      gap_seconds: int = 1800) -> DataFrame:
    """Collapse sessionized events to (key, session_id, start, end) rows."""
    s = sessionize(df, on, ts_col, order_cols, gap_seconds)
    return (s.groupBy(on, "session_id")
            .agg(F.min(ts_col).alias("start"), F.max(ts_col).alias("end")))


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           on: str, ts_col: str = "ts",
                           start_col: str = "start", end_col: str = "end",
                           granularity: str = "1 hour",
                           payload_cols: Optional[Sequence[str]] = None,
                           ) -> DataFrame:
    """Inner-join every point to every interval containing it
    (``start <= ts <= end``) on the same key — via bucket explode + equi-join
    + exact refilter, never a per-key cross join. Output = point columns +
    ``payload_cols`` from the interval side (default: everything except the
    key/bounds)."""
    unit = granularity.split()[-1].rstrip("s").upper()
    if payload_cols is None:
        payload_cols = [c for c in intervals.columns
                        if c not in (on, start_col, end_col)]
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.expr(
            f"sequence(date_trunc('{unit}', {start_col}), "
            f"date_trunc('{unit}', {end_col}), interval {granularity})")))
    pt = points.withColumn("_bucket", F.expr(f"date_trunc('{unit}', {ts_col})"))
    joined = pt.join(iv, [on, "_bucket"])
    return (joined.filter((F.col(ts_col) >= F.col(start_col))
                          & (F.col(ts_col) <= F.col(end_col)))
            .select(*[F.col(c) for c in points.columns], *payload_cols))
