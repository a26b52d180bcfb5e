"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The brief's canonical example of an operator to re-express Spark-first
(build-brief §custom operators): for every left row, attach the LATEST right
row whose timestamp is ≤ (or < when ``allow_exact_matches=False``) the left
timestamp, per join key. The classic uses: feature lookup at event time
(training-data pipelines must not leak the future), trade↔quote alignment.

NOT implemented as a range join (the naive ``l.ts >= r.ts`` theta-join
explodes to O(|L|·|R|) per key before aggregation). Instead the sort-merge
shape a 100 TB job wants:

    union(tagged left, tagged right) → ONE shuffle keyed by `on`
    → per-key sort by (ts, tag) → carry-forward window
      (`last(value, ignorenulls=True)` over rows unbounded-preceding)
    → keep left rows

One shuffle + one sort, no row multiplication; skewed keys can pre-salt the
union on a bucketed ts range like any windowed op. Left columns travel as a
packed struct so the union schema stays 4 columns wide regardless of the
left table's width.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              ts_col: str = "ts", right_ts_col: Optional[str] = None,
              value_cols: Optional[Sequence[str]] = None,
              suffix: str = "_asof",
              allow_exact_matches: bool = True) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right`` row
    with ``right.ts <= left.ts`` (``<`` if not allow_exact_matches), matched
    on ``on``. Right rows with no match leave the ``<value>_asof`` columns
    null. Output = left columns + ``{v}{suffix}`` per value column."""
    rts = right_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, rts)]
    out_vals = [f"{v}{suffix}" for v in value_cols]

    # tag ordering decides <= vs <: right rows sort BEFORE equal-ts left rows
    # when exact matches are allowed (so the window sees them), AFTER when not
    r_tag, l_tag = (0, 1) if allow_exact_matches else (1, 0)
    l = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(o)
          for v, o in zip(value_cols, out_vals)])
    r = right.select(
        F.col(on).alias("_k"), F.col(rts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(v).alias(o) for v, o in zip(value_cols, out_vals)])

    w = (Window.partitionBy("_k").orderBy("_ts", "_tag")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l.unionByName(r)
    for o in out_vals:
        carried = carried.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return (carried.filter(F.col("_tag") == l_tag)
            .select(*[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
                    *out_vals))
