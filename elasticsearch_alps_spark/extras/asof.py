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
    → per-key sort by (ts, tag, right-row) → carry-forward window
      (`last(right_row_struct, ignorenulls=True)` over rows unbounded-preceding)
    → keep left rows

One shuffle + one sort, no row multiplication; skewed keys can pre-salt the
union on a bucketed ts range like any windowed op. Left columns travel as a
packed struct so the union schema stays 4 columns wide regardless of the
left table's width.

Row semantics (ADVICE.md r2): the right VALUE COLUMNS also travel as ONE
packed struct carried by a single `last(ignorenulls=True)` — so every output
``_asof`` column comes from the SAME latest matching right row, and a NULL
payload in that row stays NULL (carrying each column independently would
silently substitute an older non-null value, diverging from true ASOF JOIN).
Ties among equal-timestamp right rows are broken deterministically by the
packed struct's own lexicographic order (greatest wins — it sorts last under
the carry-forward window).
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
    r = right.select(
        F.col(on).alias("_k"), F.col(rts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(v) for v in value_cols]).alias("_rrow"))
    l = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r.schema["_rrow"].dataType).alias("_rrow"))

    # `_rrow` in the ordering: among equal-(ts, tag) right rows the greatest
    # packed row sorts LAST and wins the carry — a deterministic tiebreak
    # (left rows carry a null struct there, which sorts first and is inert)
    w = (Window.partitionBy("_k").orderBy("_ts", "_tag", "_rrow")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = (l.unionByName(r)
               .withColumn("_rr", F.last("_rrow", ignorenulls=True).over(w)))
    return (carried.filter(F.col("_tag") == l_tag)
            .select(*[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
                    *[F.col(f"_rr.{v}").alias(o)
                      for v, o in zip(value_cols, out_vals)]))
