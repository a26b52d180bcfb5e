"""Deterministic sampling for training-data pipelines (r5).

``df.sample()`` is the wrong tool for corpus curation at scale: its output
depends on partitioning and the run's RNG stream, so a re-run (or the same
job on a differently-partitioned copy of the data) keeps a different set of
rows. These operators decide per ROW from a content hash, so the sample is

- reproducible: same rows kept on every run, any partitioning, any engine
  (the hash is md5-derived, bit-identical in the DuckDB oracle);
- stable under appends: adding new rows never flips the decision for an
  existing row (the property dataset versioning needs);
- exactly expressible in SQL for the correctness gate.

Pure Catalyst (md5/conv/filter — whole-stage codegen), no shuffle: a
sample is a FILTER, and it pushes into the scan like any other filter.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1_000_000  # ppm resolution of the rate


def _hash_ppm(key_cols: Sequence[str], seed: int) -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the key columns + seed —
    DuckDB-identical (see dedup._md5_60bit for the idiom).

    NULL key columns are coalesced to a ``chr(0)`` sentinel BEFORE the
    concat: ``concat_ws`` silently drops NULL arguments, so without the
    sentinel the keys ``('a', NULL)`` and ``('a',)`` would hash (and
    sample) identically — and diverge from a SQL oracle whose ``||``
    propagates NULL. The oracle idiom per column is
    ``coalesce(col::VARCHAR, chr(0))``; non-null keys hash exactly as
    before (the sentinel only substitutes, never wraps)."""
    key = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
          for c in key_cols],
        F.lit(str(seed)))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return h % F.lit(_BUCKETS)


def sample_by_hash(df: DataFrame, rate: float, key_cols: Sequence[str],
                   seed: int = 42) -> DataFrame:
    """Keep each row iff hash(key, seed) lands under ``rate`` (ppm
    precision). Rows are kept or dropped by identity, not position."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_hash_ppm(key_cols, seed) < int(round(rate * _BUCKETS)))


def stratified_sample_by_hash(df: DataFrame, rates: Dict[str, float],
                              stratum_col: str, key_cols: Sequence[str],
                              seed: int = 42,
                              default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic rates (e.g. per language / per source):
    ``rates`` maps stratum value → keep rate; anything else gets
    ``default_rate``. The rate table is folded into a literal CASE chain —
    no join, stays a pushable filter."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0, 1], got {r}")
    thresh = F.lit(int(round(default_rate * _BUCKETS)))
    # deterministic order so plans (and tests) are stable
    for v, r in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == v,
                        F.lit(int(round(r * _BUCKETS)))).otherwise(thresh)
    return df.filter(_hash_ppm(key_cols, seed) < thresh)


def split_by_hash(df: DataFrame, weights: Sequence[float],
                  key_cols: Sequence[str], seed: int = 42) -> list:
    """Disjoint, exhaustive train/val/test-style splits: row i goes to the
    split whose cumulative-weight interval contains its hash bucket.
    Deterministic and append-stable like sample_by_hash; the same row
    can never appear in two splits."""
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash_ppm(key_cols, seed)
    out, lo = [], 0
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w / total
        hi = _BUCKETS if i == len(weights) - 1 else int(round(acc * _BUCKETS))
        out.append(df.filter((h >= F.lit(lo)) & (h < F.lit(hi))))
        lo = hi
    return out
