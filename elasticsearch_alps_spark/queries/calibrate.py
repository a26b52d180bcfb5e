"""Self-calibration of the WAND/exhaustive crossover (r5, VERDICT r4
next #4 / "what's wrong" #3).

The clause-df threshold at which block-max WAND starts beating the fused
exhaustive scorer is a MACHINE property, not a corpus property: WAND pays
driver/Python time per decoded bucket (numpy varint + heap walk), the
exhaustive scorer pays JVM whole-stage-codegen time per posting row. The
r3 measurement (``tools/wand_crossover.py``, BENCH/BASELINE.md) put the
crossover at df ≈ 2×10⁵ on the dev box. Rather than hardcoding that
number, we store it together with the dev box's measured *probe ratio*
(Python-decode ns/posting over JVM-scan ns/row) and scale it by the same
ratio measured wherever the engine actually runs:

    min_df = REF_CROSSOVER_DF × (probe_ratio_here / REF_PROBE_RATIO)

If the deployment's Python is relatively slower than its JVM (ratio up),
WAND needs longer posting lists to amortize and the threshold rises;
relatively faster Python lowers it. The probe runs once per process
(~0.3 s: one numpy varint decode leg + one spark.range codegen leg) and
only when ``QueryConfig.wand_auto_min_df`` is left at None; passing an
int skips calibration entirely (the documented override knob). Either
way both scorers are result-identical, so a miscalibrated threshold can
only cost speed, never correctness.

Reproducibility (ADVICE r5): a one-shot wall-clock probe on a LOADED box
can pin a skewed threshold for the process lifetime, and scorer choice
then varies machine-to-machine — fine for production auto-tuning, wrong
for benchmarks and plan assertions. Two pinning layers resolve the None
threshold BEFORE any probe runs:

1. ``ALPS_WAND_MIN_DF`` env var — the hard pin for benchmarking / CI
   (bench.py sets it for its mixed-auto section so recorded numbers are
   machine-comparable).
2. a ``calibration.json`` sidecar in the index's ``_lineage/`` dir —
   written once at BUILD time (builds run on provisioned, typically idle
   capacity), so every later serving process on any box reuses the same
   threshold instead of re-probing under unknown load.

Only when neither exists does the per-process probe run.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

# measured crossover on the dev box (r3, tools/wand_crossover.py: df 6e4
# loses 0.77-0.83x, 1e5 parity, 1e6 wins 1.23-1.48x)
REF_CROSSOVER_DF = 200_000
# probe_ratio() measured on the same dev box (local[32], r5,
# tools/calibrate_anchor.py: 4.47/4.35/4.45 across three idle-box runs) —
# the anchor that makes calibrated_min_df reproduce ~REF_CROSSOVER_DF there
REF_PROBE_RATIO = 4.43
# calibration can move the threshold, not remove the regime: clamp to one
# order of magnitude around the anchor
MIN_DF_FLOOR, MIN_DF_CEIL = 20_000, 2_000_000

_PROBE_CACHE: dict = {}


def python_decode_ns_per_posting(n: int = 500_000, trials: int = 3) -> float:
    """Time the actual WAND bucket-decode kernel (numpy varint decode +
    cumsum, indexing/postings.py) on a synthetic gap list → ns/posting."""
    from elasticsearch_alps_spark.indexing.postings import (
        varint_decode_np, varint_encode_np,
    )
    gaps = np.random.RandomState(0).randint(1, 500, n).astype(np.int64)
    buf = varint_encode_np(gaps)
    best = float("inf")
    for _ in range(trials + 1):  # first leg warms caches, then best-of
        t0 = time.perf_counter()
        np.cumsum(varint_decode_np(buf))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e9


def jvm_scan_ns_per_row(spark, n: int = 8_000_000, trials: int = 2) -> float:
    """Time a whole-stage-codegen scan+agg (spark.range → sum) → ns/row —
    the unit of work the fused exhaustive scorer pays per posting."""
    df = spark.range(n).selectExpr("sum(id % 7) AS s")
    df.collect()  # warm-up leg absorbs job-submission latency
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        df.collect()
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e9


def probe_ratio(spark) -> float:
    return python_decode_ns_per_posting() / jvm_scan_ns_per_row(spark)


def calibrated_min_df(spark, force: bool = False) -> int:
    """One-per-process calibrated ``wand_auto_min_df`` (see module doc)."""
    if "min_df" not in _PROBE_CACHE or force:
        ratio = probe_ratio(spark)
        raw = REF_CROSSOVER_DF * ratio / REF_PROBE_RATIO
        _PROBE_CACHE["ratio"] = ratio
        _PROBE_CACHE["min_df"] = int(min(MIN_DF_CEIL,
                                         max(MIN_DF_FLOOR, raw)))
    return _PROBE_CACHE["min_df"]


ENV_PIN = "ALPS_WAND_MIN_DF"
SIDECAR = "calibration.json"  # under the index's _lineage/ dir


def persist_calibration(spark, lineage_dir: str) -> int:
    """Probe NOW (at build time, on the build cluster) and write the
    threshold next to the index's lineage markers, so serving processes
    inherit a load-independent value instead of re-probing (module doc,
    layer 2). Returns the persisted threshold."""
    from elasticsearch_alps_spark import fsio
    min_df = calibrated_min_df(spark)
    fsio.write_json(os.path.join(lineage_dir, SIDECAR), {
        "wand_auto_min_df": min_df,
        "probe_ratio": round(_PROBE_CACHE["ratio"], 4),
        "ref_crossover_df": REF_CROSSOVER_DF,
        "ref_probe_ratio": REF_PROBE_RATIO,
    }, spark=spark, indent=2)
    return min_df


def resolve_min_df(spark, lineage_dir: Optional[str] = None) -> int:
    """The full None-threshold resolution order (module doc): env pin →
    index sidecar → one-per-process probe."""
    pin = os.environ.get(ENV_PIN)
    if pin:
        try:
            return int(pin)
        except ValueError:
            # ADVICE r6 #5: a malformed pin must not crash every auto-mode
            # query — fall through to the sidecar/probe like the sidecar
            # layer does on its own errors.
            import warnings
            warnings.warn(f"ignoring malformed {ENV_PIN}={pin!r}; falling "
                          "through to sidecar/probe calibration")
    if lineage_dir is not None:
        from elasticsearch_alps_spark import fsio
        p = os.path.join(lineage_dir, SIDECAR)
        try:
            if fsio.exists(p, spark=spark):
                return int(fsio.read_json(p, spark=spark)
                           ["wand_auto_min_df"])
        except Exception:
            pass  # unreadable sidecar → fall through to the probe
    return calibrated_min_df(spark)
