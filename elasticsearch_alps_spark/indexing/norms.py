"""SmallFloat length-norm quantization as a pure Catalyst expression.

Same semantics as :mod:`elasticsearch_alps_spark.analysis.smallfloat` (Lucene
``intToByte4``/``byte4ToInt`` round trip), expressed JVM-side so the hot path
never crosses into Python (property-tested against the Python implementation).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_NUM_FREE = 24  # 255 - longToInt4(Integer.MAX_VALUE)


def quantize_length_col(dl: Column) -> Column:
    """encode→decode round trip of a non-negative int token count."""
    v = (dl - F.lit(_NUM_FREE)).cast("long")
    # number of significant bits of v (v >= 1): floor(log2(v)) + 1.
    # log2 of a long is exact in double for v < 2^53, far above any doc length.
    num_bits = (F.floor(F.log2(v)) + 1).cast("int")
    shift = num_bits - F.lit(4)
    # top-4-bit mantissa, rounded down — (v >> shift) << shift, expressed as
    # floor(v / 2^shift) * 2^shift (exact in double far beyond any doc length;
    # pyspark's shiftleft/shiftright only accept literal shift amounts)
    p = F.pow(F.lit(2.0), shift.cast("double"))
    quantized = (F.floor(v.cast("double") / p) * p).cast("long")
    small = F.when(v < 8, v).otherwise(quantized)  # num_bits < 4 → exact
    return (
        F.when(dl < F.lit(_NUM_FREE), dl.cast("long"))
         .otherwise(F.lit(_NUM_FREE) + small)
    )
