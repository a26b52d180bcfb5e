"""Lucene ``SmallFloat`` 1-byte length-norm quantization.

Lucene 8.x stores each document's per-field token count as a single byte using
``SmallFloat.intToByte4`` (values < 24 exact, larger values rounded down to a
4-bit-mantissa float). BM25 then scores with the *decoded* quantized length.
The reference enables this via ``"norms": true``
(``/root/reference/index_config/index_config_1.json:60``). For score-identical
BM25 we must apply the same lossy round-trip. Semantics re-derived from the
public Lucene ``SmallFloat`` API (``intToByte4`` / ``byte4ToInt``).
"""


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only supports positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = i >> shift
    encoded &= 0x07  # clear the implicit leading bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4  # = 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte (0..255), rounding down."""
    if i < 0:
        raise ValueError("only supports positive values")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) back to the quantized int."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


def quantize_length(doc_len: int) -> int:
    """The doc length BM25 actually sees: encode→decode round trip."""
    return byte4_to_int(int_to_byte4(doc_len))
