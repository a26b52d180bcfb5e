"""Packed posting-block format: varint/delta round trips + block metadata."""

import numpy as np
from hypothesis import given, settings, strategies as st

from elasticsearch_alps_spark.indexing.postings import (
    pack_block, pack_term_bucket, unpack_block, varint_decode, varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    assert varint_decode(varint_encode(values)) == values


@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=10**9),   # doc_id
    st.integers(min_value=1, max_value=500),      # freq
    st.integers(min_value=0, max_value=10**6),    # dl
), min_size=1, max_size=300, unique_by=lambda t: t[0]))
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(entries):
    entries.sort()
    doc_ids = np.array([e[0] for e in entries], dtype=np.int64)
    freqs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    positions = [sorted({(d * 7 + i) % 1000 for i in range(f % 5 + 1)})
                 for d, f, _ in entries]
    docs_b, freqs_b, dls_b, pos_b, mtf = pack_block(
        doc_ids, freqs, dls, positions, 1.2, 0.75, 50.0)
    d2, f2, l2, p2 = unpack_block(docs_b, freqs_b, dls_b, pos_b)
    assert list(d2) == list(doc_ids)
    assert list(f2) == list(freqs)
    assert list(l2) == list(dls)
    assert p2 == positions
    # block-max really is the max score contribution in the block
    denom = freqs + 1.2 * (1 - 0.75 + 0.75 * dls / 50.0)
    assert mtf == float(np.max(freqs / denom))


def test_pack_term_bucket_blocks_and_skip_pointers():
    n = 1000
    doc_ids = np.arange(0, n * 3, 3, dtype=np.int64)
    freqs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 100, dtype=np.int64)
    positions = [[0] for _ in range(n)]
    rows = pack_term_bucket("t", 0, doc_ids, freqs, dls, positions,
                            128, 1.2, 0.75, 100.0)
    assert len(rows) == (n + 127) // 128
    # skip pointers: first/last doc per block, contiguous and sorted
    prev_last = -1
    total = 0
    for r in rows:
        _, _, _, cnt, first, last, *_ = r
        assert first > prev_last
        assert last >= first
        prev_last = last
        total += cnt
    assert total == n
