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


@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=3),        # bucket
    st.integers(min_value=0, max_value=5),        # term index
    st.integers(min_value=0, max_value=10**6),    # doc_id
    st.integers(min_value=1, max_value=500),      # freq
    st.integers(min_value=0, max_value=10**5),    # dl
), min_size=1, max_size=400,
    unique_by=lambda t: (t[0], t[1], t[2])), st.booleans())
@settings(max_examples=100, deadline=None)
def test_pack_frame_equals_per_group_pack_term_bucket(entries, pre_encoded):
    """r8 vectorized whole-partition packer must be BYTE-identical to the
    r5 per-(bucket, term) pack_term_bucket fold it replaced — same rows,
    same order, same varint buffers, same block-max doubles — for both
    position encodings (pre-encoded varint bytes from the analyzer UDF, and
    raw int arrays from the SQL-expressible profile)."""
    from elasticsearch_alps_spark.indexing.postings import (
        encode_positions, pack_frame,
    )
    entries.sort()
    terms = np.array([f"term_{t}" for _, t, *_ in entries], dtype=object)
    bucket = np.array([e[0] for e in entries], dtype=np.int64)
    doc_ids = np.array([e[2] for e in entries], dtype=np.int64)
    freqs = np.array([e[3] for e in entries], dtype=np.int64)
    dls = np.array([e[4] for e in entries], dtype=np.int64)
    raw_pos = [sorted({(d * 7 + i) % 1000 for i in range(f % 4)})
               for _, _, d, f, _ in entries]
    if pre_encoded:
        pos = np.array([encode_positions(p) for p in raw_pos], dtype=object)
    else:
        pos = np.array(raw_pos + [None], dtype=object)[:-1]  # force object
    block_size = 16
    out = pack_frame(bucket, terms, doc_ids, freqs, dls, pos,
                     block_size, 1.2, 0.75, 50.0)
    got = list(zip(out["bucket"], out["term"], out["block_id"], out["n"],
                   out["first_doc"], out["last_doc"], out["docs"],
                   out["freqs"], out["dls"], out["pos"], out["max_tf_norm"]))
    expected = []
    i = 0
    n = len(entries)
    while i < n:
        j = i
        while j < n and bucket[j] == bucket[i] and terms[j] == terms[i]:
            j += 1
        plists = ([encode_positions(p) for p in raw_pos[i:j]] if pre_encoded
                  else raw_pos[i:j])
        expected.extend(pack_term_bucket(
            terms[i], int(bucket[i]), doc_ids[i:j], freqs[i:j], dls[i:j],
            plists, block_size, 1.2, 0.75, 50.0))
        i = j
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert (int(g[0]), g[1], int(g[2]), int(g[3]), int(g[4]),
                int(g[5])) == e[:6]
        assert bytes(g[6]) == e[6] and bytes(g[7]) == e[7]
        assert bytes(g[8]) == e[8] and bytes(g[9]) == e[9]
        assert float(g[10]) == e[10]
