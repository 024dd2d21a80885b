"""Property-based checks (hypothesis) for the posting-block codec:
delta+varint roundtrip over the FULL signed-64 doc_id domain (doc_id =
xxhash64 is signed; the 2M-doc capacity build serves negative ids),
arbitrary block sizes, and block-max metadata consistency."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pke_spark.index import codec

_doc_ids = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=1, max_size=400, unique=True)


@settings(max_examples=150, deadline=None)
@given(_doc_ids, st.integers(min_value=1, max_value=37), st.randoms())
def test_roundtrip_any_int64_docs(ids, block_size, rnd):
    docs = np.array(sorted(ids), dtype=np.int64)
    tfs = np.array([rnd.randint(1, 10**6) for _ in docs], dtype=np.int64)
    dls = np.array([rnd.randint(1, 10**9) for _ in docs], dtype=np.int64)
    blocks = codec.encode_blocks(docs, tfs, dls, block_size=block_size)
    d2, t2, l2 = codec.decode_blocks(blocks)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


@settings(max_examples=80, deadline=None)
@given(_doc_ids, st.integers(min_value=1, max_value=37))
def test_blockmax_metadata_consistent(ids, block_size):
    """Per-block first/last/n/max_tf must describe exactly the block's
    decoded contents — WAND's pruning correctness rests on this."""
    docs = np.array(sorted(ids), dtype=np.int64)
    tfs = (np.arange(len(docs)) % 7 + 1).astype(np.int64)
    dls = np.full(len(docs), 42, dtype=np.int64)
    blocks = codec.encode_blocks(docs, tfs, dls, block_size=block_size)
    off = 0
    for b in blocks:
        n = b["n"]
        span_docs = docs[off:off + n]
        span_tfs = tfs[off:off + n]
        assert b["first_doc"] == int(span_docs[0])
        assert b["last_doc"] == int(span_docs[-1])
        assert b["max_tf"] == int(span_tfs.max())
        off += n
    assert off == len(docs)
