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


_u64_vals = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=7),          # sub-byte widths
        st.integers(min_value=0, max_value=2**16 - 1),
        st.integers(min_value=0, max_value=2**64 - 1)), # full domain
    min_size=0, max_size=300)


@settings(max_examples=200, deadline=None)
@given(_u64_vals)
def test_stream_roundtrip_any_u64(vals):
    """encode_stream picks varint or PForDelta per stream; either way
    the roundtrip must be exact over the full uint64 domain, including
    adversarial mixes (tiny values + 2^63 outliers = PFOR exceptions)."""
    v = np.array(vals, dtype=np.uint64)
    buf = codec.encode_stream(v)
    out = codec.decode_stream(buf, len(v))
    assert np.array_equal(out, v)
    if len(v):
        assert buf[0] in (codec.TAG_VARINT, codec.TAG_PFOR)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=255),
       st.integers(min_value=0, max_value=6))
def test_stream_pfor_beats_varint_on_narrow_values(n, width):
    """The reason PFOR exists: n small-width values cost ~n*b bits
    packed vs >= 8n bits as varint. The cost model must actually pick
    it (and win) for uniform narrow streams of non-trivial length."""
    v = (np.arange(n, dtype=np.uint64) % (1 << width)).astype(np.uint64)
    buf = codec.encode_stream(v)
    assert np.array_equal(codec.decode_stream(buf, n), v)
    if n >= 32:
        assert buf[0] == codec.TAG_PFOR
        assert len(buf) < 1 + len(codec.varint_encode(v))
