"""Posting-list codec: sorted docIDs, delta-encoded, compressed in
fixed-size blocks carrying block-max tf statistics (SURVEY §4.3; the
distributed generalization of the reference's term->df TSV artifact,
pke/utils.py:126-139).

Each compressed value stream is TAGGED with a 1-byte codec id and the
encoder picks the cheaper of two codecs per stream:

- ``0x01`` LEB128 varint (byte-aligned; wins for tiny streams and
  wide-dynamic-range values), and
- ``0x02`` NewPFD-style PForDelta: all values bit-packed at a fixed
  width ``b`` chosen near the 90th-percentile bit length, with the
  few larger values patched as exceptions (position byte + varint
  high bits). Sub-byte widths are where the win is: dense-ordinal
  gaps and tfs are mostly 1-3 bits wide, which varint cannot encode
  in under 8.

All encode/decode paths are numpy-vectorized (packbits/unpackbits and
byte-plane sweeps; no per-value Python in the hot loop), suitable for
use inside Arrow-batched applyInPandas / mapInArrow.

docIDs are signed int64 (xxhash64 output); we map them order-preservingly
to uint64 via XOR(1<<63) before delta encoding so deltas are small
non-negative gaps.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_SIGN = np.uint64(1 << 63)

TAG_VARINT = 0x01
TAG_PFOR = 0x02
# PFOR constraints: positions are 1 byte (block_size <= 256 in
# practice; bigger streams fall back to varint) and the packed width
# is capped so ``value >> b`` / mask shifts never hit the uint64 edge
_PFOR_MAX_N = 255
_PFOR_MAX_B = 56


def to_u64(doc_ids: np.ndarray) -> np.ndarray:
    """Order-preserving signed int64 -> uint64."""
    return doc_ids.astype(np.int64).view(np.uint64) ^ _SIGN


def from_u64(u: np.ndarray) -> np.ndarray:
    return (u ^ _SIGN).view(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 encode a uint64 array (vectorized byte-plane sweep)."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return b""
    # bytes needed per value
    nb = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0)
        tmp >>= np.uint64(7)
    pos = np.zeros(len(v), dtype=np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    cur = v
    for i in range(int(nb.max())):
        mask = nb > i
        b = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        b[(nb[mask] - 1) > i] |= 0x80
        out[pos[mask] + i] = b
        cur = cur >> np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """LEB128 decode -> uint64 array (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    starts = np.zeros(int(is_end.sum()), dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    value_id = np.zeros(len(b), dtype=np.int64)
    value_id[starts[1:]] = 1
    np.cumsum(value_id, out=value_id)
    within = np.arange(len(b), dtype=np.int64) - starts[value_id]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * within.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def _bitlen(v: np.ndarray) -> np.ndarray:
    """Exact bit length per uint64 value (log2 + two-sided correction
    for float rounding; values at/above 2^63 clamp to 64)."""
    bl = np.zeros(len(v), dtype=np.int64)
    m = v > 0
    if m.any():
        f = np.floor(np.log2(v[m].astype(np.float64))).astype(np.int64) + 1
        sh = np.minimum(f, 63).astype(np.uint64)
        f += ((v[m] >> sh) > 0) & (f < 64)
        f -= (v[m] >> np.maximum(f - 1, 0).astype(np.uint64)) == 0
        bl[m] = f
    return bl


def _pfor_cost(n: int, b: int, bl: np.ndarray) -> int:
    exc = bl > b
    if not exc.any():
        return 4 + (n * b + 7) // 8
    return (4 + (n * b + 7) // 8 + int(exc.sum())
            + int(((bl[exc] - b + 6) // 7).sum()))


def encode_stream(values: np.ndarray) -> bytes:
    """uint64 array -> tagged bytes, whichever of varint / PForDelta is
    smaller for THIS stream. Empty input -> b'' (callers key decode on
    the count, so no tag is needed)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if n > _PFOR_MAX_N:
        return bytes([TAG_VARINT]) + varint_encode(v)
    bl = _bitlen(v)
    # costs are computed analytically so only the WINNING codec pays
    # its encode: varint is exactly max(1, ceil(bitlen/7)) bytes/value
    var_cost = 1 + int(np.maximum((bl + 6) // 7, 1).sum())
    # two candidate widths: max (no exceptions) and ~p90 (NewPFD)
    b_max = int(bl.max())
    k = (n - 1) * 9 // 10
    b_p90 = int(np.partition(bl, k)[k])
    best_b, best_cost = None, var_cost
    for b in {min(b_max, _PFOR_MAX_B), min(b_p90, _PFOR_MAX_B)}:
        c = _pfor_cost(n, b, bl)
        if c < best_cost:
            best_b, best_cost = b, c
    if best_b is None:
        return bytes([TAG_VARINT]) + varint_encode(v)
    b = best_b
    exc_idx = np.flatnonzero(bl > b)
    if b:
        mask = np.uint64((1 << b) - 1)
        low = v & mask
        bits = ((low[:, None] >> np.arange(b, dtype=np.uint64))
                & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(bits, bitorder="little").tobytes()
    else:
        packed = b""
    head = bytes([TAG_PFOR, b, len(exc_idx) & 0xFF,
                  (len(exc_idx) >> 8) & 0xFF])
    exc_pos = exc_idx.astype(np.uint8).tobytes()
    exc_high = varint_encode(v[exc_idx] >> np.uint64(b)) if len(exc_idx) \
        else b""
    return head + exc_pos + packed + exc_high


def decode_stream(buf: bytes, n: int) -> np.ndarray:
    """Tagged bytes -> uint64 array of exactly ``n`` values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    tag = buf[0]
    if tag == TAG_VARINT:
        return varint_decode(buf[1:])
    if tag != TAG_PFOR:
        raise ValueError(f"unknown stream codec tag {tag:#x}")
    b = buf[1]
    n_exc = buf[2] | (buf[3] << 8)
    pos_end = 4 + n_exc
    exc_pos = np.frombuffer(buf[4:pos_end], dtype=np.uint8)
    packed_len = (n * b + 7) // 8
    if b:
        bits = np.unpackbits(
            np.frombuffer(buf[pos_end:pos_end + packed_len], np.uint8),
            count=n * b, bitorder="little").reshape(n, b)
        v = (bits.astype(np.uint64)
             << np.arange(b, dtype=np.uint64)).sum(axis=1).astype(np.uint64)
    else:
        v = np.zeros(n, dtype=np.uint64)
    if n_exc:
        high = varint_decode(buf[pos_end + packed_len:])
        v[exc_pos] |= high << np.uint64(b)
    return v


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                  block_size: int = BLOCK_SIZE) -> list[dict]:
    """Sorted (doc_ids int64 ascending, tfs, dls) -> list of block dicts:
    {first_doc, last_doc, n, max_tf, docs (varint gaps after first),
     tfs (varint), dls (varint)}. Each block decodes independently
    (skippable). Doc lengths (BM25 norms) are embedded in the block so
    query-time scoring needs no doc-stats join."""
    assert len(doc_ids) == len(tfs) == len(dls)
    u = to_u64(np.asarray(doc_ids))
    t = np.asarray(tfs, dtype=np.uint64)
    d = np.asarray(dls, dtype=np.uint64)
    blocks = []
    for s in range(0, len(u), block_size):
        e = min(s + block_size, len(u))
        seg = u[s:e]
        gaps = np.empty(e - s - 1, dtype=np.uint64)
        np.subtract(seg[1:], seg[:-1], out=gaps)
        blocks.append({
            "first_doc": int(from_u64(seg[:1])[0]),
            "last_doc": int(from_u64(seg[-1:])[0]),
            "n": int(e - s),
            "max_tf": int(t[s:e].max()),
            "docs": encode_stream(gaps),
            "tfs": encode_stream(t[s:e]),
            "dls": encode_stream(d[s:e]),
        })
    return blocks


def _field(block, name):
    return block[name] if isinstance(block, dict) else getattr(block, name)


def decode_block(block) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """block (dict or Row) -> (doc_ids int64 asc, tfs int64, dls int64)."""
    n = int(_field(block, "n"))
    gaps = decode_stream(bytes(_field(block, "docs")), n - 1)
    u = np.empty(n, dtype=np.uint64)
    u[0] = to_u64(np.array([_field(block, "first_doc")], dtype=np.int64))[0]
    if len(gaps):
        np.cumsum(gaps, out=u[1:])
        u[1:] += u[0]
    tfs = decode_stream(bytes(_field(block, "tfs")), n).astype(np.int64)
    dls = decode_stream(bytes(_field(block, "dls")), n).astype(np.int64)
    return from_u64(u), tfs, dls


def decode_blocks(blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if blocks is None or len(blocks) == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    parts = [decode_block(b) for b in blocks]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


def merge_sorted_runs(runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]]
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """k-way merge of sorted (doc_ids, tfs, dls) runs (bounded fan-in
    step of the hierarchical salted merge). docIDs are globally unique
    per term, so concatenate + stable argsort (vectorized) is exact."""
    docs = np.concatenate([r[0] for r in runs])
    tfs = np.concatenate([r[1] for r in runs])
    dls = np.concatenate([r[2] for r in runs])
    order = np.argsort(docs, kind="mergesort")
    return docs[order], tfs[order], dls[order]
