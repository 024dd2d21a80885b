"""Posting-list codec: sorted docIDs, delta-encoded, LEB128-varint
compressed, in fixed-size blocks carrying block-max tf statistics
(SURVEY §4.3; the distributed generalization of the reference's
term->df TSV artifact, pke/utils.py:126-139).

All encode/decode paths are numpy-vectorized (no per-value Python in the
hot loop beyond a <=10-iteration byte-plane sweep), suitable for use
inside Arrow-batched applyInPandas.

docIDs are signed int64 (xxhash64 output); we map them order-preservingly
to uint64 via XOR(1<<63) before delta encoding so deltas are small
non-negative gaps.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_SIGN = np.uint64(1 << 63)


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
            "docs": varint_encode(gaps),
            "tfs": varint_encode(t[s:e]),
            "dls": varint_encode(d[s:e]),
        })
    return blocks


def _field(block, name):
    return block[name] if isinstance(block, dict) else getattr(block, name)


def decode_block(block) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """block (dict or Row) -> (doc_ids int64 asc, tfs int64, dls int64)."""
    gaps = varint_decode(bytes(_field(block, "docs")))
    u = np.empty(len(gaps) + 1, dtype=np.uint64)
    u[0] = to_u64(np.array([_field(block, "first_doc")], dtype=np.int64))[0]
    if len(gaps):
        np.cumsum(gaps, out=u[1:])
        u[1:] += u[0]
    tfs = varint_decode(bytes(_field(block, "tfs"))).astype(np.int64)
    dls = varint_decode(bytes(_field(block, "dls"))).astype(np.int64)
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
