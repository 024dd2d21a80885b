"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata. The Spark-side plumbing (schemas, partitioning, Arrow
batch shapes, UDF signatures) is real and tested; the actual media
decode is stubbed behind ``DECODERS`` (the image/audio libraries are
not available in this container) with a deterministic fake so tests
can assert the dataflow end to end.

Scale notes: media bytes stay in executor-side Arrow batches (never
collected); feature extraction is ``mapInPandas`` so one task streams
record batches; metadata-only operations (filtering by width, codec,
duration) are pure Column ops on the typed metadata struct and never
touch the blob — column pruning means a metadata query does not even
read the binary column from parquet.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "n_frames:int, codec:string>")

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a FEATURE_DIM
    float vector from the payload digest. Replace with PIL/librosa/
    ffmpeg-backed decoders where available."""
    h = hashlib.sha256(kind.encode() + payload).digest()
    arr = np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float64) / 65535.0).astype(np.float64)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "pixel/sample decoding requires PIL/librosa/av, not present in "
        "this environment; wire the real decoder here. Container-level "
        "metadata (dimensions/format) IS decoded for real — see "
        "image_header / probe_images.")


DECODERS = {"stub": _fake_decode, "real": real_decode}


# ---------------------------------------------------------------------
# REAL container-header decode (stdlib struct only — no media libs):
# PNG / JPEG / GIF / BMP dimensions + format. This replaces the header
# level of the decode stub; pixel decode stays honestly gated above.
# ---------------------------------------------------------------------

_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOF0..15 minus DHT/JPG/DAC


def image_header(payload: bytes) -> dict | None:
    """Parse an image container header -> {format, width, height,
    bit_depth, channels}; None when the payload is not a recognized
    image (callers keep it as an opaque blob)."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 26 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth = payload[24]
        color_type = payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 0)
        return {"format": "png", "width": int(w), "height": int(h),
                "bit_depth": int(bit_depth), "channels": channels}

    if payload[:2] == b"\xff\xd8":  # JPEG: scan segments for a SOF
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > n:
                return None
            seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if marker in _SOF_MARKERS:
                if i + 9 >= n:
                    return None
                precision = payload[i + 4]
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return {"format": "jpeg", "width": int(w),
                        "height": int(h), "bit_depth": int(precision),
                        "channels": int(payload[i + 9])}
            i += 2 + seglen
        return None

    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": int(w), "height": int(h),
                "bit_depth": 8, "channels": 3}

    if payload[:2] == b"BM" and len(payload) >= 30:
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        return {"format": "bmp", "width": int(w), "height": abs(int(h)),
                "bit_depth": int(bpp), "channels": max(1, bpp // 8)}

    return None


_PROBE_SCHEMA = ("media_id long, format string, width int, height int, "
                 "bit_depth int, channels int")


def probe_images(media: DataFrame) -> DataFrame:
    """(media_id, format, width, height, bit_depth, channels) decoded
    FROM THE BYTES (not trusted metadata) via Arrow-batched
    mapInPandas; unrecognized payloads yield null format/dims. At
    scale this is one streaming pass over the blobs with no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hdrs = [image_header(bytes(p)) if p is not None else None
                    for p in b["payload"]]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "format": [h["format"] if h else None for h in hdrs],
                "width": pd.array(
                    [h["width"] if h else None for h in hdrs],
                    dtype="Int32"),
                "height": pd.array(
                    [h["height"] if h else None for h in hdrs],
                    dtype="Int32"),
                "bit_depth": pd.array(
                    [h["bit_depth"] if h else None for h in hdrs],
                    dtype="Int32"),
                "channels": pd.array(
                    [h["channels"] if h else None for h in hdrs],
                    dtype="Int32"),
            })

    return media.select("media_id", "payload").mapInPandas(
        run, _PROBE_SCHEMA)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    kinds = ("image", "audio", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            idx = b["id"].to_numpy()
            yield pd.DataFrame({
                "media_id": idx,
                "kind": [kinds[i % 3] for i in idx],
                "payload": [bytes(np.frombuffer(
                    hashlib.sha256(str(i).encode()).digest(), np.uint8)
                    .repeat(4)) for i in idx],
                "meta": [{"width": int(64 + i % 512), "height": int(64 + i % 256),
                          "sample_rate": 16000 if i % 3 == 1 else 0,
                          "n_frames": int(1 + i % 30), "codec": "fake"}
                         for i in idx],
            })

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """(media_id, kind, features array<double>) via Arrow-batched
    mapInPandas — the real pipeline shape regardless of decoder."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decode(bytes(p), k).tolist()
                     for p, k in zip(b["payload"], b["kind"])]
            yield pd.DataFrame({"media_id": b["media_id"],
                                "kind": b["kind"], "features": feats})

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id long, kind string, features array<double>")


def filter_by_meta(media: DataFrame, min_width: int = 0,
                   kind: str | None = None) -> DataFrame:
    """Metadata-only predicate — never touches the payload column, so
    Parquet column pruning skips the blobs entirely."""
    out = media.select("media_id", "kind", "meta")
    if kind is not None:
        out = out.filter(F.col("kind") == kind)
    return out.filter(F.col("meta.width") >= min_width)
