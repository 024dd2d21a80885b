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


def decode_pixels(payload: bytes) -> np.ndarray | None:
    """REAL pixel decode for the dependency-free formats — pure numpy +
    stdlib struct, no media libraries:

    - BMP (``BM``, BITMAPINFOHEADER+, BI_RGB uncompressed): 8-bit
      paletted, 24-bit BGR, 32-bit BGRA; bottom-up and top-down rows;
      4-byte row stride.
    - PPM binary (``P6``): RGB, maxval <= 65535 (16-bit samples are
      big-endian per the spec, scaled to 8-bit).
    - PGM binary (``P5``): grayscale, same maxval rules.

    Returns an (H, W, C) uint8 array, or None when the payload is not
    one of these formats (compressed formats stay behind the
    NotImplementedError gate in ``real_decode``)."""
    import struct

    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = struct.unpack("<I", payload[10:14])[0]
        dib = struct.unpack("<I", payload[14:18])[0]
        if dib < 40:  # BITMAPCOREHEADER et al.: out of scope
            return None
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        compression = struct.unpack("<I", payload[30:34])[0]
        if compression != 0 or w <= 0 or h == 0 or \
                bpp not in (8, 24, 32):
            return None
        top_down = h < 0
        h = abs(h)
        stride = ((bpp * w + 31) // 32) * 4
        if data_off + stride * h > len(payload):
            return None  # truncated pixel array
        rows = np.frombuffer(
            payload, np.uint8, stride * h, data_off).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bpp == 8:
            # palette: 4-byte BGRX entries between the DIB header and
            # the pixel array
            n_colors = struct.unpack("<I", payload[46:50])[0] or 256
            pal_off = 14 + dib
            if pal_off + 4 * n_colors > len(payload):
                return None
            pal = np.frombuffer(
                payload, np.uint8, 4 * n_colors, pal_off
            ).reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX -> RGB
            idx = rows[:, :w]
            if int(idx.max(initial=0)) >= n_colors:
                return None
            return np.ascontiguousarray(pal[idx])
        c = bpp // 8
        px = rows[:, :w * c].reshape(h, w, c)
        rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
        return np.ascontiguousarray(rgb)

    if payload[:2] in (b"P5", b"P6"):
        # token scanner: whitespace-separated header fields with
        # '#'-to-EOL comments anywhere between them
        pos, fields = 2, []
        while len(fields) < 3 and pos < len(payload):
            ch = payload[pos:pos + 1]
            if ch.isspace():
                pos += 1
            elif ch == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif ch.isdigit():
                end = pos
                while end < len(payload) and payload[end:end + 1].isdigit():
                    end += 1
                fields.append(int(payload[pos:end]))
                pos = end
            else:
                return None
        if len(fields) < 3 or pos >= len(payload) or \
                not payload[pos:pos + 1].isspace():
            return None
        pos += 1  # exactly ONE whitespace byte after maxval (spec)
        w, h, maxval = fields
        if w <= 0 or h <= 0 or not 0 < maxval < 65536:
            return None
        c = 3 if payload[:2] == b"P6" else 1
        if maxval > 255:
            n = w * h * c
            if pos + 2 * n > len(payload):
                return None
            raw = np.frombuffer(payload, ">u2", n, pos).astype(np.float64)
            return np.ascontiguousarray(
                (raw * (255.0 / maxval)).round().astype(np.uint8)
                .reshape(h, w, c))
        n = w * h * c
        if pos + n > len(payload):
            return None
        px = np.frombuffer(payload, np.uint8, n, pos).reshape(h, w, c)
        if maxval != 255:
            px = (px.astype(np.float64) * (255.0 / maxval)).round() \
                .astype(np.uint8)
        return np.ascontiguousarray(px)

    return None


def pixel_features(px: np.ndarray) -> np.ndarray:
    """FEATURE_DIM deterministic pooled statistics over a decoded
    (H, W, C) uint8 image: per-channel mean/std (3 channels, grayscale
    broadcast), global min/max, and an 8-bin luminance histogram —
    the classic cheap visual fingerprint, all vectorized numpy."""
    x = px.astype(np.float64)
    if x.shape[2] == 1:
        x = np.repeat(x, 3, axis=2)
    means = x.mean(axis=(0, 1)) / 255.0
    stds = x.std(axis=(0, 1)) / 255.0
    lum = x.mean(axis=2)
    hist = np.histogram(lum, bins=8, range=(0.0, 255.0))[0]
    hist = hist / lum.size
    out = np.concatenate([means, stds,
                          [x.min() / 255.0, x.max() / 255.0], hist])
    assert out.shape == (FEATURE_DIM,)
    return out


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder: pixel path for the dependency-free image formats
    (uncompressed BMP, binary PPM/PGM — ``decode_pixels``); compressed
    image formats and audio/video stay honestly gated (PIL/librosa/av
    are not present in this environment)."""
    if kind == "image":
        px = decode_pixels(payload)
        if px is not None:
            return pixel_features(px)
        hdr = image_header(payload)
        detail = f"{hdr['format']} decode requires PIL" if hdr \
            else "unrecognized image payload"
        raise NotImplementedError(
            f"{detail}; only uncompressed BMP and binary PPM/PGM decode "
            f"without media libraries (decode_pixels)")
    raise NotImplementedError(
        f"{kind} sample decoding requires librosa/av, not present in "
        f"this environment; wire the real decoder here. Container-level "
        f"metadata (dimensions/format) IS decoded for real — see "
        f"image_header / probe_images.")


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
