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
        "media decoding requires PIL/librosa/av, not present in this "
        "environment; wire the real decoder here")


DECODERS = {"stub": _fake_decode, "real": real_decode}


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
