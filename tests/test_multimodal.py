"""Multimodal plumbing tests: schema, Arrow batch flow, deterministic
stub decode, metadata-only pruning (the decode itself is stubbed — see
pke_spark/multimodal.py)."""

from __future__ import annotations

import pytest

from pke_spark import multimodal


def test_feature_extraction_shape(spark):
    media = multimodal.synth_media(spark, 32)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 32
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats.features)
    # deterministic: same media_id -> same features across runs
    feats2 = multimodal.extract_features(multimodal.synth_media(spark, 32)) \
        .toPandas().set_index("media_id")
    f1 = feats.set_index("media_id")
    for mid in f1.index:
        assert list(f1.loc[mid, "features"]) == list(feats2.loc[mid, "features"])


def test_metadata_filter_prunes_payload(spark):
    media = multimodal.synth_media(spark, 32)
    out = multimodal.filter_by_meta(media, min_width=100, kind="image")
    assert "payload" not in out.columns
    pdf = out.toPandas()
    assert (pdf["kind"] == "image").all()


def test_real_decoder_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"x", "image")


# ---------------------------------------------------------------------
# REAL header decode (stdlib-only): tiny genuine byte fixtures
# ---------------------------------------------------------------------

def _png_bytes(w=2, h=3):
    """A genuinely valid minimal PNG (zlib-compressed gray pixels)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w=5, h=7):
    """Minimal JPEG header stream: SOI, APP0(JFIF), SOF0."""
    import struct
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00" * 3
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0)


def _gif_bytes(w=11, h=13):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp_bytes(w=17, h=19):
    import struct
    return (b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
            + b"\x00\x00" + struct.pack("<H", 24) + b"\x00" * 8)


def test_image_header_real_decode():
    from pke_spark.multimodal import image_header
    assert image_header(_png_bytes()) == {
        "format": "png", "width": 2, "height": 3,
        "bit_depth": 8, "channels": 1}
    assert image_header(_jpeg_bytes()) == {
        "format": "jpeg", "width": 5, "height": 7,
        "bit_depth": 8, "channels": 3}
    g = image_header(_gif_bytes())
    assert (g["format"], g["width"], g["height"]) == ("gif", 11, 13)
    b = image_header(_bmp_bytes())
    assert (b["format"], b["width"], b["height"]) == ("bmp", 17, 19)
    assert image_header(b"not an image at all") is None
    assert image_header(b"") is None
    # truncated JPEG (SOI only) must not loop or crash
    assert image_header(b"\xff\xd8\xff") is None


def test_probe_images_distributed(spark):
    from pke_spark.multimodal import probe_images
    rows = [(1, _png_bytes(640, 480)), (2, _jpeg_bytes(320, 200)),
            (3, _gif_bytes(8, 9)), (4, b"garbage"), (5, _bmp_bytes(2, 2))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: (r.format, r.width, r.height)
           for r in probe_images(media).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 320, 200)
    assert got[3] == ("gif", 8, 9)
    assert got[4] == (None, None, None)
    assert got[5] == ("bmp", 2, 2)
