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
