"""Multimodal plumbing: mapInPandas schemas, deterministic fake decode."""

from __future__ import annotations

import hashlib

import pytest

from stockpulse_batch_realtime_etl_spark.operators import multimodal


def doc(i, t):
    return (i, t, "en", "s", len(t))


@pytest.fixture(scope="module")
def media(make_docs):
    docs = make_docs(
        [doc(0, "image payload zero"), doc(1, "audio payload"), doc(2, "video payload xyz"),
         doc(3, "another image here")]
    )
    return multimodal.media_from_documents(docs)


def test_media_table_shape(media):
    rows = {r.asset_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert bytes(rows[0].content) == b"image payload zero"
    assert rows[0].meta["lang"] == "en"


def test_extract_features_md5_matches_driver(media):
    feats = {r.asset_id: r for r in multimodal.extract_features(media).collect()}
    assert feats[0].content_md5 == hashlib.md5(b"image payload zero").hexdigest()
    assert feats[0].byte_len == len(b"image payload zero")


def test_image_dims_audio_duration_split(media):
    feats = {r.asset_id: r for r in multimodal.extract_features(media).collect()}
    img, aud = feats[0], feats[1]
    assert img.width is not None and img.height is not None and img.duration_ms is None
    assert aud.width is None and aud.duration_ms is not None
    h = hashlib.md5(b"image payload zero").hexdigest()
    assert img.width == 64 + int(h[0], 16) * 16 + int(h[1], 16)


def test_resize_only_images(media):
    out = multimodal.resize_images(media, 128).collect()
    assert {r.asset_id for r in out} == {0, 3}
    assert all(r.target_px == 128 for r in out)


def test_sample_frames_explodes_videos(media):
    out = multimodal.sample_frames(media, n_frames=4).collect()
    assert {r.asset_id for r in out} == {2}
    assert sorted(r.frame_idx for r in out) == [0, 1, 2, 3]
    joined = b"".join(bytes(r.frame_bytes) for r in sorted(out, key=lambda r: r.frame_idx))
    assert b"video" in joined  # slices come from the real payload


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._try_real_decode("video", b"xxx")
