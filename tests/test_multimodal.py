"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

import pytest

from kafka_connect_converter_json_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=48, seed=7).cache()


def test_metadata_without_decode(media):
    meta = mm.media_metadata(media).collect()
    assert len(meta) == 48
    for r in meta:
        assert r.n_bytes > 0 and len(r.sha256) == 64


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        mm.decode_features(media, fake=False).collect()


def test_fake_decode_deterministic_schema(media):
    a = mm.decode_features(media, fake=True).orderBy("media_id").collect()
    b = mm.decode_features(media, fake=True).orderBy("media_id").collect()
    assert a == b
    for r in a:
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
        if r.kind == "image":
            assert r.n_frames == 1 and r.width >= 16
    # sha parity with the no-decode metadata path
    meta = {m.media_id: m.sha256 for m in mm.media_metadata(media).collect()}
    assert all(meta[r.media_id] == r.sha256 for r in a)


def test_frame_sampling(media):
    frames = mm.frame_sample(media, every_n=30, fake=True).collect()
    assert all(r.frame_idx % 30 == 0 for r in frames)
    assert len(frames) > 0


def test_vectorized_fake_matches_scalar_reference(media):
    """The columnar fake path must agree with the documented per-row
    _fake_decode reference on every field."""
    import hashlib

    got = {r.media_id: r for r in mm.decode_features(media, fake=True).collect()}
    for src in media.collect():
        payload = bytes(src.payload or b"")
        want = mm._fake_decode(payload, src.kind)
        r = got[src.media_id]
        assert (r.width, r.height, r.n_frames) == (
            want["width"], want["height"], want["n_frames"])
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert r.n_bytes == len(payload)
