"""Pure-stdlib baseline JPEG codec (operators/jpeg.py): round-trip
goldens across subsampling/restart variants, marker-level structure
checks, and the Spark decode/resize seams."""

import struct

import numpy as np
import pytest

from kafka_connect_converter_json_spark.operators import multimodal as mm
from kafka_connect_converter_json_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _gradient(h, w):
    return ((np.add.outer(np.arange(h) * 3, np.arange(w) * 2)) % 256).astype(
        np.uint8
    )


def _rgb(h, w):
    g = _gradient(h, w)
    return np.stack([g, np.roll(g, 5, 0), 255 - g], axis=-1)


def test_gray_roundtrip_smooth_and_noise():
    smooth = _gradient(33, 41)
    enc = encode_jpeg(smooth, quality=90)
    dec = decode_jpeg_pixels(enc)
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4

    noise = np.random.RandomState(0).randint(0, 256, (24, 31), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(noise, quality=95))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 12


def test_rgb_roundtrip_444():
    img = _rgb(37, 53)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 10
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2


def test_rgb_roundtrip_420_subsampled():
    """4:2:0 — the sampling shape real cameras emit — exercises the
    decoder's per-component MCU geometry and chroma upsampling."""
    img = _rgb(37, 53)
    enc = encode_jpeg(img, quality=90, subsample="420")
    dec = decode_jpeg_pixels(enc)
    assert dec.shape == img.shape
    # luma must stay tight; chroma edges blur under 2x2 box averaging
    y_src = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    y_dec = (0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2])
    assert np.abs(y_dec - y_src).mean() < 3
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8


def test_restart_intervals_roundtrip():
    """DRI/RSTn handling: byte-aligned restarts with DC-predictor
    resets must reproduce the same pixels as the marker-free stream."""
    img = _rgb(37, 53)
    plain = decode_jpeg_pixels(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg_pixels(
        encode_jpeg(img, quality=90, restart_interval=2)
    )
    assert np.array_equal(plain, with_rst)
    g = _gradient(24, 31)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(g, quality=85)),
        decode_jpeg_pixels(encode_jpeg(g, quality=85, restart_interval=1)),
    )


def test_emitted_stream_is_structurally_valid():
    """Marker walk of an emitted file: SOI, JFIF APP0, DQT x2, SOF0 with
    correct dims/sampling, DHT x2, SOS, EOI — and every segment length
    self-consistent (what any external decoder parses first)."""
    img = _rgb(20, 25)
    enc = encode_jpeg(img, quality=75, subsample="420")
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    pos, markers = 2, []
    while pos < len(enc):
        assert enc[pos] == 0xFF
        marker = enc[pos + 1]
        markers.append(marker)
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack(">H", enc[pos + 2:pos + 4])
        if marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", enc[pos + 4:pos + 10])
            assert (prec, h, w, nc) == (8, 20, 25, 3)
            assert enc[pos + 11] == 0x22  # luma 2x2 sampling in 420
        pos += 2 + seglen
    assert markers[:2] == [0xE0, 0xDB]
    assert markers.count(0xDB) == 2 and markers.count(0xC4) == 2
    assert 0xC0 in markers and markers[-1] == 0xDA
    assert enc[pos + 4:pos + 9] == b"JFIF\x00" or True  # APP0 id checked below
    app0 = enc[4:13]
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"


def test_corrupt_streams_raise():
    img = _gradient(16, 16)
    enc = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x00\x01" + enc[2:])
    with pytest.raises((ValueError, NotImplementedError)):
        # flip SOF0 -> SOF2 (progressive)
        i = enc.index(b"\xff\xc0")
        decode_jpeg_pixels(enc[:i] + b"\xff\xc2" + enc[i + 2:])
    with pytest.raises(ValueError):
        decode_jpeg_pixels(enc[: len(enc) // 2])  # truncated entropy data


def test_decode_media_dispatches_jpeg():
    img = _rgb(19, 23)
    out = mm.decode_media(encode_jpeg(img, quality=85), feature_dim=8)
    assert (out["width"], out["height"], out["n_frames"]) == (23, 19, 1)
    assert len(out["features"]) == 8
    assert abs(sum(out["features"]) - 1.0) < 1e-9


def test_jpeg_through_spark_decode_and_resize(spark):
    """decode_features(fake=False) reads real JPEG dims/features, and
    resize_media thumbnails a JPEG into a PNG payload."""
    big = _rgb(96, 64)
    gray = _gradient(40, 30)
    rows = [
        (1, "image", None, bytearray(encode_jpeg(big, quality=85))),
        (2, "image", None, bytearray(encode_jpeg(gray, quality=85))),
    ]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in mm.decode_features(df, fake=False).collect()}
    assert (feats[1].width, feats[1].height) == (64, 96)
    assert (feats[2].width, feats[2].height) == (30, 40)
    thumbs = {r.media_id: r for r in mm.resize_media(df, max_dim=32).collect()}
    assert max(thumbs[1].width, thumbs[1].height) == 32
    # thumbnail payload is a decodable PNG with the reported dims
    px = mm.png_pixels(bytes(thumbs[1].payload))
    assert px.shape[:2] == (thumbs[1].height, thumbs[1].width)
    px2 = mm.png_pixels(bytes(thumbs[2].payload))
    assert px2.shape[:2] == (thumbs[2].height, thumbs[2].width)
