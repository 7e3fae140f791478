"""Multimodal binary columns: real PNG/WAV codecs + fake-stub plumbing."""

import struct
import zlib

import numpy as np
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


def test_unknown_format_raises_without_fake(media):
    """synth_media payloads are hex text — no magic bytes, no codec."""
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        mm.decode_features(media, fake=False).collect()


# -- real-codec golden files --------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(
        ">I", zlib.crc32(ctype + body))


def _encode_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Forward PNG filtering per the spec — an independent inverse of the
    decoder's unfilter (h, w, channels) uint8."""
    h, w, ch = pixels.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row = pixels[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - (a + b) // 2
            else:
                p = a + b - c
                pr = a if abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - c) \
                    else (b if abs(p - b) <= abs(p - c) else c)
                v = row[x] - pr
            raw.append(v & 0xFF)
        prev = row
    return (mm.PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_decode_inverts_all_filters():
    rng = np.random.RandomState(11)
    pixels = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    png = _encode_png(pixels, filters=[0, 1, 2, 3, 4])
    out = mm.decode_png(png)
    assert (out["width"], out["height"], out["n_frames"]) == (7, 9, 1)
    want, _ = np.histogram(pixels, bins=8, range=(0, 256))
    assert out["features"] == (want / pixels.size).tolist()
    # grayscale + RGBA shapes too
    for ch in (1, 4):
        px = rng.randint(0, 256, size=(4, 5, ch), dtype=np.uint8)
        o = mm.decode_png(_encode_png(px, filters=[4, 3, 1]))
        assert (o["width"], o["height"]) == (5, 4)


def test_wav_decode_golden():
    samples = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
    out = mm.decode_wav(_encode_wav(samples, rate=8000, channels=1))
    assert out["n_frames"] == 800 and out["width"] is None
    want, _ = np.histogram(samples.astype(np.int64), bins=8, range=(-32768, 32768))
    assert out["features"] == (want / 800).tolist()


def test_real_codecs_through_spark(spark):
    rng = np.random.RandomState(3)
    png = _encode_png(rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8), [2, 4])
    wav = _encode_wav((rng.randn(300) * 1000).astype(np.int16))
    df = spark.createDataFrame(
        [(1, "image", None, bytearray(png)), (2, "audio", None, bytearray(wav))],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.decode_features(df, fake=False).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (8, 6, 1)
    assert rows[2].n_frames == 300 and rows[2].width is None
    assert abs(sum(rows[1].features) - 1.0) < 1e-6
    # JPEG magic now dispatches to the real decoder (tests/test_jpeg.py);
    # a JPEG-magic payload with no valid segments is corrupt, not unknown
    with pytest.raises(ValueError, match="SOF|marker"):
        mm.decode_media(b"\xff\xd8\xff jpeg-ish")
    with pytest.raises(Exception, match="no codec"):
        mm.decode_media(b"GIF89a not supported")


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


def test_encode_png_round_trip_and_resize_exact():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(10, 14, 3), dtype=np.uint8)
    assert np.array_equal(mm.png_pixels(mm.encode_png(px)), px)
    # nearest-neighbor resize: exact index-gather semantics
    small = mm.resize_pixels(px, 7)
    assert small.shape == (5, 7, 3)
    ys = np.floor(np.arange(5) * 10 / 5).astype(int)
    xs = np.floor(np.arange(7) * 14 / 7).astype(int)
    assert np.array_equal(small, px[ys][:, xs])
    # within-bounds no-op
    assert mm.resize_pixels(px, 14) is px


def test_resize_media_through_spark(spark):
    rng = np.random.RandomState(9)
    big = _encode_png(rng.randint(0, 256, size=(40, 60, 3), dtype=np.uint8), [0, 2, 4])
    tiny = _encode_png(rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8), [1])
    df = spark.createDataFrame(
        [(1, "image", None, bytearray(big)), (2, "image", None, bytearray(tiny)),
         (3, "audio", None, bytearray(b"RIFFxxxx"))],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.resize_media(df, max_dim=16).collect()}
    assert set(rows) == {1, 2}  # audio filtered out
    assert (rows[1].width, rows[1].height) == (16, 10)  # 60x40 -> 16x10
    assert (rows[2].width, rows[2].height) == (4, 4)    # already small
    # output payloads are valid PNGs decodable to the reported dims
    for mid in (1, 2):
        px = mm.png_pixels(bytes(rows[mid].payload))
        assert px.shape[:2] == (rows[mid].height, rows[mid].width)
    # thumbnail pixels are the exact nearest-neighbor gather of the source
    src = mm.png_pixels(big)
    assert np.array_equal(mm.png_pixels(bytes(rows[1].payload)),
                          mm.resize_pixels(src, 16))


def test_y4m_round_trip_exact():
    """encode_y4m -> y4m_frame_pixels inverts every frame byte-for-byte,
    and the offset index never reads pixel data it doesn't slice."""
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, size=(4, 6), dtype=np.uint8) for _ in range(5)]
    payload = mm.encode_y4m(frames, fps=30)
    assert payload.startswith(b"YUV4MPEG2 W6 H4 F30:1")
    w, h, y_size, offs = mm.y4m_frame_index(payload)
    assert (w, h, y_size, len(offs)) == (6, 4, 24, 5)
    for i, f in enumerate(frames):
        assert np.array_equal(mm.y4m_frame_pixels(payload, i), f)
    d = mm.decode_y4m(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (6, 4, 5)
    allb = np.concatenate([f.ravel() for f in frames])
    want, _ = np.histogram(allb, bins=8, range=(0, 256))
    assert d["features"] == (want / allb.size).tolist()


def test_y4m_colorspace_frame_sizes_and_errors():
    """420 (the spec default, no C tag) and 422/444 stride correctly;
    truncation and bad markers raise instead of mis-slicing."""
    y = bytes(range(16))                       # 4x4 Y plane
    p420 = b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + y + bytes(8) \
         + b"FRAME\n" + y + bytes(8)
    w, h, y_size, offs = mm.y4m_frame_index(p420)
    assert (w, h, y_size, len(offs)) == (4, 4, 16, 2)
    p444 = b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + y + bytes(32)
    assert len(mm.y4m_frame_index(p444)[3]) == 1
    with pytest.raises(ValueError, match="truncated"):
        mm.y4m_frame_index(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + y[:10])
    with pytest.raises(ValueError, match="FRAME marker"):
        mm.y4m_frame_index(b"YUV4MPEG2 W4 H4 Cmono\nXRAME\n" + y)
    with pytest.raises(ValueError, match="colorspace"):
        mm.y4m_frame_index(b"YUV4MPEG2 W4 H4 C999\nFRAME\n" + y)


def test_y4m_through_spark_decode_and_frame_sample(spark):
    """decode_features(fake=False) reads REAL video dims/frame counts
    from Y4M payloads, and sample_frame_pixels returns the actual Y
    planes of every sampled frame."""
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, size=(3, 5), dtype=np.uint8) for _ in range(7)]
    y4m = mm.encode_y4m(frames)
    df = spark.createDataFrame(
        [(1, "video", None, bytearray(y4m))], schema=mm.MEDIA_SCHEMA
    )
    feat = mm.decode_features(df, fake=False).collect()[0]
    assert (feat.width, feat.height, feat.n_frames) == (5, 3, 7)
    idx = mm.frame_sample(df, every_n=3, fake=False).collect()
    assert sorted(r.frame_idx for r in idx) == [0, 3, 6]
    px = {r.frame_idx: r for r in mm.sample_frame_pixels(df, every_n=3).collect()}
    assert sorted(px) == [0, 3, 6]
    for i, r in px.items():
        assert (r.width, r.height) == (5, 3)
        assert bytes(r.y_plane) == frames[i].tobytes()


def test_sample_frame_pixels_skips_corrupt_payloads(spark):
    """One null / non-Y4M / truncated payload must not fail the stage —
    corrupt video rows are skipped and valid rows still produce frames."""
    rng = np.random.RandomState(12)
    frames = [rng.randint(0, 256, size=(2, 4), dtype=np.uint8) for _ in range(2)]
    good = mm.encode_y4m(frames)
    rows = [
        (1, "video", None, bytearray(good)),
        (2, "video", None, None),                                  # null payload
        (3, "video", None, bytearray(b"not a video at all")),      # wrong magic
        (4, "video", None, bytearray(b"YUV4MPEG2 W4 H4\nFRAME\nxy")),  # truncated
    ]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.sample_frame_pixels(df, every_n=1).collect()
    assert {r.media_id for r in out} == {1}
    assert sorted(r.frame_idx for r in out) == [0, 1]
