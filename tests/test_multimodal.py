"""Multimodal column plumbing: schemas, batch shapes, explode semantics,
determinism, and the errors-are-data discipline. The codec is the
deterministic fake (FIMG/FAUD/FVID); real decoders are explicitly
NotImplemented in this container (see functions/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.multimodal import (
    audio_features, decode_fake_pixels, decode_media, encode_fake_image,
    gen_media_rows, image_features, media_df, resize_images, sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = media_df(spark, n=120, seed=42).cache()
    df.count()
    return df


def test_corpus_deterministic():
    assert gen_media_rows(10, 42) == gen_media_rows(10, 42)
    assert gen_media_rows(10, 42) != gen_media_rows(10, 43)


def test_decode_media_metadata(media):
    meta = decode_media(media)
    rows = {r.media_id: r for r in meta.collect()}
    assert len(rows) == 120
    assert all(r.status == "success" for r in rows.values())
    # kind-specific metadata present / absent
    img = rows[0]
    assert img.kind == "image" and img.width and img.height \
        and img.channels == 3 and img.sample_rate is None
    aud = rows[2]
    assert aud.kind == "audio" and aud.sample_rate == 16000 \
        and aud.n_samples and aud.width is None
    vid = rows[3]
    assert vid.kind == "video" and vid.n_frames and vid.fps == 24


def test_decode_errors_are_data(spark):
    from ocr_engine_spark.functions.multimodal import MEDIA_SCHEMA
    bad = spark.createDataFrame(
        [(1, "u1", "image", b"JPEG not really"), (2, "u2", "image", None)],
        MEDIA_SCHEMA)
    rows = {r.media_id: r for r in decode_media(bad).collect()}
    assert rows[1].status == "error"
    assert ("container" in rows[1].error
            or "payload" in rows[1].error)
    assert rows[2].status == "error"


def test_image_features_deterministic(media):
    f1 = {r.media_id: r for r in image_features(media).collect()}
    f2 = {r.media_id: r for r in image_features(media).collect()}
    assert f1.keys() == f2.keys() and len(f1) == 60  # half the corpus
    r = f1[0]
    assert r.status == "success"
    assert 0 < r.mean_intensity < 255 and r.std_intensity > 0
    assert len(r.histogram8) == 8
    # histogram mass == pixel count
    px = decode_fake_pixels(gen_media_rows(1, 42)[0][3])
    assert sum(r.histogram8) == px.size
    assert f1[0].histogram8 == f2[0].histogram8


def test_audio_features(media):
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert len(rows) == 30
    r = rows[2]
    assert r.status == "success" and r.rms > 0 and r.duration_ms > 0


def test_resize_roundtrip(media):
    out = resize_images(media, 16, 12)
    metas = decode_media(out)
    rows = metas.collect()
    assert len(rows) == 60
    assert all(r.width == 16 and r.height == 12 and r.status == "success"
               for r in rows)


def test_frame_sampling_counts(media):
    vids = {r.media_id: r for r in decode_media(media).collect()
            if r.kind == "video"}
    frames = sample_frames(media, every_k=2).collect()
    by_id: dict[int, list] = {}
    for fr in frames:
        by_id.setdefault(fr.media_id, []).append(fr)
    assert set(by_id) == set(vids)
    for mid, frs in by_id.items():
        expect = (vids[mid].n_frames + 1) // 2
        assert len(frs) == expect
        assert sorted(f.frame_no for f in frs) == list(
            range(0, vids[mid].n_frames, 2))
    # frames decode to distinct deterministic pixels
    f0, f2 = sorted(by_id[3], key=lambda f: f.frame_no)[:2]
    p0 = decode_fake_pixels(bytes(f0.frame_payload))
    p2 = decode_fake_pixels(bytes(f2.frame_payload))
    assert p0.shape == p2.shape and not np.array_equal(p0, p2)


def test_no_python_row_udfs_in_plan(media):
    """The multimodal plan uses Arrow-batched MapInPandas, never
    row-at-a-time BatchEvalPython."""
    plan = image_features(media)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# perceptual hash + clip overlap
# ---------------------------------------------------------------------------

def test_ahash64_properties():
    from ocr_engine_spark.functions.multimodal import ahash64
    # flat image: no block strictly exceeds the mean -> hash 0
    flat = np.full((16, 16, 3), 100, dtype=np.uint8)
    assert ahash64(flat) == 0
    # top half bright, bottom dark: exactly the top 4 block rows set
    half = np.zeros((16, 16, 1), dtype=np.uint8)
    half[:8] = 200
    got = ahash64(half)
    want = 0
    for i in range(32):  # cells 0..31 = top 4 rows of the 8x8 grid
        want |= 1 << i
    assert got == want
    # deterministic + content-sensitive
    px = np.arange(12 * 12 * 3, dtype=np.uint8).reshape(12, 12, 3) % 251
    assert ahash64(px) == ahash64(px.copy())
    px2 = px.copy()
    px2[0, 0, 0] = 250
    # a single-pixel tweak may or may not flip a bit, but the function
    # must not crash on it and stays in int64 range
    assert -(1 << 63) <= ahash64(px2) < (1 << 63)


def test_identical_content_same_phash(spark):
    from ocr_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA, image_phash,
    )
    pay = encode_fake_image(32, 24, 3, 777)
    df = spark.createDataFrame(
        [(1, "u1", "image", pay), (2, "u2", "image", pay),
         (3, "u3", "image", encode_fake_image(32, 24, 3, 778))],
        MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in image_phash(df).collect()}
    assert all(r["status"] == "ok" for r in rows.values())
    assert rows[1]["phash"] == rows[2]["phash"]
    assert rows[1]["phash"] != rows[3]["phash"]


def test_video_overlap_pairs(spark, media):
    from ocr_engine_spark.functions.multimodal import (
        frame_phash, video_overlap,
    )
    fh = frame_phash(sample_frames(media, every_k=2))
    assert fh.filter(F.col("status") != "ok").count() == 0
    pairs = {(r["media_a"], r["media_b"]): r["n_shared"]
             for r in video_overlap(fh, min_shared=2).collect()}
    # adjacent videos (ids 4 apart) share frames by seed construction:
    # video 3 (seed s, frames 0..) and video 7 (seed s+4) both sample
    # even frame_nos, so overlap count = frames at distance 4
    assert pairs, "fixture videos must overlap"
    assert (3, 7) in pairs and pairs[(3, 7)] >= 2
    # every reported pair is video x video with ordered ids
    assert all(a < b for a, b in pairs)


def test_phash_error_rows_are_data(spark):
    from ocr_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA, image_phash,
    )
    df = spark.createDataFrame(
        [(1, "u", "image", b"GARBAGE"), (2, "u2", "image", None)],
        MEDIA_SCHEMA)
    rows = image_phash(df).collect()
    assert len(rows) == 2
    assert all(r["status"].startswith("error") for r in rows)
    assert all(r["phash"] is None for r in rows)


# ---------------------------------------------------------------------------
# real-container seam (magic-byte dispatch)
# ---------------------------------------------------------------------------

def _make_wav(n: int = 800, rate: int = 8000, channels: int = 1) -> bytes:
    import io
    import math
    import wave as _wave
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = b"".join(
            int(10000 * math.sin(2 * math.pi * 440 * i / rate))
            .to_bytes(2, "little", signed=True) * channels
            for i in range(n))
        w.writeframes(samples)
    return buf.getvalue()


def _make_png_header(w: int, h: int, color_type: int = 6) -> bytes:
    import struct as _s
    import zlib
    ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\x0a" + _s.pack(">I", len(ihdr)) + chunk
            + _s.pack(">I", zlib.crc32(chunk)))


def test_wav_real_decode_in_audio_features(spark):
    """RIFF/WAVE is a REAL decode path with no external dependency:
    the stdlib wave module parses PCM16 inside the same Arrow kernel
    that handles FAUD fakes."""
    from ocr_engine_spark.functions.multimodal import audio_features
    wav = _make_wav(n=800, rate=8000)
    stereo = _make_wav(n=400, rate=4000, channels=2)
    df = spark.createDataFrame(
        [(0, "u0", "audio", bytearray(wav)),
         (1, "u1", "audio", bytearray(stereo))],
        "media_id long, url string, kind string, payload binary")
    got = {r.media_id: r for r in audio_features(df).collect()}
    assert got[0].status == "success"
    # 440 Hz sine at 8 kHz over 800 samples: ~44 periods, 2 zero
    # crossings each; rms of a 10000-amplitude sine ~ 7071
    assert 6500 < got[0].rms < 7500
    assert 80 <= got[0].zero_crossings <= 96
    assert got[0].duration_ms == 100.0
    # stereo dedups to channel 0: 400 frames at 4 kHz -> 100 ms
    assert got[1].status == "success"
    assert got[1].duration_ms == 100.0


def test_png_metadata_without_pil(spark):
    """PNG width/height/channels come from the IHDR header — pure
    struct parse, real metadata with no decoder library at all."""
    from ocr_engine_spark.functions.multimodal import decode_media
    png = _make_png_header(640, 480, color_type=6)  # RGBA
    wav = _make_wav(n=320, rate=16000)
    df = spark.createDataFrame(
        [(0, "u0", "image", bytearray(png)),
         (1, "u1", "audio", bytearray(wav))],
        "media_id long, url string, kind string, payload binary")
    got = {r.media_id: r for r in decode_media(df).collect()}
    assert got[0].status == "success"
    assert (got[0].width, got[0].height, got[0].channels) == (640, 480, 4)
    assert got[1].status == "success"
    assert (got[1].sample_rate, got[1].n_samples) == (16000, 320)


def test_unknown_container_is_error_data_naming_the_dep(spark):
    """An mp4/unknown payload must yield status='error' whose message
    names the missing dependency — never a task failure."""
    from ocr_engine_spark.functions.multimodal import decode_media
    mp4ish = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32
    df = spark.createDataFrame(
        [(0, "u0", "video", bytearray(mp4ish))],
        "media_id long, url string, kind string, payload binary")
    r = decode_media(df).collect()[0]
    assert r.status == "error"
    assert "ffmpeg" in r.error


def test_pil_image_decode_end_to_end(spark):
    """Lights up the moment the container gains PIL; skips cleanly
    today. A real PNG must flow through the SAME feature/phash
    kernels as the FIMG fakes."""
    PIL = __import__("pytest").importorskip("PIL.Image")
    import io
    import numpy as np
    from ocr_engine_spark.functions.multimodal import (
        decode_image_pixels, image_features,
    )
    im = PIL.new("RGB", (16, 8), color=(10, 200, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    px = decode_image_pixels(png)
    assert px.shape == (8, 16, 3)
    assert (px[0, 0] == np.array([10, 200, 30])).all()
    df = spark.createDataFrame(
        [(0, "u0", "image", bytearray(png))],
        "media_id long, url string, kind string, payload binary")
    r = image_features(df).collect()[0]
    assert r.status == "success"
    assert abs(r.mean_intensity - (10 + 200 + 30) / 3.0) < 1e-9


def test_real_image_without_pil_is_error_data(spark):
    """Without PIL, a JPEG payload is carried as an error row whose
    message names PIL (the explicit seam), not a crash."""
    try:
        import PIL  # noqa: F401
        __import__("pytest").skip("PIL present; seam is live")
    except ImportError:
        pass
    from ocr_engine_spark.functions.multimodal import image_features
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    df = spark.createDataFrame(
        [(0, "u0", "image", bytearray(jpeg))],
        "media_id long, url string, kind string, payload binary")
    r = image_features(df).collect()[0]
    assert r.status == "error"
