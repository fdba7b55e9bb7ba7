"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched kernels.

The Spark-side plumbing — schemas, partitioning, mapInPandas signatures,
batch shapes, explode semantics — is real and tested. The codec layer
dispatches on magic bytes (``decode_image_pixels`` /
``decode_audio_samples``):

* ``FIMG``/``FAUD``/``FVID`` — the deterministic fake containers
  (arithmetic pixel/sample synthesis), always available;
* RIFF/WAVE — REAL PCM16 decode via the stdlib ``wave`` module,
  exercised in-container by tests;
* PNG — REAL header metadata (IHDR, pure struct); pixel decode via PIL
  when importable;
* JPEG/GIF — PIL when importable (reference parity:
  surya_service.py:102-104), else a clear ``NotImplementedError``
  carried as status='error' data. ``pytest.importorskip`` contract
  tests light these paths up the moment the container gains PIL;
* compressed audio / real video — would need ffmpeg; explicitly
  unsupported, same errors-are-data seam.

Nothing in the Spark plan changes across any of these — only the
in-kernel codec branch.

Design notes for 10^12-row scale:
  * payloads never leave Arrow buffers except inside the kernel batch
  * every operator is mapInPandas over whole batches (no per-row Python
    UDFs); per-worker init happens at module import (the reference's
    load-models-once analog, surya_service.py:55-75)
  * frame sampling is a one-to-many kernel (UDTF shape) — output rows
    carry (media_id, frame_no) so downstream joins stay co-partitioned
    on media_id
  * errors are data: a bad payload yields status='error', never a task
    failure (surya_service.py:150-158)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MAGIC_IMG = b"FIMG"   # FIMG | w u32 | h u32 | channels u8 | seed u64 (BE)
MAGIC_AUD = b"FAUD"   # FAUD | sample_rate u32 | n_samples u32 | seed u64
MAGIC_VID = b"FVID"   # FVID | w u32 | h u32 | n_frames u16 | fps u8 | seed u64

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),
])

META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("fps", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("status", StringType()),
    StructField("error", StringType()),
])

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mean_intensity", DoubleType()),
    StructField("std_intensity", DoubleType()),
    StructField("histogram8", ArrayType(LongType())),
    StructField("status", StringType()),
])

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossings", LongType()),
    StructField("duration_ms", DoubleType()),
    StructField("status", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame_payload", BinaryType()),
])


# ---------------------------------------------------------------------------
# fake codec (deterministic; the stub layer)
# ---------------------------------------------------------------------------

def encode_fake_image(w: int, h: int, channels: int, seed: int) -> bytes:
    return MAGIC_IMG + struct.pack(">IIBQ", w, h, channels, seed)


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    return MAGIC_AUD + struct.pack(">IIQ", sample_rate, n_samples, seed)


def encode_fake_video(w: int, h: int, n_frames: int, fps: int,
                      seed: int) -> bytes:
    return MAGIC_VID + struct.pack(">IIHBQ", w, h, n_frames, fps, seed)


def decode_fake_pixels(payload: bytes) -> np.ndarray:
    """(h, w, c) uint8 — arithmetic synthesis from the header seed.
    Deterministic across platforms (no RNG stream dependency)."""
    w, h, c, seed = struct.unpack(">IIBQ", payload[4:21])
    n = h * w * c
    idx = np.arange(n, dtype=np.uint64)
    return ((idx * np.uint64(2654435761) + np.uint64(seed)) % np.uint64(251)) \
        .astype(np.uint8).reshape(h, w, c)


def decode_fake_samples(payload: bytes) -> np.ndarray:
    """int16 waveform — deterministic triangle-ish synthesis."""
    rate, n, seed = struct.unpack(">IIQ", payload[4:20])
    idx = np.arange(n, dtype=np.int64)
    period = 64 + (seed % 128)
    tri = np.abs((idx % (2 * period)) - period) - period // 2
    return (tri * 256).astype(np.int16)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\x0a"
_JPEG_MAGIC = b"\xff\xd8\xff"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_RIFF = b"RIFF"


def _is_real_image(payload: bytes) -> bool:
    return (payload[:8] == _PNG_MAGIC or payload[:3] == _JPEG_MAGIC
            or payload[:6] in _GIF_MAGICS)


def _is_wav(payload: bytes) -> bool:
    return payload[:4] == _RIFF and payload[8:12] == b"WAVE"


def _decode_real_image(payload: bytes) -> "np.ndarray":
    """PNG/JPEG/GIF -> (h, w, 3) uint8 via PIL when the container has
    it (reference parity: surya_service.py:102-104 opens uploads with
    PIL.Image). Without PIL the payload is explicitly unsupported —
    the same kernels light up the moment the dependency appears."""
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "real image decoding requires PIL (not in this container); "
            "FIMG fake payloads and header-only metadata still work")
    import io
    im = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(im)


def decode_image_pixels(payload: bytes) -> "np.ndarray":
    """Magic-byte dispatch to (h, w, c) uint8: FIMG -> deterministic
    fake synthesis; PNG/JPEG/GIF -> PIL (import-gated). Anything else
    is a ValueError (errors-are-data upstream)."""
    if payload[:4] == MAGIC_IMG:
        return decode_fake_pixels(payload)
    if _is_real_image(payload):
        return _decode_real_image(payload)
    raise ValueError("unknown image container")


def _decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """RIFF/WAVE PCM16 -> (int16 samples of channel 0, sample_rate)
    with the stdlib ``wave`` module — a REAL decoder with no external
    dependency, exercised in-container by tests."""
    import io
    import wave as _wave
    with _wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        n = w.getnframes()
        raw = w.readframes(n)
        arr = np.frombuffer(raw, dtype="<i2")
        ch = w.getnchannels()
        if ch > 1:
            arr = arr[::ch]  # channel 0
        return arr, int(w.getframerate())


def decode_audio_samples(payload: bytes) -> tuple["np.ndarray", int]:
    """Magic-byte dispatch to (int16 samples, sample_rate): FAUD ->
    fake synthesis; RIFF/WAVE -> stdlib wave (real). Compressed
    formats (mp3/ogg/...) would need ffmpeg — explicitly unsupported
    here."""
    if payload[:4] == MAGIC_AUD:
        rate, _, _ = struct.unpack(">IIQ", payload[4:20])
        return decode_fake_samples(payload), int(rate)
    if _is_wav(payload):
        return _decode_wav(payload)
    raise ValueError("unknown audio container")


def _png_meta(payload: bytes) -> tuple[int, int, int]:
    """(w, h, channels) from the IHDR chunk — pure struct, no PIL.
    IHDR is mandatory-first: bytes 16..24 are w/h, 25 the color type."""
    w, h = struct.unpack(">II", payload[16:24])
    color_type = payload[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 0)
    if channels == 0:
        raise ValueError(f"bad PNG color type {color_type}")
    return int(w), int(h), channels


def _wav_meta(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples) via stdlib wave."""
    import io
    import wave as _wave
    with _wave.open(io.BytesIO(payload), "rb") as w:
        return int(w.getframerate()), int(w.getnframes())


# ---------------------------------------------------------------------------
# kernels (Arrow-batched; one pandas.DataFrame in -> one out)
# ---------------------------------------------------------------------------

def _meta_of(payload: bytes | None) -> dict:
    none = dict(width=None, height=None, channels=None, sample_rate=None,
                n_samples=None, n_frames=None, fps=None,
                n_bytes=len(payload) if payload is not None else 0,
                status="success", error=None)
    if payload is None or len(payload) < 4:
        return {**none, "status": "error", "error": "empty payload"}
    try:
        magic = bytes(payload[:4])
        if magic == MAGIC_IMG:
            w, h, c, _ = struct.unpack(">IIBQ", payload[4:21])
            return {**none, "width": w, "height": h, "channels": c}
        if magic == MAGIC_AUD:
            rate, n, _ = struct.unpack(">IIQ", payload[4:20])
            return {**none, "sample_rate": rate, "n_samples": n}
        if magic == MAGIC_VID:
            w, h, nf, fps, _ = struct.unpack(">IIHBQ", payload[4:23])
            return {**none, "width": w, "height": h, "n_frames": nf,
                    "fps": fps}
        raw = bytes(payload)
        if raw[:8] == _PNG_MAGIC:  # real metadata, no PIL needed
            w, h, c = _png_meta(raw)
            return {**none, "width": w, "height": h, "channels": c}
        if _is_wav(raw):  # real metadata via stdlib wave
            rate, n = _wav_meta(raw)
            return {**none, "sample_rate": rate, "n_samples": n}
        if _is_real_image(raw):  # JPEG/GIF dims need PIL
            px = _decode_real_image(raw)
            return {**none, "width": px.shape[1], "height": px.shape[0],
                    "channels": px.shape[2]}
        raise NotImplementedError(
            "unknown container; real video/compressed-audio metadata "
            "requires ffmpeg (not in this container)")
    except NotImplementedError as exc:
        return {**none, "status": "error", "error": str(exc)}
    except Exception as exc:
        return {**none, "status": "error", "error": f"bad header: {exc}"}


def _decode_meta_batches(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    for b in batches:
        metas = [_meta_of(p) for p in b["payload"]]
        out = pd.DataFrame(metas)
        for col in ("media_id", "url", "kind", "payload"):
            out[col] = b[col].reset_index(drop=True)
        yield out[[f.name for f in META_SCHEMA.fields]]


def decode_media(df: DataFrame) -> DataFrame:
    """Parse payload headers into typed metadata columns (errors are
    data). Input: MEDIA_SCHEMA; output: META_SCHEMA."""
    return df.mapInPandas(_decode_meta_batches, META_SCHEMA)


def _image_feature_batches(batches: Iterator[pd.DataFrame]
                           ) -> Iterator[pd.DataFrame]:
    for b in batches:
        ids, means, stds, hists, statuses = [], [], [], [], []
        for mid, payload in zip(b["media_id"], b["payload"]):
            ids.append(mid)
            try:
                if payload is None:
                    raise ValueError("empty payload")
                px = decode_image_pixels(bytes(payload)) \
                    .astype(np.float64)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                hist, _ = np.histogram(px, bins=8, range=(0, 256))
                hists.append([int(x) for x in hist])
                statuses.append("success")
            except Exception:
                means.append(None); stds.append(None); hists.append(None)
                statuses.append("error")
        yield pd.DataFrame({"media_id": ids, "mean_intensity": means,
                            "std_intensity": stds, "histogram8": hists,
                            "status": statuses})


def image_features(df: DataFrame) -> DataFrame:
    """Decode + featurize image payloads (mean/std/8-bin histogram)."""
    return (df.filter(F.col("kind") == "image")
            .mapInPandas(_image_feature_batches, IMAGE_FEATURE_SCHEMA))


def _audio_feature_batches(batches: Iterator[pd.DataFrame]
                           ) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = []
        for mid, payload in zip(b["media_id"], b["payload"]):
            try:
                if payload is None:
                    raise ValueError("empty payload")
                samples, rate = decode_audio_samples(bytes(payload))
                wave = samples.astype(np.float64)
                n = len(wave)
                rms = float(np.sqrt((wave ** 2).mean())) if n else 0.0
                zc = int(((wave[:-1] * wave[1:]) < 0).sum()) if n > 1 else 0
                rows.append((mid, rms, zc, n * 1000.0 / rate, "success"))
            except Exception:
                rows.append((mid, None, None, None, "error"))
        yield pd.DataFrame(rows, columns=["media_id", "rms",
                                          "zero_crossings", "duration_ms",
                                          "status"])


def audio_features(df: DataFrame) -> DataFrame:
    return (df.filter(F.col("kind") == "audio")
            .mapInPandas(_audio_feature_batches, AUDIO_FEATURE_SCHEMA))


def _resize_batches_factory(out_w: int, out_h: int):
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for payload in b["payload"]:
                try:
                    raw = bytes(payload)
                    if raw[:4] != MAGIC_IMG:
                        raise ValueError("not a FIMG payload")
                    px = decode_fake_pixels(raw)
                    h, w, _ = px.shape
                    # nearest-neighbor index maps (real resize math over
                    # the fake pixels; PIL would slot in here)
                    yi = (np.arange(out_h) * h // out_h)
                    xi = (np.arange(out_w) * w // out_w)
                    _ = px[yi][:, xi]  # resized pixels (re-encoded below)
                    _, _, c, seed = struct.unpack(">IIBQ", raw[4:21])
                    payloads.append(encode_fake_image(out_w, out_h, c, seed))
                except Exception:
                    payloads.append(None)
            out = b.copy()
            out["payload"] = payloads
            yield out
    return _resize


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode image payloads at a new size (nearest-neighbor).
    Schema-preserving: output rows keep MEDIA_SCHEMA."""
    return (df.filter(F.col("kind") == "image")
            .mapInPandas(_resize_batches_factory(width, height),
                         MEDIA_SCHEMA))


def _frame_batches_factory(every_k: int):
    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    raw = bytes(payload)
                    if raw[:4] != MAGIC_VID:
                        continue
                    w, h, nf, fps, seed = struct.unpack(">IIHBQ", raw[4:23])
                    for fno in range(0, nf, every_k):
                        ids.append(mid)
                        nos.append(fno)
                        # frame = image payload w/ per-frame seed (so each
                        # frame decodes to distinct deterministic pixels)
                        frames.append(encode_fake_image(
                            w, h, 3, (seed + fno) & 0xFFFFFFFFFFFFFFFF))
                except Exception:
                    continue
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "frame_no": pd.array(nos, dtype="int32"),
                "frame_payload": frames})
    return _frames


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """One-to-many frame sampling (UDTF shape): each video row yields
    ceil(n_frames/k) frame rows, co-partitioned with the input on
    media_id (no shuffle added by the kernel itself)."""
    return (df.filter(F.col("kind") == "video")
            .mapInPandas(_frame_batches_factory(every_k), FRAME_SCHEMA))


# ---------------------------------------------------------------------------
# deterministic media fixture corpus
# ---------------------------------------------------------------------------

def gen_media_rows(n: int, seed: int = 42) -> list[tuple]:
    """Deterministic (media_id, url, kind, payload) rows, ~1/2 image,
    1/4 audio, 1/4 video."""
    rows = []
    for i in range(n):
        s = seed * 1_000_003 + i
        r = i % 4
        if r in (0, 1):
            w, h = 32 + (i % 7) * 16, 24 + (i % 5) * 16
            payload = encode_fake_image(w, h, 3, s)
            kind = "image"
        elif r == 2:
            payload = encode_fake_audio(16000, 4000 + (i % 10) * 400, s)
            kind = "audio"
        else:
            payload = encode_fake_video(64, 48, 8 + (i % 5) * 4, 24, s)
            kind = "video"
        rows.append((i, f"https://media.example.com/{kind}/{i:06d}", kind,
                     payload))
    return rows


def media_df(spark, n: int = 200, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    p = partitions or spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(gen_media_rows(n, seed), MEDIA_SCHEMA)
    # partition by media_id hash: payload sizes vary, ids don't skew
    return df.repartition(p, F.xxhash64("media_id"))


# ---------------------------------------------------------------------------
# perceptual hashing + clip-overlap detection
# ---------------------------------------------------------------------------

PHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("phash", LongType()),
    StructField("status", StringType()),
])


def ahash64(px: "np.ndarray") -> int:
    """Integer-exact 64-bit average hash (aHash) of an (h, w, c) uint8
    pixel array: 8x8 block grid, bit i set iff the block's mean
    intensity strictly exceeds the global mean. Means are never
    materialized as floats — each bit is the integer cross product
    ``block_sum * total_count > total_sum * block_count`` — so the
    DuckDB oracle replays every bit with BIGINT arithmetic (exact up
    to ~50-megapixel frames before the cross product could overflow).
    Blocks left empty by sub-8x8 inputs score bit 0 deterministically.
    Stored as a signed int64 (bit 63 wraps negative, both engines
    alike)."""
    h, w, c = px.shape
    gray = px.astype(np.int64).sum(axis=2)  # per-pixel channel sum
    yc = (np.arange(h) * 8) // h
    xc = (np.arange(w) * 8) // w
    cell = (yc[:, None] * 8 + xc[None, :]).ravel()
    cs = np.zeros(64, dtype=np.int64)
    np.add.at(cs, cell, gray.ravel())
    cc = np.bincount(cell, minlength=64).astype(np.int64) * c
    ts, tc = int(gray.sum()), h * w * c
    v = 0
    for i in np.nonzero(cs * tc > ts * cc)[0]:
        v |= 1 << int(i)
    return v - (1 << 64) if v >= (1 << 63) else v


def _phash_batches_factory(payload_col: str):
    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, fnos, hashes, statuses = [], [], [], []
            frame_nos = (b["frame_no"] if "frame_no" in b.columns
                         else [0] * len(b))
            for mid, fno, payload in zip(b["media_id"], frame_nos,
                                         b[payload_col]):
                ids.append(mid)
                fnos.append(fno)
                try:
                    hashes.append(ahash64(
                        decode_image_pixels(bytes(payload))))
                    statuses.append("ok")
                except Exception as exc:  # errors are data
                    hashes.append(None)
                    statuses.append(f"error: {exc}")
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "frame_no": pd.array(fnos, dtype="int32"),
                "phash": pd.array(hashes, dtype="Int64"),
                "status": statuses})
    return _phash


def frame_phash(frames: DataFrame) -> DataFrame:
    """Perceptual hash per sampled video frame (input: FRAME_SCHEMA
    from ``sample_frames``). Arrow-batched kernel, co-partitioned with
    its input on media_id — no shuffle added."""
    return frames.mapInPandas(_phash_batches_factory("frame_payload"),
                              PHASH_SCHEMA)


def image_phash(media: DataFrame) -> DataFrame:
    """Perceptual hash per image payload (input: MEDIA_SCHEMA);
    frame_no is 0 for stills."""
    return (media.filter(F.col("kind") == "image")
            .mapInPandas(_phash_batches_factory("payload"), PHASH_SCHEMA))


def video_overlap(frame_hashes: DataFrame, min_shared: int = 2
                  ) -> DataFrame:
    """Clip-overlap detection (the video analog of near-dup pairs):
    unordered video pairs sharing >= ``min_shared`` DISTINCT frame
    phashes — re-posted or trimmed copies of the same footage share
    exact frame content, so their frames hash equal.

    Plan shape: ONE equi-join shuffle keyed on phash (group sizes are
    the few frames sharing identical content — never a cross join),
    then a (pair) aggregate with map-side combine. At 10^12 frames a
    degenerate constant frame (e.g. black) would skew the phash key;
    pre-filter such hashes by frequency the way scrub.line_prune drops
    boilerplate lines."""
    fh = frame_hashes.filter(F.col("status") == "ok")
    a = fh.select(F.col("media_id").alias("media_a"),
                  F.col("phash"))
    b = fh.select(F.col("media_id").alias("media_b"),
                  F.col("phash"))
    return (a.join(b, "phash")
            .filter(F.col("media_a") < F.col("media_b"))
            .groupBy("media_a", "media_b")
            .agg(F.countDistinct("phash").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
