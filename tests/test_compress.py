"""Compression-ratio quality signal (functions/compress.py)."""

from __future__ import annotations

import zlib

from ocr_engine_spark.functions.compress import compression_signal


def test_zlib_sizes_match_python_exactly(spark):
    texts = ["hello world", "a" * 500, "", None,
             "naturally varied prose with several distinct words",
             "é unicode ✓ text"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string")
    rows = {r.id: r for r in
            compression_signal(df, text_col="t").collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert rows[i].zlib_bytes is None
            assert rows[i].compress_flag is None
        else:
            enc = t.encode("utf-8")
            assert rows[i].zlib_bytes == len(zlib.compress(enc, 6))
            assert rows[i].n_octets == len(enc)


def test_flags_cover_both_tails(spark):
    import random
    rnd = random.Random(7)
    noise = "".join(chr(rnd.randint(33, 126)) for _ in range(400))
    df = spark.createDataFrame([
        (0, "spam " * 2000),      # repetition -> too_compressible
        (1, noise),               # high-entropy -> incompressible
        (2, ""),                  # empty
    ], "id long, t string")
    got = {r.id: r.compress_flag
           for r in compression_signal(df, text_col="t").collect()}
    assert got == {0: "too_compressible", 1: "incompressible",
                   2: "empty"}


def test_ratio_is_integer_ppm_over_octets(spark):
    t = "é" * 100  # 2 octets per char: denominator must be 200
    df = spark.createDataFrame([(0, t)], "id long, t string")
    r = compression_signal(df, text_col="t").collect()[0]
    assert r.n_octets == 200
    assert r.ratio_ppm == r.zlib_bytes * 1_000_000 // 200
