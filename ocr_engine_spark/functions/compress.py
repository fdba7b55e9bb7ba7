"""Compression-ratio quality signal (zlib, Arrow-batched).

How well a document DEFLATEs is a classic one-number quality probe
(used alongside the Gopher/C4 rules in MassiveWeb/RefinedWeb-style
curation): template floods, keyword stuffing and repeated boilerplate
compress far below natural prose, while binary junk and encoding
mojibake barely compress at all.  Both tails are filter candidates;
the ratio is also the cheapest proxy for per-byte entropy when a real
LM perplexity pass (lm.py) is too expensive for a first sweep.

This is deliberately the repo's ONE compression kernel in Python: the
JVM has no zlib expression, and a per-row Python UDF is banned — the
implementation is an Arrow-batched ``pandas_udf`` (one Python call
per ~10k-row batch, C-speed zlib inside), the same hot-path discipline
as the extraction kernels.  DEFLATE output bytes for a given (input,
level, strategy) are produced by the bundled CPython zlib and pinned
by the frozen-fixture oracle; the signal consumes only the LENGTH,
which is stable across zlib builds in practice and exactly
reproducible within this container either way.

Scale: map-only — no shuffle, no state; ratio arithmetic is integer
ppm on the JVM side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: below this ppm ratio a document is "too compressible" (repetition /
#: template flood); above the high bound it is "incompressible"
#: (random-ish bytes, mojibake, minified blobs). Tuned like the Gopher
#: shape-rule constants: fixed, documented, oracle-pinned.
LOW_PPM = 200_000
HIGH_PPM = 900_000


def zlib_bytes_col(text_col: str, *, level: int = 6):
    """Arrow-batched compressed-size column: ``len(zlib.compress(
    utf8(text), level))`` per row, NULL in -> NULL out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _zsize(s):
        import zlib

        def one(t):
            if t is None:
                return None
            return len(zlib.compress(t.encode("utf-8"), level))
        return s.map(one)

    return _zsize(F.col(text_col))


def compression_signal(df: DataFrame, *, text_col: str = "clean_text",
                       level: int = 6,
                       low_ppm: int = LOW_PPM,
                       high_ppm: int = HIGH_PPM) -> DataFrame:
    """Append (n_octets, zlib_bytes, ratio_ppm, compress_flag) where
    ``ratio_ppm = zlib_bytes * 1e6 div n_octets`` (octet length — the
    DEFLATE input is the utf-8 encoding, so the denominator must be
    bytes, not code points) and ``compress_flag`` is
    'too_compressible' / 'ok' / 'incompressible'.  Empty texts get
    ratio NULL and flag 'empty' rather than a division blow-up."""
    n_oct = F.octet_length(F.col(text_col)).cast("long")
    out = (df.withColumn("n_octets", n_oct)
           .withColumn("zlib_bytes", zlib_bytes_col(text_col,
                                                    level=level))
           .withColumn("ratio_ppm",
                       F.expr("CASE WHEN n_octets > 0 THEN "
                              "(zlib_bytes * 1000000) div n_octets "
                              "END")))
    flag = (F.when(F.col("n_octets").isNull(), F.lit(None))
            .when(F.col("n_octets") == 0, F.lit("empty"))
            .when(F.col("ratio_ppm") < low_ppm,
                  F.lit("too_compressible"))
            .when(F.col("ratio_ppm") > high_ppm,
                  F.lit("incompressible"))
            .otherwise(F.lit("ok")))
    return out.withColumn("compress_flag", flag)
