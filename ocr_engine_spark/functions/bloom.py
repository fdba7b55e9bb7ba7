r"""Bloom-filter decontamination prefilter — the scale path of
``functions/decontam.py`` for when the benchmark gram set no longer
fits a broadcast as an exact 8-byte-per-gram hash set.

At GPT-3-style scale the decontamination build side can itself be
large (every n-gram of every benchmark + all their paraphrase sets —
10^9+ grams ⇒ 8+ GB exact). The classic fix (Brown et al. 2020 App. C
explicitly used Bloom filters, via the `dedupe` lib) is to prefilter
with a Bloom filter at ~10 bits/gram and confirm the rare survivors
exactly:

  * BUILD: each benchmark gram hash sets ``k`` bits of an ``m``-bit
    filter, double-hashed Kirsch–Mitzenmacher style
    (``pos_i = (h1 + i * h2) mod m``) from the one portable 60-bit
    hash. The filter is materialized as a (word, bits) DataFrame of at
    most ``m / 64`` rows via ``bit_or`` aggregation — never a
    driver-side bitmap, so ``m`` can be billions of bits and the build
    stays a (word, partial-bits) shuffle with map-side combine;
  * PROBE: corpus grams explode into their ``k`` (word, mask) probes
    and broadcast-join the word table; a gram survives iff all ``k``
    probed bits are set. The only shuffle before the confirm carries
    (doc, gram) PROBE HITS, and the groupBy that enforces "all k"
    uses map-side combine;
  * CONFIRM: survivors (true hits + the ~(1-e^{-kn/m})^k false
    positives) join the EXACT benchmark gram set — now a shuffle
    semi-join whose left side is the tiny survivor set, not the
    corpus. No false negatives exist, so the end-to-end result is
    byte-identical to the exact ``contamination_report`` — which is
    exactly what the oracle asserts.

Everything is integer bit arithmetic on the repo-wide portable md5
hash: no UDFs, no driver round trips, deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_engine_spark.functions.decontam import (benchmark_ngram_hashes,
                                                 ngrams_col,
                                                 word_tokens_col)
from ocr_engine_spark.functions.text import md5_int60_col


def _mask_expr(pos_name: str) -> Column:
    """``1L << (pos % 64)`` — via SQL expr because the PySpark
    ``shiftleft`` wrapper only accepts a literal int shift amount."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({pos_name} % 64 AS INT))")


def _h2_col(h: Column) -> Column:
    """Second hash for double hashing: the top 30 bits of the 60-bit
    hash, forced odd so the probe stride never degenerates (m is a
    power of two)."""
    return F.shiftright(h, 30).bitwiseOR(F.lit(1))


def probe_positions_col(h: Column, m_bits: int, k: int) -> Column:
    """Array of the ``k`` probed bit positions for hash ``h``:
    ``(h + i * h2) % m``. ``h`` is 60-bit and ``i * h2`` < 2^33, so the
    sum never overflows a long."""
    h2 = _h2_col(h)
    return F.transform(F.sequence(F.lit(0), F.lit(k - 1)),
                       lambda i: (h + i * h2) % F.lit(m_bits))


def bloom_filter_words(hashes: DataFrame, *, m_bits: int, k: int,
                       hash_col: str = "gram_hash") -> DataFrame:
    """(word, bits) rows of the Bloom filter over ``hashes`` — only
    words with at least one set bit appear (absent word == all zero).
    At most ``m_bits / 64`` rows regardless of input size."""
    if m_bits % 64 != 0 or m_bits & (m_bits - 1) != 0:
        raise ValueError("m_bits must be a power of two multiple of 64")
    pos = (hashes
           .select(F.explode(probe_positions_col(F.col(hash_col),
                                                 m_bits, k))
                   .alias("pos")))
    return (pos.select(F.shiftright(F.col("pos"), 6).alias("word"),
                       _mask_expr("pos").alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def bloom_might_contain(grams: DataFrame, words: DataFrame, *,
                        m_bits: int, k: int,
                        hash_col: str = "gram_hash") -> DataFrame:
    """Rows of ``grams`` whose hash passes ALL ``k`` Bloom probes.
    ``words`` enters as a broadcast build side; the survivor groupBy
    shuffles only probe HITS."""
    probes = (grams
              .withColumn("__pos",
                          F.explode(probe_positions_col(
                              F.col(hash_col), m_bits, k)))
              .withColumn("__word", F.shiftright(F.col("__pos"), 6))
              .withColumn("__mask", _mask_expr("__pos")))
    hit = (probes.join(F.broadcast(words),
                       probes["__word"] == words["word"])
           .filter(F.col("bits").bitwiseAND(F.col("__mask"))
                   == F.col("__mask")))
    # countDistinct(__pos), not count(*): a gram REPEATED inside one
    # document contributes duplicate probe rows; its k probe POSITIONS
    # are still exactly k distinct values (h2 is odd and m a power of
    # two, so i -> i*h2 mod m is injective), so distinct-position
    # counting is immune to gram multiplicity — count(*) would read
    # k*multiplicity and silently drop true hits (false negatives)
    group_cols = [c for c in grams.columns]
    return (hit.groupBy(*group_cols)
            .agg(F.countDistinct("__pos").alias("__k"))
            .filter(F.col("__k") == k)
            .drop("__k"))


def contamination_report_bloom(docs: DataFrame, benchmark: DataFrame, *,
                               n: int = 13, m_bits: int = 1 << 16,
                               k: int = 5, id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Exact ``contamination_report`` semantics via the Bloom prefilter
    + exact confirm pipeline: (doc_id, n_hits) per contaminated
    document, byte-identical to the exact operator (Bloom filters have
    no false negatives; false positives die in the confirm join)."""
    bench = benchmark_ngram_hashes(benchmark, n, text_col)
    words = bloom_filter_words(bench, m_bits=m_bits, k=k)
    toks = docs.select(F.col(id_col),
                       word_tokens_col(F.col(text_col)).alias("t"))
    doc_grams = (toks
                 .select(id_col,
                         F.explode(ngrams_col(F.col("t"), n)).alias("g"))
                 .select(id_col,
                         md5_int60_col(F.col("g")).alias("gram_hash")))
    survivors = bloom_might_contain(doc_grams, words,
                                    m_bits=m_bits, k=k)
    # exact confirm: survivor grams (tiny) semi-join the exact set —
    # at true scale this is the only join that touches the full
    # benchmark gram set, and its LEFT side is survivors, not corpus
    return (survivors.join(bench, "gram_hash", "left_semi")
            .groupBy(id_col)
            .agg(F.countDistinct("gram_hash").alias("n_hits")))
