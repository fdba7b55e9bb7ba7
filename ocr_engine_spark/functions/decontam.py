"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard training-data hygiene step (GPT-3 appendix C / Brown et
al. 2020; Dodge et al. 2021 "Documenting C4"): a training document is
CONTAMINATED if it shares at least one (typically 13-)word-gram with
any benchmark document; contaminated documents are dropped (or at
least flagged) before training so downstream eval numbers aren't
memorization. The reference repo's analog is its golden-fixture
discipline (never train/tune on the eval corpus); here it is a
first-class corpus operator like the dedup family.

Plan shape at 100 TB:

  * the benchmark side is SMALL by nature (benchmarks are MBs) — its
    distinct gram-hash set is built once and BROADCAST, so scoring the
    corpus is a map-side hash-semi-join: no shuffle touches the corpus
    until the per-doc hit count, and that groupBy carries only the
    (doc_id, gram_hash) HITS (near-zero for a clean corpus), not the
    corpus grams;
  * grams are hashed to 60-bit ints (``md5_int60_col`` — the repo-wide
    portable hash) so the hit shuffle is 16 B/row and the broadcast is
    8 B/gram, independent of n;
  * gram construction is per-row linear work in a single projection —
    tokens are materialized into a column FIRST (HOFs never codegen;
    an inlined tokenizer subtree would re-evaluate per sequence
    element — see functions/text.quality_score_col's note).

Everything is deterministic and replays in DuckDB (same split regex,
same md5 hash), so the operator is oracle-gated end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_engine_spark.functions.text import md5_int60_col

# Java and RE2 agree on this class (no shorthand escapes — \s/\w differ
# between engines, see kernels/clean.py); DuckDB twin:
# string_split_regex(lower(text), '[^a-z0-9]+')
WORD_SPLIT_RE = "[^a-z0-9]+"


def word_tokens_col(c: Column) -> Column:
    """Lowercased alphanumeric word tokens; empty strings dropped (the
    split emits them at string edges and both engines keep them)."""
    return F.filter(F.split(F.lower(c), WORD_SPLIT_RE),
                    lambda t: t != "")


def ngrams_col(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a MATERIALIZED token array column;
    fewer than n tokens -> empty array (never null)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tokens) - n + 1),
                    lambda i: F.array_join(F.slice(tokens, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngram_hashes(benchmark: DataFrame, n: int = 13,
                           text_col: str = "text") -> DataFrame:
    """Distinct 60-bit gram hashes of the benchmark set — the (small)
    build side of the decontamination semi-join."""
    toks = benchmark.select(word_tokens_col(F.col(text_col)).alias("t"))
    return (toks.select(F.explode(ngrams_col(F.col("t"), n)).alias("g"))
            .select(md5_int60_col(F.col("g")).alias("gram_hash"))
            .distinct())


def contamination_report_from_hashes(docs: DataFrame,
                                     gram_hashes: DataFrame, *,
                                     n: int = 13,
                                     id_col: str = "doc_id",
                                     text_col: str = "text") -> DataFrame:
    """:func:`contamination_report` against a PREBUILT distinct
    gram-hash table (column ``gram_hash``) — the shape the streaming
    gate and any build-once/score-many pipeline needs: the benchmark
    hash set is materialized once (e.g. parquet) and each scoring run
    just broadcasts it."""
    bench = F.broadcast(gram_hashes.select("gram_hash").distinct())
    toks = docs.select(F.col(id_col),
                       word_tokens_col(F.col(text_col)).alias("t"))
    doc_grams = (toks
                 .select(id_col,
                         F.explode(ngrams_col(F.col("t"), n)).alias("g"))
                 .select(id_col, md5_int60_col(F.col("g")).alias("gram_hash")))
    return (doc_grams.join(bench, "gram_hash")  # broadcast hash join
            .groupBy(id_col)
            .agg(F.countDistinct("gram_hash").alias("n_hits")))


def contamination_report(docs: DataFrame, benchmark: DataFrame, *,
                         n: int = 13, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits) for every training document sharing >= 1
    word n-gram with the benchmark set; clean documents are ABSENT
    (absent == clean, the dedup-decisions convention). ``n_hits``
    counts DISTINCT overlapping grams."""
    return contamination_report_from_hashes(
        docs, benchmark_ngram_hashes(benchmark, n, text_col),
        n=n, id_col=id_col, text_col=text_col)


def decontaminate(docs: DataFrame, benchmark: DataFrame, *,
                  n: int = 13, min_hits: int = 1,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Drop every training document with >= ``min_hits`` overlapping
    benchmark n-grams. The corpus anti-joins only the (tiny) flagged-id
    set — never itself."""
    flagged = (contamination_report(docs, benchmark, n=n, id_col=id_col,
                                    text_col=text_col)
               .filter(F.col("n_hits") >= min_hits)
               .select(id_col))
    return docs.join(flagged, id_col, "left_anti")


def contamination_fraction(docs: DataFrame, benchmark: DataFrame, *,
                           n: int = 8, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """PaLM-style POSITIONAL contamination fraction (Chowdhery et al.
    2022 app. D; Llama 2, Touvron et al. 2023 §A.6): for every training
    document with >= 1 hit, the fraction of its ``len(tokens)-n+1``
    word-n-gram POSITIONS whose gram appears in the benchmark set —
    (doc_id, n_grams, n_hits, hit_frac_micro). Positions, not distinct
    grams: a doc that repeats one leaked 8-gram fifty times is 50
    positions contaminated, which is what "how much of this document is
    benchmark text" means. Clean documents are ABSENT (absent == clean).

    Plan shape at 100 TB — two passes over the corpus, ZERO
    corpus-sized shuffles:

      * pass 1 (hits): explode gram positions, broadcast-hash-semi-join
        against the benchmark gram set, then group ONLY the hit rows —
        near-zero volume for a clean corpus (the same shape as
        ``contamination_report``, minus the dedup);
      * pass 2 (sizes): ``greatest(size(tokens)-n+1, 0)`` in a
        projection — no gram materialization, no shuffle;
      * the final sizes⋈hits equi-join BROADCASTS the hit table (the
        flagged set is small by construction — benchmarks are MBs), so
        the corpus-side scan stays map-side.

    ``hit_frac_micro = n_hits * 1e6 div n_grams`` in long integer
    micro-units — exact on both engines (PaLM's threshold "70% of
    8-grams" is ``>= 700000``)."""
    bench = F.broadcast(benchmark_ngram_hashes(benchmark, n, text_col))
    toks = docs.select(F.col(id_col),
                       word_tokens_col(F.col(text_col)).alias("t"))
    pos = (toks
           .select(id_col, F.explode(ngrams_col(F.col("t"), n)).alias("g"))
           .select(id_col, md5_int60_col(F.col("g")).alias("gram_hash")))
    hits = (pos.join(bench, "gram_hash")  # broadcast hash join
            .groupBy(id_col).agg(F.count("*").alias("n_hits")))
    sizes = toks.select(
        F.col(id_col),
        F.greatest(F.size("t") - F.lit(n - 1), F.lit(0))
        .cast("long").alias("n_grams"))
    return (sizes.join(F.broadcast(hits), id_col)
            .select(id_col, "n_grams", F.col("n_hits").cast("long"),
                    F.expr("n_hits * 1000000L div n_grams")
                    .alias("hit_frac_micro")))


def contamination_spans(docs: DataFrame, benchmark: DataFrame, *,
                        n: int = 8, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Contamination FORENSICS: for every document with >= 1 benchmark
    n-gram hit, WHERE the overlap sits — (doc_id, n_hits, first_hit,
    last_hit, hit_span_tokens) with 1-based gram positions and
    ``hit_span_tokens = last_hit - first_hit + n`` (the token window
    that bounds every hit). The triage signal reviewers need before
    dropping a document: a tight span at one position is a quoted
    benchmark question (maybe fine to excise); hits spread across the
    whole document is a leaked test set (drop it). Clean documents are
    ABSENT.

    Same plan shape as :func:`contamination_report` — positions ride
    the explode for free (posexplode), the broadcast semi-join keeps
    only hit rows, and the groupBy aggregates count/min/max over hits
    only."""
    bench = F.broadcast(benchmark_ngram_hashes(benchmark, n, text_col))
    toks = docs.select(F.col(id_col),
                       word_tokens_col(F.col(text_col)).alias("t"))
    pos = (toks
           .select(id_col,
                   F.posexplode(ngrams_col(F.col("t"), n))
                   .alias("p0", "g"))
           .select(id_col, (F.col("p0") + 1).alias("pos"),
                   md5_int60_col(F.col("g")).alias("gram_hash")))
    return (pos.join(bench, "gram_hash")  # broadcast hash join
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits"),
                 F.min("pos").cast("long").alias("first_hit"),
                 F.max("pos").cast("long").alias("last_hit"))
            .select(id_col, "n_hits", "first_hit", "last_hit",
                    (F.col("last_hit") - F.col("first_hit") + n)
                    .cast("long").alias("hit_span_tokens")))


def decontaminate_fraction(docs: DataFrame, benchmark: DataFrame, *,
                           n: int = 8, max_frac_micro: int = 700_000,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Drop every training document whose positional benchmark-overlap
    fraction reaches ``max_frac_micro`` (default = PaLM's 70% of
    8-grams). Same anti-join-the-flagged-ids shape as
    ``decontaminate``."""
    flagged = (contamination_fraction(docs, benchmark, n=n, id_col=id_col,
                                      text_col=text_col)
               .filter(F.col("hit_frac_micro") >= max_frac_micro)
               .select(id_col))
    return docs.join(flagged, id_col, "left_anti")
