r"""Rule-based sentence segmentation (protect-split-restore).

Sentence boundaries feed chunking (chunk.py), bitext alignment and
per-sentence quality filters; at web scale the segmentation must be a
pure string pipeline — no per-row Python, no model.  The classic
portable recipe (Moses' split-sentences.perl lineage, simplified):

1. PROTECT known abbreviations: ``'Dr. '`` -> ``'Dr.\x02 '`` etc., so
   the boundary rule cannot fire inside them (RE2 has no lookbehind,
   so guards must be literal rewrites, not lookarounds);
2. MARK boundaries: a sentence terminator ``[.!?]`` + space +
   capital letter becomes terminator + ``\x1e`` + capital (the
   boundary survives as one char, never a regex split on the original
   text — consumption chains correctly because the next boundary's
   left context is never inside the previous match);
3. SPLIT on ``\x1e`` and RESTORE the protected abbreviations.

Control chars 0x02/0x1e cannot occur in cleaned text (the clean
pipeline and the portability gate both reject them), which makes the
markers collision-free; the same constants appear verbatim in the
DuckDB oracle twin.

Scale: steps 1-2 are map-side regexp/replace chains inside one
codegen'd Project; the split+posexplode is the only row expansion, no
shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: abbreviations whose trailing '. ' is NOT a sentence boundary —
#: deliberately small and fixed (the Moses nonbreaking_prefixes motif);
#: extend per deployment, keeping the oracle list in sync.
ABBREVIATIONS = ("Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "St.",
                 "e.g.", "i.e.", "etc.", "vs.", "No.", "Fig.")

_PROTECT = "\x02"
_MARK = "\x1e"

#: terminator + space + capital == boundary. ASCII classes only (the
#: portability contract shared with linewrap.py).
BOUNDARY_RE = r"([.!?]) ([A-Z])"


def split_sentences_col(c):
    """Array-of-sentences column for ``c`` (string)."""
    t = c
    for a in ABBREVIATIONS:
        t = F.replace(t, F.lit(a + " "), F.lit(a + _PROTECT + " "))
    t = F.regexp_replace(t, BOUNDARY_RE, "$1" + _MARK + "$2")
    t = F.replace(t, F.lit(_PROTECT), F.lit(""))
    return F.split(t, _MARK)


def sentences(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """One row per sentence: (id, sent_idx, sentence, n_tokens)."""
    arr = split_sentences_col(F.col(text_col))
    out = df.select(F.col(id_col),
                    F.posexplode(arr).alias("sent_idx", "sentence"))
    return out.select(
        id_col,
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
        F.size(F.split(F.col("sentence"), " ")).cast("long")
        .alias("n_tokens"))


def bitext_align_score(df_a: DataFrame, df_b: DataFrame, *,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Length-based bitext alignment scoring (Gale & Church 1993's
    core signal — translated sentences have strongly correlated
    lengths — reduced to the positional 1-1 case): split both sides
    into sentences, align sentence i with sentence i, score each
    aligned pair ``min(len)*1e6 div max(len)`` and the document pair
    by ``sum(pair scores) div max(n_a, n_b)`` — unaligned tail
    sentences score 0, so count mismatch is penalized without a DP.
    The cheap triage before a full Gale-Church DP (which needs
    per-pair dynamic programming — a Pandas-UDF job, deliberately out
    of scope for the zero-UDF discovery tier): pairs scoring high here
    ARE overwhelmingly parallel; run the expensive aligner on the
    survivors.

    Everything stays array-valued inside the row — sentence arrays,
    length arrays and ratio arrays materialize in their OWN
    projections (the with_wer/CollapseProject discipline: HOFs inline
    multiply-referenced inputs and re-evaluate them per element), and
    there is no explode: one equi-join on the pair id is the only
    shuffle. HOF lambdas here run over tens of sentences per doc —
    far below the HOF cliff that matters for per-token work.

    Returns (id, n_sents_a, n_sents_b, n_aligned, sum_ratio_ppm,
    mean_ratio_ppm, align_score_ppm).
    """
    la = df_a.select(F.col(id_col),
                     split_sentences_col(F.col(text_col)).alias("__sa"))
    lb = df_b.select(F.col(id_col),
                     split_sentences_col(F.col(text_col)).alias("__sb"))
    j = la.join(lb, id_col)
    j = (j.withColumn("__la", F.transform("__sa",
                                          lambda s: F.length(s)
                                          .cast("long")))
         .withColumn("__lb", F.transform("__sb",
                                         lambda s: F.length(s)
                                         .cast("long"))))
    def _idiv(a, b):
        # exact integer floor-div inside a lambda (no `div` operator on
        # bound lambda variables): the numerator is made divisible, so
        # the double division is an exact small-integer quotient
        return ((a - a % b) / b).cast("long")

    ratio = F.zip_with(
        "__la", "__lb",
        lambda x, y: F.when(
            x.isNotNull() & y.isNotNull(),
            _idiv(F.least(x, y) * 1_000_000,
                  F.greatest(F.greatest(x, y), F.lit(1)))))
    j = j.withColumn("__r", F.filter(ratio,
                                     lambda r: r.isNotNull()))
    sum_ratio = F.aggregate("__r", F.lit(0).cast("long"),
                            lambda acc, r: acc + r)
    j = (j.withColumn("n_sents_a", F.size("__sa").cast("long"))
         .withColumn("n_sents_b", F.size("__sb").cast("long"))
         .withColumn("n_aligned", F.size("__r").cast("long"))
         .withColumn("sum_ratio_ppm", sum_ratio))
    return j.select(
        id_col, "n_sents_a", "n_sents_b", "n_aligned",
        "sum_ratio_ppm",
        F.expr("CASE WHEN n_aligned > 0 THEN "
               "sum_ratio_ppm div n_aligned END")
        .alias("mean_ratio_ppm"),
        F.expr("sum_ratio_ppm div greatest(n_sents_a, n_sents_b)")
        .alias("align_score_ppm"))


def mixed_language_report(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Code-switching / mixed-language detection (the top audit
    finding of Kreutzer et al. 2022, "Quality at a Glance": web-corpus
    language labels routinely hide second-language content): sentence-
    level language votes under the deterministic heuristic langid,
    aggregated per document into (n_sents, n_langs, majority_lang,
    majority_ppm, is_mixed). A doc whose majority share sinks is a
    translation-mix, boilerplate-mix or wrong-label candidate that a
    doc-level langid alone cannot see.

    Shape: sentence fan-out is map-side (posexplode), votes reduce in
    ONE (doc, lang) count with map-side combine, the per-doc argmax is
    a min over (−n, lang) structs — smallest negated count = most
    votes, ties to the alphabetically first lang, identical to the
    DuckDB struct-min. No window, no UDF, nothing quadratic.

    ``is_mixed`` requires BOTH n_langs >= 2 AND a real minority
    share (majority_ppm <= 950_000): a single misvoted sentence in a
    long document no longer flags it — callers wanting the raw
    multi-label signal should threshold majority_ppm themselves."""
    from ocr_engine_spark.functions.text import lang_guess_col
    sents = sentences(df, id_col=id_col, text_col=text_col)
    votes = sents.select(F.col(id_col),
                         lang_guess_col(F.col("sentence")).alias("lang"))
    per_lang = votes.groupBy(id_col, "lang").agg(F.count("*").alias("n"))
    per_doc = (per_lang.groupBy(id_col)
               .agg(F.sum("n").alias("n_sents"),
                    F.count("*").alias("n_langs"),
                    F.min(F.struct((-F.col("n")).alias("nn"),
                                   F.col("lang").alias("lang")))
                    .alias("__m")))
    return (per_doc
            .withColumn("__mn", -F.col("__m.nn"))
            .select(F.col(id_col),
                    F.col("n_sents").cast("long").alias("n_sents"),
                    F.col("n_langs").cast("long").alias("n_langs"),
                    F.col("__m.lang").alias("majority_lang"),
                    F.expr("(__mn * 1000000) div n_sents")
                    .alias("majority_ppm"),
                    ((F.col("n_langs") >= 2)
                     & (F.expr("(__mn * 1000000) div n_sents")
                        <= F.lit(950_000))).alias("is_mixed")))


def burstiness_report(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Sentence-length burstiness — coefficient of variation of
    per-sentence token counts. Human prose is bursty (Madsen et al.
    2005's term-burstiness observation generalizes: sentence lengths
    vary a lot); template floods and much machine-generated text run
    flat, so a LOW cv is a cheap uniformity alarm the quality stack
    reads next to repetition and compression signals.

    Exactness: per-doc sums S and SS are exact int64; ``cv =
    sqrt(n·SS − S²) / S`` needs exactly ONE sqrt over an exact
    integer (IEEE-correctly-rounded on both engines) and one divide,
    quantized to milli at the end. Returns (id, n_sents,
    total_tokens, mean_len_milli, cv_milli); docs with no sentences
    are absent (the sentence fan-out's convention)."""
    sents = sentences(df, id_col=id_col, text_col=text_col)
    g = (sents.groupBy(id_col)
         .agg(F.count("*").alias("n_sents"),
              F.sum("n_tokens").alias("total_tokens"),
              F.sum(F.col("n_tokens") * F.col("n_tokens"))
              .alias("__ss")))
    disc = (F.col("n_sents") * F.col("__ss")
            - F.col("total_tokens") * F.col("total_tokens"))
    cv = (F.sqrt(disc.cast("double"))
          / F.col("total_tokens").cast("double"))
    return g.select(
        id_col,
        F.col("n_sents").cast("long").alias("n_sents"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.expr("(total_tokens * 1000) div n_sents")
        .alias("mean_len_milli"),
        F.floor(cv * 1000 + F.lit(0.5)).cast("long").alias("cv_milli"))
