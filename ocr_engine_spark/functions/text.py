r"""Text-analysis columns: token counting, quality scoring, language
guessing, fingerprinting.

All pure JVM expressions (no Python): these run on every document of a
100 TB corpus, so they must stay inside whole-stage codegen. Each has an
exactly-matching DuckDB SQL twin for the oracle gate (the arithmetic is
integer/double IEEE ops identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# fixed stopword lists (deterministic; shared with the oracle SQL)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "with", "for", "on"],
    "fr": ["le", "la", "les", "des", "et", "une", "avec", "sur", "dans", "du"],
    "de": ["die", "der", "und", "mit", "von", "das", "ein", "für", "auf", "im"],
    "es": ["el", "la", "los", "de", "y", "con", "en", "una", "por", "para"],
}

PUNCT_CLASS = r"[,.;:!?()\[\]\"']"


def tokens_col(c: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(c), r"\s+"))


def token_count_col(c: Column) -> Column:
    return F.size(tokens_col(c)).cast("long")


def stopword_count_col(c: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(
        tokens_col(F.lower(c)), lambda w: w.isin(*words))).cast("long")


def punct_count_col(c: Column) -> Column:
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))) \
        .cast("long")


def quality_score_raw_col(c: Column) -> Column:
    """Unrounded [0,1] quality score: length signal (40%), stopword
    naturalness (30%), punctuation sanity (20%), mean-word-length sanity
    (10%) — the classic Gopher/C4-style cheap filters, as one codegen'd
    expression. Consumers that need integer micro units quantize THIS
    with ``floor(x*1e6 + 0.5)`` (pure IEEE ops, engine-identical)
    rather than re-rounding the 4-decimal presentation value — Spark's
    BigDecimal HALF_UP and DuckDB's scaled-multiply round() disagree on
    decimal ties (observed on the documents fixture)."""
    n_tokens = token_count_col(c)
    n_chars = F.length(c).cast("long")
    n_stop = stopword_count_col(c, "en")
    n_punct = punct_count_col(c)
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / safe_tokens
    punct_ratio = n_punct.cast("double") / safe_chars
    mean_wlen = (n_chars - (n_tokens - 1)).cast("double") / safe_tokens
    return (
        F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 8.0, F.lit(1.0))) * 0.2
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0))
           .otherwise(F.lit(0.0)) * 0.1)


def quality_score_col(c: Column) -> Column:
    """4-decimal presentation round of ``quality_score_raw_col``."""
    return F.round(quality_score_raw_col(c), 4)


def lang_guess_col(c: Column) -> Column:
    """n-gram-free heuristic language ID: script detection (Arabic/CJK
    char ratio > 8% — script chars are decisive even when boilerplate
    dilutes them) then stopword-count argmax over en/fr/de/es with a fixed
    tie-break order. Deterministic; identical logic in the oracle SQL.

    The argmax is ONE aggregate fold over a constant
    array<struct<lang, words>> (first-wins on ties == the oracle's
    ordered when-chain en>fr>de>es). The naive per-lang
    ``stopword_count_col`` when-chain inlines the tokenizer ~12x —
    higher-order functions don't codegen, so that re-tokenizes every
    document a dozen times (measured ~20x slower)."""
    n_chars = F.greatest(F.length(c), F.lit(1))
    n_ar = F.length(c) - F.length(F.regexp_replace(c, "[؀-ۿ]", ""))
    n_cjk = F.length(c) - F.length(F.regexp_replace(c, "[一-鿿]", ""))
    order = ["en", "fr", "de", "es"]
    lang_words = F.array(*[
        F.struct(F.lit(lang).alias("lang"),
                 F.array(*[F.lit(w) for w in STOPWORDS[lang]]).alias("words"))
        for lang in order])
    toks = tokens_col(F.lower(c))
    scored = F.transform(
        lang_words,
        lambda lw: F.struct(
            lw["lang"].alias("lang"),
            F.size(F.filter(toks, lambda t: F.array_contains(lw["words"], t)))
             .alias("n")))
    best = F.aggregate(
        scored,
        F.struct(F.lit("").alias("lang"), F.lit(-1).alias("n")),
        lambda acc, x: F.when(x["n"] > acc["n"], x).otherwise(acc))["lang"]
    return (
        F.when(n_ar.cast("double") / n_chars > 0.08, F.lit("ar"))
         .when(n_cjk.cast("double") / n_chars > 0.08, F.lit("zh"))
         .otherwise(best)
    )


# BPE-style pretokenizer (GPT-2 family), lookahead-free so the same
# pattern runs under Java regex (Spark) and RE2 (DuckDB oracle):
# contractions | space?+letters | space?+digits | space?+other | spaces
BPE_PATTERN = (r"'(?:[sdmt]|ll|ve|re)"
               r"| ?\p{L}+"
               r"| ?\p{N}+"
               r"| ?[^\s\p{L}\p{N}]+"
               r"|\s+")


def bpe_token_count_col(c: Column) -> Column:
    """Tokenizer-aware token count: number of BPE pretokens (the unit a
    GPT-style tokenizer splits on before merges). One JVM regexp_count —
    no Python, no vocab needed for COUNTING purposes (merges only join
    bytes WITHIN a pretoken... they reduce counts; this is the standard
    cheap upper-bound token estimate for corpus budgeting)."""
    return F.regexp_count(c, F.lit(BPE_PATTERN)).cast("long")


def with_rolling_fingerprints(df, text_col: str = "text",
                              k: int = 16, mod: int = 64,
                              out: str = "fingerprints"):
    """Content-defined document fingerprints (winnowing-family): hash
    every k-char gram of the normalized text, keep those where
    hash % mod == 0 (~1/mod content-defined sampling). Near-identical
    documents share most selected fingerprints regardless of alignment —
    the classic rolling-hash sketch for plagiarism/near-dup detection.
    md5-based so the DuckDB oracle reproduces the values exactly.

    DataFrame-level on purpose: the normalized text must be MATERIALIZED
    in its own projection (it is referenced by the sequence bound and by
    every lambda element; inlined it would re-normalize per gram —
    O(n^2) per document; see functions/dedup.py on the HOF-inlining
    trap)."""
    norm = f"__norm_{out}"
    d = df.withColumn(norm, normalized_col(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - (k - 1)),
        lambda i: md5_int60_col(F.substring(F.col(norm), i, k)))
    # guard: sequence(1, n) counts DOWN when n < 1 — short docs need an
    # explicit empty array
    hashes = F.when(F.length(norm) < k,
                    F.array().cast("array<long>")).otherwise(grams)
    return d.withColumn(out, F.filter(hashes, lambda h: h % mod == 0)) \
            .drop(norm)


def with_repetition_ratio(df, text_col: str = "text", n: int = 3,
                          out: str = "rep_ratio"):
    """Gopher-style within-document repetition signal: the fraction of
    word n-grams that are duplicates of an earlier n-gram in the same
    document (0 = no repetition, ->1 = loops/spam). DataFrame-level on
    purpose: the token array is MATERIALIZED in its own projection —
    referenced by the sequence bound and every gram lambda, inlined it
    would re-tokenize per gram (the HOF O(n^2) trap; see
    functions/dedup.py)."""
    toks = f"__toks_{out}"
    d = df.withColumn(toks, tokens_col(F.lower(F.col(text_col))))
    n_grams = F.size(F.col(toks)) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.concat_ws(" ", F.slice(F.col(toks), i, n)))
    ratio = F.when(n_grams < 1, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams))
                / n_grams.cast("double"), 6))
    return d.withColumn(out, ratio).drop(toks)


def normalized_col(c: Column) -> Column:
    """Dedup normalization: lowercase + whitespace collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def md5_int60_col(c: Column) -> Column:
    """THE portable cross-engine hash primitive: first 15 hex chars of
    md5 as a 60-bit non-negative int — bit-identical in DuckDB via
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``. Single definition on
    purpose: every md5-backed oracle contract (fingerprints, rolling
    grams, portable MinHash/SimHash token hashes, IVF centroid
    sampling) routes through this one expression."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint_col(c: Column) -> Column:
    """128-bit content fingerprint (hex md5 of normalized text)."""
    return F.md5(normalized_col(c))


def fingerprint64_col(c: Column) -> Column:
    """60-bit integer fingerprint of normalized text (md5_int60_col)."""
    return md5_int60_col(normalized_col(c))


def oracle_stopword_list(lang: str) -> str:
    """Render the stopword set as a SQL IN-list (shared with oracles)."""
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


def corpus_length_stats(df, group_col: str = "lang",
                        text_col: str = "text", *,
                        source_col: str = "source",
                        sketch: bool = False,
                        accuracy: int = 10_000):
    """Per-group document-length profile (count, distinct sources,
    min/max/avg, p50/p90/p99 chars) — the stats a 100 TB ingest
    publishes to its metrics table.

    ``sketch=False`` (default, the oracle-checked path) uses exact
    linear-interpolation ``percentile`` — correct but requires a
    per-group SORT of every length, which at 10^12 rows makes the
    percentile the job's dominant shuffle. ``sketch=True`` switches to
    ``approx_percentile`` (Greenwald-Khanna): mergeable fixed-size
    per-partition summaries, one normal partial-agg shuffle, rank
    error bounded by 1/accuracy of the group size (accuracy=10^4 =>
    p99 lands within rank +-0.01% — e.g. +-10^6 ranks at 10^10 docs
    per group, far below any monitoring threshold). Same output
    schema either way; the sketch's error bound is pytest-asserted
    against the exact path."""
    from pyspark.sql import functions as F
    keys = [group_col] if group_col == source_col else [group_col,
                                                        source_col]
    d = df.select(*keys,
                  F.length(text_col).cast("long").alias("n_chars"))

    def pct(p: float, name: str):
        if sketch:
            return F.approx_percentile("n_chars", F.lit(p),
                                       F.lit(accuracy)) \
                    .cast("double").alias(name)
        return F.round(F.percentile("n_chars", F.lit(p)), 4).alias(name)

    return (d.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct(source_col).alias("n_sources"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 pct(0.5, "p50_chars"),
                 pct(0.9, "p90_chars"),
                 pct(0.99, "p99_chars"))
            .orderBy(group_col))


def tfidf_topk(df, k: int = 5, *, id_col: str = "doc_id",
               text_col: str = "text"):
    """Per-document top-``k`` TF-IDF keywords — the classic document-
    profiling / indexing step. Scores stay in exact integer space:
    ``idf_micro = round(ln(N / df_t) * 1e6)`` is quantized ONCE per
    term (the dsir.py fixed-point rule) and ``score_micro =
    tf * idf_micro`` is 64-bit integer arithmetic, so ranking is
    engine-exact and oracle-checkable.

    Returns (id, rank, token, tf, df, score_micro), rank 1 = best,
    ties broken by token ascending.

    Scale shape: one (doc, token) map-side-combined count, ONE derived
    term-frequency table (rows per token in the tf table == distinct
    docs containing it — no second corpus scan, no countDistinct), a
    shuffle join on token (the df table is corpus-vocabulary-sized:
    too big to assume broadcastable — Spark/AQE broadcasts it when it
    is), and a per-doc window whose groups are bounded by document
    length, never by corpus size. N (total docs) rides a 1-row
    broadcast cross join."""
    from pyspark.sql import Window

    from ocr_engine_spark.functions.generate import explode_nonull
    tf = (explode_nonull(df, tokens_col(F.lower(F.col(text_col))),
                         "token", F.col(id_col))
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    total = df.agg(F.count("*").alias("__n"))
    idf_micro = F.round(
        F.log(F.col("__n") / F.col("df")) * F.lit(1e6), 0).cast("long")
    scored = (tf.join(dfreq, "token")
              .crossJoin(F.broadcast(total))
              .withColumn("score_micro", F.col("tf") * idf_micro)
              .drop("__n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "token", "tf", "df", "score_micro"))


def collocations_topk(df, k: int = 20, *, min_count: int = 5,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Top-``k`` bigram collocations by PMI — the phrase-mining stage
    of tokenizer/vocabulary design (Mikolov et al. 2013 word2vec
    phrases; Manning & Schütze ch. 5):

      pmi = ln( p(a b) / (p(a) * p(b)) )
          = ln( c_ab * T_uni^2 / (T_bi * c_a * c_b) )

    with unigram/bigram counts over ``word_tokens_col`` tokens and a
    ``min_count`` floor on the bigram (PMI is degenerate for rare
    pairs — a hapax pair of hapax words maximizes it).

    Exactness: one quantization to integer micro-nats per surviving
    bigram (the dsir.py fixed-point rule) — the ln argument is
    assembled as BIGINT products cast once to DOUBLE, so both engines
    round the same value. Returns (rank, bigram, c_ab, c_a, c_b,
    pmi_micro), rank 1 = highest PMI, ties by bigram ascending.

    Plan shape at 100 TB: tokens pos-explode map-side; bigrams come
    from ONE codegen'd window lead over (id, pos) (the HOF-cliff rule,
    see dedup.dedup_kgrams); unigram + bigram counts are two map-side-
    combined aggregates whose keys are vocabulary-bounded (Heaps' law);
    the count join is vocabulary-sized; top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import Window, functions as F

    from ocr_engine_spark.functions.decontam import word_tokens_col

    toks = df.select(F.col(id_col), word_tokens_col(F.col(text_col))
                     .alias("__t"))
    pos = toks.select(id_col, F.posexplode("__t").alias("__p", "__w"))
    uni = pos.groupBy(F.col("__w").alias("w")) \
             .agg(F.count("*").alias("c"))
    wnd = Window.partitionBy(id_col).orderBy("__p")
    nxt = F.lead("__w", 1).over(wnd)
    big = (pos.select(F.col("__w").alias("a"), nxt.alias("b"))
           .filter(F.col("b").isNotNull())
           .groupBy("a", "b").agg(F.count("*").alias("c_ab"))
           .filter(F.col("c_ab") >= min_count))
    # scalar totals ride a 1-row broadcast cross join (dsir.py pattern)
    totals = (uni.agg(F.sum("c").alias("t_uni"))
              .crossJoin(big.agg(F.sum("c_ab").alias("t_bi"))))
    ca = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    j = (big.join(F.broadcast(ca), "a").join(F.broadcast(cb), "b")
         .crossJoin(F.broadcast(totals)))
    # each factor casts to DOUBLE BEFORE multiplying: t_uni^2 as BIGINT
    # overflows at ~10^9.5 corpus tokens; IEEE double products are
    # order-deterministic so the oracle replays them exactly
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    num = dbl("c_ab") * dbl("t_uni") * dbl("t_uni")
    den = dbl("t_bi") * dbl("c_a") * dbl("c_b")
    pmi_micro = F.round(F.log(num / den) * F.lit(1e6), 0).cast("long")
    scored = j.select(F.concat_ws(" ", "a", "b").alias("bigram"),
                      "c_ab", "c_a", "c_b",
                      pmi_micro.alias("pmi_micro"))
    topk = scored.orderBy(F.col("pmi_micro").desc(),
                          F.col("bigram")).limit(k)
    w = Window.orderBy(F.col("pmi_micro").desc(), F.col("bigram"))
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("rank", "bigram", "c_ab", "c_a", "c_b",
                    "pmi_micro"))


def readability_profile(df, *, id_col: str = "doc_id",
                        text_col: str = "text"):
    """(id, n_sentences, n_words, n_chars, wps_micro, cpw_micro,
    ari_micro) — classic readability signals as integer-exact
    micro-unit DataFrame expressions: words-per-sentence,
    chars-per-word and the Automated Readability Index (the cheap
    heuristic cousin of the FineWeb-Edu educational-quality
    classifier; ARI uses only exact counts, unlike syllable-based
    formulas).

    Pinned, SQL-replayable definitions (no HOF lambdas — the
    interpreter-cliff rule):

      * ``n_sentences`` = number of ``[.!?]+`` terminator RUNS — an
        unterminated trailing fragment is not counted; 0 terminators
        -> all ratio columns NULL;
      * ``n_words`` = 1 + number of ``[ \\t\\n\\r]+`` runs inside the
        trimmed text; empty/whitespace-only text -> 0 words, ratio
        columns NULL;
      * ``n_chars`` = CHARACTER (code-point) count with ALL whitespace
        removed — both F.length and DuckDB length() count code points,
        not octets;
      * ``wps_micro = n_words * 1e6 div n_sentences``; ``cpw_micro =
        n_chars * 1e6 div n_words``; ``ari_micro = 4710000 * n_chars
        div n_words + 500000 * n_words div n_sentences - 21430000``
        (ARI = 4.71 chars/word + 0.5 words/sentence - 21.43, each
        term floored once — deterministic on both engines).

    One map-side Project: zero shuffle, zero UDF."""
    t = F.col(text_col)
    # full-whitespace-class trim (Spark's trim() strips spaces only)
    trimmed = F.regexp_replace(t, r"^[ \t\n\r]+|[ \t\n\r]+$", "")
    n_sent = (F.size(F.split(t, r"[.!?]+")) - 1).cast("long")
    n_words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"[ \t\n\r]+"))).cast("long")
    n_chars = F.length(F.regexp_replace(t, r"[ \t\n\r]+", "")) \
        .cast("long")
    base = df.select(F.col(id_col).alias("id"),
                     n_sent.alias("n_sentences"),
                     n_words.alias("n_words"),
                     n_chars.alias("n_chars"))
    ok = (F.col("n_sentences") > 0) & (F.col("n_words") > 0)
    return base.select(
        "id", "n_sentences", "n_words", "n_chars",
        F.when(ok, F.expr("n_words * 1000000L div n_sentences"))
        .alias("wps_micro"),
        F.when(ok, F.expr("n_chars * 1000000L div n_words"))
        .alias("cpw_micro"),
        F.when(ok, F.expr("4710000L * n_chars div n_words"
                          " + 500000L * n_words div n_sentences"
                          " - 21430000L")).alias("ari_micro"))


def source_quality_prior(docs: DataFrame, *, id_col: str = "doc_id",
                         text_col: str = "text",
                         group_col: str = "source",
                         pseudo_count: int = 20) -> DataFrame:
    """(doc_id, source, quality_micro, n_group, prior_micro,
    lift_micro) — the FineWeb/CCNet 'domain prior' motif: a document's
    quality signal shrunk toward its SOURCE's (domain's) mean, so
    routing decisions can use the group-level reputation where the
    per-doc signal is noisy (short docs) and the per-doc signal where
    the group is unproven.

    ``prior_micro`` is Bayesian shrinkage with ``pseudo_count`` m
    pseudo-observations of the corpus-wide mean::

        prior = (sum(q_group) + m * global_mean) div (n_group + m)

    Everything after the single ``floor(quality*1e6 + 0.5)``
    quantization (of the UNROUNDED score — see quality_score_raw_col
    on why round() is not engine-portable on ties) is 64-bit integer
    arithmetic, so the whole operator — global mean included — replays
    hash-exactly in the DuckDB oracle.
    ``lift_micro = quality_micro - prior_micro`` is the per-doc
    residual (how much better/worse this doc is than its source
    predicts — the two-stage filter threshold input).

    Scale shape: one map-side-combined groupBy on ``group_col``
    (sources/domains are ~1e5-1e6 rows at web scale, never
    corpus-sized), a 1-row global aggregate cross-joined in (broadcast
    by construction), and one broadcast join of the group table back
    onto the corpus — the corpus itself shuffles ZERO times."""
    q_micro = F.floor(quality_score_raw_col(F.col(text_col))
                      * 1_000_000 + 0.5).cast("long")
    scored = docs.select(F.col(id_col), F.col(group_col),
                         q_micro.alias("quality_micro"))
    grp = scored.groupBy(group_col).agg(
        F.sum("quality_micro").alias("__sum_q"),
        F.count(F.lit(1)).alias("n_group"))
    glob = scored.agg(
        F.expr("sum(quality_micro) div count(1)").alias("__gmean"))
    m = int(pseudo_count)
    prior = grp.crossJoin(F.broadcast(glob)).select(
        group_col,
        F.col("n_group").cast("long").alias("n_group"),
        F.expr(f"(__sum_q + {m} * __gmean) div (n_group + {m})")
        .alias("prior_micro"))
    return (scored.join(F.broadcast(prior), group_col)
            .select(id_col, group_col, "quality_micro", "n_group",
                    "prior_micro",
                    (F.col("quality_micro") - F.col("prior_micro"))
                    .alias("lift_micro")))


def vocab_growth(df, *, bucket_docs: int = 50,
                 id_col: str = "doc_id",
                 text_col: str = "text"):
    """Vocabulary growth curve (Heaps'-law points): distinct types
    seen vs tokens consumed, walking documents in ``id_col`` order —
    the corpus-QA diagnostic behind "is this crawl adding NEW language
    or recycling the old" (dedup regressions, template floods and
    synthetic-text loops all flatten the curve).

    Each type is charged to the document of its FIRST occurrence
    (min (doc_id, pos) — the Lee et al. argmin-over-gram motif at
    token granularity), then both axes aggregate to ``bucket_docs``
    buckets before the cumulative pass.

    Scale design: the per-type argmin is one groupBy(word) with
    map-side combine (bounded by vocabulary size, not corpus size);
    token counts shuffle on the bucket key only; the cumulative window
    runs over #buckets rows — there is NO window over docs or types,
    so a 10^12-doc corpus needs only a wider bucket. Output:
    (bucket, n_docs, n_tokens, new_types, cum_tokens, cum_types,
    ttr_ppm) where ttr_ppm = cum_types * 1e6 div cum_tokens.
    """
    from pyspark.sql import Window
    bucket = F.expr(f"{id_col} div {int(bucket_docs)}").alias("bucket")
    from ocr_engine_spark.functions.generate import posexplode_nonull
    pos = posexplode_nonull(df, F.split(F.col(text_col), " "),
                            "__p", "__w", F.col(id_col))
    firsts = (pos.groupBy("__w")
              .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                  F.col("__p").alias("p")))
                   .alias("__f"))
              .select(F.col("__f.d").alias(id_col)))
    new_types = (firsts
                 .groupBy(bucket)
                 .agg(F.count("*").alias("new_types")))
    toks = (df.groupBy(bucket)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size(F.split(F.col(text_col), " "))
                       .cast("long")).alias("n_tokens")))
    wnd = (Window.orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (toks.join(new_types, "bucket", "left")
           .withColumn("new_types",
                       F.coalesce(F.col("new_types"), F.lit(0)))
           .withColumn("cum_tokens", F.sum("n_tokens").over(wnd))
           .withColumn("cum_types", F.sum("new_types").over(wnd)))
    return out.select(
        "bucket", "n_docs", "n_tokens", "new_types",
        "cum_tokens", "cum_types",
        F.expr("(cum_types * 1000000) div cum_tokens")
        .alias("ttr_ppm"))


def winnow_fingerprints(df, *, k: int = 8, w: int = 16,
                        id_col: str = "doc_id",
                        text_col: str = "text"):
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every k-char gram of the
    normalized text, slide a w-hash window, and select each window's
    RIGHTMOST minimum.  Guarantee (unlike the ``hash % mod == 0``
    sampling of :func:`with_rolling_fingerprints`): any substring
    match of length >= w + k - 1 shares at least one selected
    fingerprint — no unlucky gaps, which is why plagiarism/quote
    detectors prefer it; density is ~2/(w+1).

    Relational form: the gram-hash ARRAY materializes per doc (HOF
    over the materialized normalized text — the one pass where text
    is touched), then only 8-byte hashes posexplode into (doc, pos,
    h) rows; rightmost-window-min is ``min(struct(h, -pos))`` over a
    ``[current, w-1 following]`` frame (struct order does the
    tie-break), gated on full windows, then distinct.  The per-doc
    window sorts gram counts, not corpus rows.

    Returns (id, pos, fp) — 0-based gram position, int60 fingerprint.
    """
    from pyspark.sql import Window
    d = with_rolling_fingerprints(df, text_col=text_col, k=k,
                                  mod=1, out="__all_fp")
    # posexplode_OUTER + explicit null filter, NOT plain posexplode: a
    # non-outer Generate makes Catalyst infer `size(arr) > 0 AND
    # isnotnull(arr)` guards (InferFiltersFromGenerate) and inline the
    # WHOLE gram-hash HOF subtree into a scan-side interpreted Filter
    # — the k-gram array was being computed 2 extra times per SCANNED
    # row, before the doc predicate pruned anything (measured 27x:
    # 13.4 s -> 0.5 s on sf0.1, and the cost scaled with the full
    # table, not the filtered 60 docs). Outer generate infers nothing;
    # empty-array docs surface as one null-pos row dropped right here.
    pos = (d.select(F.col(id_col),
                    F.posexplode_outer("__all_fp").alias("__p", "__h"))
           .filter(F.col("__p").isNotNull()))
    wnd = (Window.partitionBy(id_col).orderBy("__p")
           .rowsBetween(Window.currentRow, w - 1))
    sel = (pos
           .withColumn("__m", F.min(F.struct(F.col("__h"),
                                             (-F.col("__p"))
                                             .alias("__np"))).over(wnd))
           .withColumn("__full", F.count("__h").over(wnd) == w)
           .filter(F.col("__full"))
           .select(F.col(id_col),
                   (-F.col("__m.__np")).cast("long").alias("pos"),
                   F.col("__m.__h").alias("fp"))
           .distinct())
    return sel


def zipf_fit(df, *, top_n: int = 100, text_col: str = "text"):
    """Zipf's-law fit over the corpus unigram distribution: OLS of
    ``ln(freq)`` on ``ln(rank)`` for the top ``top_n`` terms — the
    one-row corpus-health scalar behind "does this crawl look like
    natural language" (natural text sits near slope -1 [Zipf 1949;
    Piantadosi 2014]; template floods and synthetic loops flatten or
    steepen it, so drift in the slope is a cheap generation-loop /
    spam-regression alarm next to `vocab_growth`'s Heaps curve).

    Portability contract (the tfidf/dsir fixed-point discipline):
    ``x = round(ln(rank)*1e6)`` and ``y = round(ln(count)*1e6)`` are
    quantized ONCE per term; every OLS sum (Sx, Sy, Sxy, Sxx, Syy)
    stays in exact int64 arithmetic (order-free, so Spark's partial
    aggregation and DuckDB's serial sum agree bit-for-bit; bounds:
    |x| <= 1.9e7 @ rank 1e8, so Sxy <= top_n * 3.6e14 — safe to
    top_n ~ 2.5e4); slope / intercept / r² are each ONE double
    expression over those exact integers, floor(·*1e6 + 0.5)-quantized
    at the end. Slope and intercept are in micro-ln units per ln unit
    (dimensionless), r² in micro.

    Scale shape: one map-side-combined token count shuffle (bounded by
    vocabulary), a TakeOrdered top-``top_n``, a single-partition
    row_number over ``top_n`` rows, and a 1-row aggregate. Nothing
    else touches corpus size."""
    from pyspark.sql import Window

    from ocr_engine_spark.functions.generate import explode_nonull
    counts = (explode_nonull(df, tokens_col(F.lower(F.col(text_col))),
                             "__tok")
              .groupBy("__tok").agg(F.count("*").alias("__cnt")))
    top = counts.orderBy(F.col("__cnt").desc(),
                         F.col("__tok").asc()).limit(int(top_n))
    w = Window.orderBy(F.col("__cnt").desc(), F.col("__tok").asc())
    ranked = top.select(
        F.row_number().over(w).alias("__rank"), "__cnt")
    pts = ranked.select(
        F.round(F.log(F.col("__rank").cast("double")) * 1e6, 0)
        .cast("long").alias("__x"),
        F.round(F.log(F.col("__cnt").cast("double")) * 1e6, 0)
        .cast("long").alias("__y"))
    s = pts.agg(
        F.count("*").alias("n_terms"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"))
    n = F.col("n_terms")
    cov = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    varx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
    vary = (n * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    # one double expression each; micro-quantized with floor(x+0.5)
    # (round() half-away differs between engines for negatives)
    slope = cov.cast("double") / varx.cast("double")
    intercept = (F.col("__sy").cast("double")
                 - slope * F.col("__sx").cast("double")) / n.cast("double")
    r2 = ((cov.cast("double") * cov.cast("double"))
          / (varx.cast("double") * vary.cast("double")))
    return s.select(
        "n_terms",
        F.floor(slope * 1e6 + F.lit(0.5)).cast("long")
        .alias("slope_micro"),
        F.floor(intercept + F.lit(0.5)).cast("long")
        .alias("intercept_micro"),
        # degenerate flat corpus: vary = 0 -> r² undefined, not ±Inf
        # (ANSI mode would throw casting Inf to long)
        F.when(vary == 0, F.lit(None).cast("long"))
        .otherwise(F.floor(r2 * 1e6 + F.lit(0.5)).cast("long"))
        .alias("r2_micro"))


def tabular_report(df, *, min_lines: int = 3,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Plain-text tabular-data detection (the code/data-corpus triage
    motif — The Stack's filters treat delimiter-regular files as data,
    not prose; a web corpus wants the same flag for pasted CSV/TSV
    dumps and log files): per document, the MODAL per-line delimiter
    count for tab and comma, and the share of lines agreeing with it.
    A doc whose lines overwhelmingly carry the same nonzero delimiter
    count is a table, whatever its extension said.

    Returns (id, n_lines, tab_mode, tab_agree_ppm, comma_mode,
    comma_agree_ppm, is_tabular) where ``is_tabular`` = either
    delimiter's modal count >= 1 with agreement >= 80% over at least
    ``min_lines`` lines.

    Shape: line fan-out is map-side; two (doc, count) vote aggregates
    with map-side combine; the per-doc argmax is the struct-min trick
    (most votes, ties to the SMALLER delimiter count). No window over
    lines, no UDF."""
    from ocr_engine_spark.functions.generate import explode_nonull

    lines = explode_nonull(
        df, F.split(F.col(text_col), r"\n"), "__line", F.col(id_col))
    counted = lines.select(
        F.col(id_col),
        (F.length("__line")
         - F.length(F.regexp_replace("__line", r"\t", "")))
        .alias("__tabs"),
        (F.length("__line")
         - F.length(F.regexp_replace("__line", ",", "")))
        .alias("__commas"))

    def modal(col: str, prefix: str):
        votes = (counted.groupBy(id_col, col)
                 .agg(F.count("*").alias("__n")))
        best = (votes.groupBy(id_col)
                .agg(F.sum("__n").alias("__total"),
                     F.min(F.struct((-F.col("__n")).alias("nn"),
                                    F.col(col).alias("c")))
                     .alias("__m")))
        return best.select(
            F.col(id_col),
            F.col("__total").cast("long").alias(f"{prefix}_lines"),
            F.col("__m.c").cast("long").alias(f"{prefix}_mode"),
            F.expr(f"((-__m.nn) * 1000000) div __total")
            .alias(f"{prefix}_agree_ppm"))

    t = modal("__tabs", "tab")
    c = modal("__commas", "comma")
    out = t.join(c, id_col)
    is_tab = (
        (F.col("tab_lines") >= int(min_lines))
        & (((F.col("tab_mode") >= 1)
            & (F.col("tab_agree_ppm") >= 800_000))
           | ((F.col("comma_mode") >= 1)
              & (F.col("comma_agree_ppm") >= 800_000))))
    return out.select(
        id_col, F.col("tab_lines").alias("n_lines"),
        "tab_mode", "tab_agree_ppm", "comma_mode", "comma_agree_ppm",
        is_tab.alias("is_tabular"))
