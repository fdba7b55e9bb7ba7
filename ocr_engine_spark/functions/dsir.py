r"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): pick raw-corpus documents that look
like a small TARGET domain by importance weights under hashed-n-gram
bag-of-words models, then sample with the Gumbel-top-k trick.

The published recipe, re-expressed Spark-first:

  1. features: unigram + bigram word grams, hashed into ``buckets``
     slots (the paper's 10k hashed buckets) — here via the repo-wide
     portable 60-bit md5 hash so DuckDB replays every value;
  2. fit: bucket unigram counts on the target sample (small) and on the
     raw pool; add-``alpha`` smoothing;
  3. weight: per document, ``log w = sum_grams [ln p_target(bucket) -
     ln p_raw(bucket)]``;
  4. resample: Gumbel-top-k — ``key = log w + Gumbel(0,1)`` with
     deterministic hash-seeded noise; the top-k keys are a sample
     without replacement proportional to ``softmax(log w)``.

Exactness across engines: float SUMS are not associative, so two
engines summing per-doc gram scores in different orders drift in the
last ulps. Every per-gram score is therefore quantized ONCE to integer
micro-nats (``round(ln(..) * 1e6)`` as BIGINT) and all downstream sums
/ comparisons are exact 64-bit integer arithmetic — the same
fixed-point discipline as the pii_scrub byte-hash oracle. The only
cross-engine float risk left is a single ``ln`` per bucket landing
within 1 ulp of a 0.5-micro-nat boundary (~1e-9 per bucket).

Plan shape at 100 TB:

  * gram explosion is map-side (one projection; tokens materialized
    first — HOFs never codegen, see functions/text.py);
  * the bucket-count fit shuffles only (bucket, partial_count) pairs —
    at most ``buckets`` distinct keys, map-side combine makes the
    exchange a few KB regardless of corpus size;
  * the ratio table is <= ``buckets`` rows and enters the scoring join
    as a BROADCAST build side: scoring never shuffles corpus grams;
  * the per-doc weight agg shuffles (doc_id, partial_sum) with map-side
    combine — one row per doc per partition, the one unavoidable
    shuffle;
  * Gumbel keys and top-k are a scan + TakeOrderedAndProject.

Reference parity: the reference repo has no data-selection stage at
all (it evaluates on a fixed 8-document corpus); this operator is part
of the LLM-training-data layer the graft adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ocr_engine_spark.functions.decontam import ngrams_col, word_tokens_col
from ocr_engine_spark.functions.text import md5_int60_col

# (h + 0.5) / 2^60 maps the 60-bit portable hash into (0, 1) STRICTLY
# (2^60 is exactly representable as a double; 2^60 + 1 is not) so both
# ln() calls in the Gumbel transform are always finite
_U_DENOM = float(2**60)

MICRO = 1e6  # fixed-point scale: integer micro-nats


def bucket_col(gram: Column, buckets: int) -> Column:
    """Hash a gram into ``[0, buckets)`` — portable: DuckDB twin is
    ``('0x' || substr(md5(g), 1, 15))::BIGINT % buckets`` (the hash is
    non-negative, so ``%`` needs no pmod)."""
    return md5_int60_col(gram) % F.lit(buckets)


def gram_buckets(df: DataFrame, *, buckets: int, id_col: str = "doc_id",
                 text_col: str = "text", ns: tuple[int, ...] = (1, 2)
                 ) -> DataFrame:
    """One (id, bucket) row per word n-gram occurrence (n in ``ns``,
    paper default unigram+bigram).

    Gram strings are built with codegen'd window ``lead``s over the
    pos-exploded token table, not with the ``ngrams_col`` array HOF:
    HOF lambdas are interpreted per element and the array form measured
    2.5x slower on the same output (see dedup.dedup_kgrams for the
    same cliff at 17x with nested lambdas). All ``ns`` variants ride
    ONE window pass — each position emits a struct per n, exploded and
    gated so document tails never form shortened grams. Costs one
    (id, pos) exchange for the window; every consumer of this table
    (the bucket-count fit, the per-doc score agg) shuffles anyway."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), word_tokens_col(F.col(text_col))
                     .alias("__t"))
    pos = toks.select(id_col, F.posexplode("__t").alias("__p", "__w"))
    wnd = Window.partitionBy(id_col).orderBy("__p")
    variants = []
    for n in ns:
        parts = [F.col("__w")] + [F.lead("__w", j).over(wnd)
                                  for j in range(1, n)]
        gate = parts[-1].isNotNull() if n > 1 else F.lit(True)
        variants.append(F.struct(F.concat_ws(" ", *parts).alias("g"),
                                 gate.alias("ok")))
    # the window expressions are materialized in their own Project
    # before the generator — a filter referencing them across the
    # explode otherwise gets pushed into the window project, which
    # Catalyst rejects (UNSUPPORTED_EXPR_FOR_OPERATOR)
    staged = pos.select(id_col, F.array(*variants).alias("__vs"))
    ex = (staged.select(id_col, F.explode("__vs").alias("__s"))
          .filter(F.col("__s.ok")))
    return ex.select(id_col, bucket_col(F.col("__s.g"), buckets)
                     .alias("bucket"))


def bucket_log_ratios(target: DataFrame, raw: DataFrame, *,
                      buckets: int, alpha: float = 1.0,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> DataFrame:
    """(bucket, lr_micro) — the smoothed log-likelihood ratio
    ``ln(p_target(b) / p_raw(b))`` per hash bucket, quantized to
    integer micro-nats. At most ``buckets`` rows (only buckets seen in
    the raw pool appear — every scorable gram hits one of them, since
    the scored corpus IS the raw pool in the DSIR setup)."""
    tgt = (gram_buckets(target, buckets=buckets, id_col=id_col,
                        text_col=text_col)
           .groupBy("bucket").agg(F.count("*").alias("ct")))
    rawc = (gram_buckets(raw, buckets=buckets, id_col=id_col,
                         text_col=text_col)
            .groupBy("bucket").agg(F.count("*").alias("cr")))
    # scalar totals ride a 1-row broadcast cross join — no driver round
    # trip, and the fit stays one lazy plan
    totals = (rawc.agg(F.sum("cr").alias("tr"))
              .crossJoin(tgt.agg(F.sum("ct").alias("tt"))))
    alpha_b = alpha * buckets  # python-folded literal, same in the SQL twin
    joined = (rawc.join(tgt, "bucket", "left")
              .withColumn("ct", F.coalesce(F.col("ct"), F.lit(0)))
              .crossJoin(F.broadcast(totals)))
    p_t = (F.col("ct") + F.lit(alpha)) / (F.col("tt") + F.lit(alpha_b))
    p_r = (F.col("cr") + F.lit(alpha)) / (F.col("tr") + F.lit(alpha_b))
    lr_micro = F.round(F.log(p_t / p_r) * F.lit(MICRO), 0).cast("long")
    return joined.select("bucket", lr_micro.alias("lr_micro"))


def importance_weights(docs: DataFrame, ratios: DataFrame, *,
                       buckets: int, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, n_grams, weight_micro) per document with >= 1 gram:
    ``weight_micro = sum(lr_micro)`` over the document's grams — the
    document's log importance weight in micro-nats. Gram-less documents
    (empty/whitespace text) are absent, as in the paper."""
    db = gram_buckets(docs, buckets=buckets, id_col=id_col,
                      text_col=text_col)
    return (db.join(F.broadcast(ratios), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.sum("lr_micro").alias("weight_micro")))


def gumbel_micro_col(id_c: Column, seed: int) -> Column:
    """Deterministic standard-Gumbel noise in integer micro-nats:
    ``u = (md5_60(id || ':' || seed) + 0.5) / 2^60`` then
    ``-ln(-ln(u))``, quantized. Hash-seeded so reruns, engines and
    partitionings all agree."""
    h = md5_int60_col(F.concat_ws(":", id_c.cast("string"),
                                  F.lit(str(seed))))
    u = (h + F.lit(0.5)) / F.lit(_U_DENOM)
    return F.round(-F.log(-F.log(u)) * F.lit(MICRO), 0).cast("long")


def dsir_select(docs: DataFrame, target: DataFrame, k: int, *,
                buckets: int = 4096, alpha: float = 1.0, seed: int = 42,
                id_col: str = "doc_id", text_col: str = "text"
                ) -> DataFrame:
    """Gumbel-top-k DSIR selection: the ``k`` documents of ``docs``
    with the largest ``weight_micro + gumbel_micro`` key — a without-
    replacement sample proportional to ``softmax(log w)``. Returns
    (rank, id, n_grams, weight_micro, key_micro), rank 1 = first
    drawn. Deterministic in (corpus, target, buckets, alpha, seed)."""
    ratios = bucket_log_ratios(target, docs, buckets=buckets,
                               alpha=alpha, id_col=id_col,
                               text_col=text_col)
    w = importance_weights(docs, ratios, buckets=buckets, id_col=id_col,
                           text_col=text_col)
    keyed = w.withColumn(
        "key_micro",
        F.col("weight_micro") + gumbel_micro_col(F.col(id_col), seed))
    ranked = (keyed
              .orderBy(F.col("key_micro").desc(), F.col(id_col))
              .limit(k)
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("key_micro").desc(),
                                 F.col(id_col)))))
    return ranked.select("rank", id_col, "n_grams", "weight_micro",
                         "key_micro")


def ess_report(weights: DataFrame, *,
               weight_col: str = "weight_micro") -> DataFrame:
    """Effective sample size of the importance weights (Kong 1992 —
    the standard importance-sampling health gate): ``ESS =
    (Σw)² / Σw²``. An ESS collapsing toward 1 means a handful of
    documents dominate the resample (target too narrow, buckets too
    coarse) and the DSIR selection is running on noise — price it
    BEFORE spending the token budget the selection feeds.

    Log-weights (micro-nats) are exponentiated ONCE after the
    log-sum-exp max shift — a 1-row broadcast, never a driver read —
    and quantized to micro, so both engines sum identical integers
    (u <= 1e6; the u² sum rides decimal(38,0) like host_gini's
    arithmetic, safe at any corpus size). ESS and its
    fraction-of-corpus are single double expressions over the exact
    sums. Returns one row (n_docs, ess_milli, ess_frac_ppm)."""
    m = weights.agg(F.max(weight_col).alias("__m"))
    u = F.round(
        F.exp((F.col(weight_col) - F.col("__m")).cast("double")
              / F.lit(1e6)) * F.lit(1e6), 0).cast("long")
    s = (weights.crossJoin(F.broadcast(m))
         .select(u.alias("__u"))
         .agg(F.count("*").alias("n_docs"),
              F.sum(F.col("__u").cast("decimal(38,0)")).alias("__su"),
              F.sum((F.col("__u") * F.col("__u"))
                    .cast("decimal(38,0)")).alias("__suu")))
    ess = (F.col("__su").cast("double") * F.col("__su").cast("double")
           / F.col("__suu").cast("double"))
    return s.select(
        "n_docs",
        F.floor(ess * 1000 + F.lit(0.5)).cast("long")
        .alias("ess_milli"),
        F.floor(ess * 1e6 / F.col("n_docs").cast("double")
                + F.lit(0.5)).cast("long").alias("ess_frac_ppm"))
