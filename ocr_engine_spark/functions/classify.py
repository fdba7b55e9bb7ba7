r"""Multiclass multinomial Naive Bayes text classifier — the trainable
quality/domain/language classifier stage of an LLM training-data
pipeline (the fastText-style linear filter of the GPT-3 / CCNet /
RefinedWeb recipes: Brown et al. 2020 §A "quality classifier",
Wenzek et al. 2020 §4.4), trained AND scored entirely as DataFrame
aggregates — no driver-side model object, no per-row Python, no MLlib.

Relationship to functions/dsir.py: DSIR's bucket log-ratio is exactly a
BINARY NB likelihood ratio without a prior. This module is the general
k-class version with log-priors and an argmax decision, so one engine
surface covers language ID by training data (vs the fixed stopword
heuristic in functions/text.py), binary quality filtering (train on
kept-vs-rejected labels), and domain routing.

Model = two SMALL tables (never a driver-side object):

  * ``labels(label, prior_micro, floor_micro, n_grams_l)`` — one row
    per class: quantized log prior ``ln(n_docs_l / n_docs)`` and the
    smoothing floor ``ln(alpha / (t_l + alpha*B))`` every UNSEEN
    (label, bucket) pair scores;
  * ``cond(label, bucket, delta_micro)`` — only (label, bucket) pairs
    SEEN in training, carrying ``llh_micro - floor_micro`` (how much
    better than the floor a seen bucket scores). <= k*B rows, so the
    scoring join is always a broadcast.

The floor/delta decomposition is the standard sparse-NB identity

  score(d, l) = prior_l + n_grams(d) * floor_l
                + sum_{g in d, (l, b(g)) seen} delta(l, b(g))

which lets the scorer join documents' grams against ONLY the seen
pairs instead of densifying to k*B per document.

Exactness across engines (same fixed-point discipline as dsir.py):
``llh``, ``floor`` and ``prior`` are each quantized ONCE to integer
micro-nats; ``delta`` is an exact integer difference of two quantized
values; all downstream sums and the argmax comparison are 64-bit
integer arithmetic, so the DuckDB oracle replays every score
bit-for-bit. Ties (integer-equal scores) break on the smaller label
string via a replayable row_number window.

Plan shape at 100 TB:

  * fit: gram explosion is map-side; the (label, bucket) count shuffles
    at most k*B distinct keys with map-side combine — a few MB
    regardless of corpus size; doc priors shuffle one row per label;
  * predict: grams join a BROADCAST cond table (fan-out k per gram at
    most — in practice only labels that saw the bucket), then ONE
    shuffle on (doc, label) with map-side combine; the per-doc argmax
    is a k-row-per-key window over the same doc key.
  * gram-less documents (empty text) still classify — by prior alone —
    via the left join from the document spine.

Reference parity: the reference repo has no trainable classifier; this
is part of the LLM-training-data layer the graft adds (SURVEY.md §2
"beyond-reference pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_engine_spark.functions.decontam import ngrams_col, word_tokens_col
from ocr_engine_spark.functions.dsir import MICRO, bucket_col, gram_buckets

__all__ = ["nb_fit", "nb_predict", "nb_confusion", "char_gram_buckets",
           "save_nb_model", "load_nb_model"]


def char_gram_buckets(df: DataFrame, *, buckets: int,
                      id_col: str = "doc_id", text_col: str = "text",
                      ns: tuple[int, ...] = (2, 3),
                      cap: int = 256) -> DataFrame:
    """One (id, bucket) row per CHARACTER n-gram of the lowercased
    first ``cap`` chars — the fastText-langid feature space (char
    2–4-grams carry the orthographic signal word tokens destroy:
    'sch', 'ção', CJK codepoints). Language ID needs only a prefix,
    so ``cap`` bounds the fan-out per document regardless of length.

    Fully codegen'd and SHUFFLE-FREE: positions come from one
    ``explode(sequence(1, len))`` and each gram is a column-position
    ``substr`` read straight out of the prefix — no interpreted HOF
    lambda (the ~20 us/element cliff gram_buckets documents), and —
    unlike word n-grams — no window ``lead`` either, because char
    grams need no cross-row assembly. All ``ns`` ride one explode via
    the same staged struct-array discipline as gram_buckets, gated so
    prefix tails never form shortened grams."""
    t = F.lower(F.substring(F.col(text_col), 1, cap))
    src = df.select(F.col(id_col), t.alias("__t"))
    # guard: sequence(1, 0) is DESCENDING in Spark — empty text must
    # yield null (explode drops it), never a [1, 0] position list
    idx = F.when(F.length("__t") >= 1,
                 F.sequence(F.lit(1), F.length("__t")))
    pos = src.select(id_col, "__t", F.explode(idx).alias("__p"))
    variants = [F.struct(
        F.col("__t").substr(F.col("__p"), F.lit(n)).alias("g"),
        (F.col("__p") + (n - 1) <= F.length("__t")).alias("ok"))
        for n in ns]
    staged = pos.select(id_col, F.array(*variants).alias("__vs"))
    ex = (staged.select(id_col, F.explode("__vs").alias("__s"))
          .filter(F.col("__s.ok")))
    return ex.select(id_col, bucket_col(F.col("__s")["g"], buckets)
                     .alias("bucket"))


def nb_fit(labeled: DataFrame, *, buckets: int = 4096, alpha: float = 1.0,
           text_col: str = "text", label_col: str = "label",
           ns: tuple[int, ...] = (1, 2), features: str = "word",
           cap: int = 256) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB on ``labeled`` (one text + one label per row).

    Returns ``(labels, cond)`` — see module docstring for the schema
    contract. Deterministic in (data, buckets, alpha, ns, features,
    cap); both outputs are pure lazy plans (persist them if scoring
    repeatedly). ``features``: "word" = lowercased word-token n-grams
    (quality/domain filters); "char" = character n-grams of the first
    ``cap`` chars (language ID) — ``ns`` are gram sizes in whichever
    feature space.
    """
    lab = F.col(label_col).alias("label")
    # the label RIDES the gram explosion — no grams-back-to-labels
    # join ever exists (doc identity is irrelevant to the fit).
    if features == "char":
        grams = char_gram_buckets(
            labeled.select(lab, F.col(text_col).alias("__txt")),
            buckets=buckets, id_col="label", text_col="__txt",
            ns=ns, cap=cap)
    else:
        # Tokens materialized before the HOF n-gram transforms, same
        # discipline as dsir.gram_buckets.
        toks = labeled.select(lab, word_tokens_col(F.col(text_col))
                              .alias("__t"))
        gr = F.concat(*[ngrams_col(F.col("__t"), n) for n in ns])
        grams = (toks.select("label", F.explode(gr).alias("__g"))
                 .select("label", bucket_col(F.col("__g"), buckets)
                         .alias("bucket")))
    # seen (label, bucket) counts: <= k*B keys, map-side combine makes
    # this exchange tiny at any corpus size
    cb = grams.groupBy("label", "bucket").agg(F.count("*").alias("c"))
    tot = cb.groupBy("label").agg(F.sum("c").alias("t_l"))
    pri = (labeled.groupBy(lab).agg(F.count("*").alias("n_l"))
           .withColumn("n_all", F.sum("n_l").over(Window.partitionBy())))
    alpha_b = float(alpha) * buckets  # python-folded, mirrored in SQL
    # floor and llh are each quantized ONCE; delta is their exact
    # integer difference — the replayable fixed-point contract
    floor = F.round(F.log(F.lit(float(alpha))
                          / (F.col("t_l") + F.lit(alpha_b)))
                    * F.lit(MICRO), 0).cast("long")
    prior = F.round(F.log(F.col("n_l") / F.col("n_all"))
                    * F.lit(MICRO), 0).cast("long")
    labels = (tot.join(pri, "label")
              .select("label", prior.alias("prior_micro"),
                      floor.alias("floor_micro"),
                      F.col("t_l").alias("n_grams_l")))
    llh = F.round(F.log((F.col("c") + F.lit(float(alpha)))
                        / (F.col("t_l") + F.lit(alpha_b)))
                  * F.lit(MICRO), 0).cast("long")
    cond = (cb.join(tot, "label")
            .select("label", "bucket",
                    (llh - floor).alias("delta_micro")))
    return labels, cond


def _nb_scored(docs: DataFrame, labels: DataFrame, cond: DataFrame, *,
               buckets: int, id_col: str, text_col: str,
               ns: tuple[int, ...], features: str = "word",
               cap: int = 256) -> DataFrame:
    """The shared scoring core: one row per (document, label) with the
    exact integer micro-nat log-joint — consumed by the argmax
    (nb_predict) and by the binary margin (nb_margin). ``features``
    must match the fit (word vs char grams)."""
    if features == "char":
        grams = char_gram_buckets(docs, buckets=buckets, id_col=id_col,
                                  text_col=text_col, ns=ns, cap=cap)
    else:
        grams = gram_buckets(docs, buckets=buckets, id_col=id_col,
                             text_col=text_col, ns=ns)
    n_g = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    # only SEEN (label, bucket) pairs carry a delta; the fan-out is the
    # number of labels that saw the bucket, the shuffle key is
    # (doc, label) with map-side combine
    dsum = (grams.join(F.broadcast(cond), "bucket")
            .groupBy(id_col, "label")
            .agg(F.sum("delta_micro").alias("sum_delta")))
    spine = (docs.select(id_col)
             .join(n_g, id_col, "left")
             .withColumn("n_grams", F.coalesce(F.col("n_grams"),
                                               F.lit(0)))
             .crossJoin(F.broadcast(labels)))
    return (spine.join(dsum, [id_col, "label"], "left")
            .withColumn("sum_delta", F.coalesce(F.col("sum_delta"),
                                                F.lit(0)))
            .withColumn("score_micro",
                        F.col("prior_micro")
                        + F.col("n_grams") * F.col("floor_micro")
                        + F.col("sum_delta")))


def nb_predict(docs: DataFrame, labels: DataFrame, cond: DataFrame, *,
               buckets: int = 4096, id_col: str = "doc_id",
               text_col: str = "text",
               ns: tuple[int, ...] = (1, 2), features: str = "word",
               cap: int = 256) -> DataFrame:
    """Score ``docs`` against a fitted model; returns one row per input
    document: ``(id, pred_label, score_micro, n_grams)`` — the argmax
    class, its integer micro-nat log-joint, and the document's gram
    count (0 for empty text → prior-only decision)."""
    scored = _nb_scored(docs, labels, cond, buckets=buckets,
                        id_col=id_col, text_col=text_col, ns=ns,
                        features=features, cap=cap)
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(),
                                           F.col("label"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, F.col("label").alias("pred_label"),
                    "score_micro", "n_grams"))


def nb_margin(docs: DataFrame, labels: DataFrame, cond: DataFrame, *,
              pos_label, buckets: int = 4096, id_col: str = "doc_id",
              text_col: str = "text",
              ns: tuple[int, ...] = (1, 2), features: str = "word",
              cap: int = 256) -> DataFrame:
    """(id, margin_micro): integer log-odds of ``pos_label`` against
    the best OTHER class — the thresholdable score a filter recipe
    sweeps (argmax alone cannot trade precision for recall). Exact
    integer difference of the same micro-nat scores nb_predict ranks,
    so margin >= 0 coincides with the argmax choosing ``pos_label``
    up to the deterministic label tie-break."""
    scored = _nb_scored(docs, labels, cond, buckets=buckets,
                        id_col=id_col, text_col=text_col, ns=ns,
                        features=features, cap=cap)
    pos = F.col("label") == F.lit(pos_label)
    return (scored.groupBy(id_col)
            .agg((F.max(F.when(pos, F.col("score_micro")))
                  - F.max(F.when(~pos, F.col("score_micro"))))
                 .alias("margin_micro")))


def pr_sweep(margins: DataFrame, truth: DataFrame,
             thresholds: list[int], *, pos_label,
             id_col: str = "doc_id",
             label_col: str = "label") -> DataFrame:
    """Precision/recall/F1 at each margin threshold, in ONE aggregate
    pass (K thresholds -> K*4 conditional counters, then an unpivot —
    never K scans): (threshold_micro, tp, fp, fn, tn, precision,
    recall, f1). Zero-denominator cells are pinned to 0.0. This is the
    operating-point table a quality-filter deployment publishes so the
    precision/recall trade is chosen on evidence, not vibes."""
    t = truth.select(F.col(id_col),
                     (F.col(label_col) == F.lit(pos_label)).alias("__pos"))
    j = margins.join(t, id_col)
    aggs = []
    for i, th in enumerate(thresholds):
        p = F.col("margin_micro") >= F.lit(int(th))
        aggs += [
            F.sum((p & F.col("__pos")).cast("long")).alias(f"tp_{i}"),
            F.sum((p & ~F.col("__pos")).cast("long")).alias(f"fp_{i}"),
            F.sum((~p & F.col("__pos")).cast("long")).alias(f"fn_{i}"),
            F.sum((~p & ~F.col("__pos")).cast("long")).alias(f"tn_{i}"),
        ]
    row = j.agg(*aggs)
    stack = ", ".join(
        f"{int(th)}L, tp_{i}, fp_{i}, fn_{i}, tn_{i}"
        for i, th in enumerate(thresholds))
    cells = row.selectExpr(
        f"stack({len(thresholds)}, {stack}) AS "
        "(threshold_micro, tp, fp, fn, tn)")
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.round(F.col("tp") / (F.col("tp") + F.col("fp"))
                          .cast("double"), 6)).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.round(F.col("tp") / (F.col("tp") + F.col("fn"))
                         .cast("double"), 6)).otherwise(F.lit(0.0))
    f1 = F.when((2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
                F.round(2 * F.col("tp")
                        / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
                        .cast("double"), 6)).otherwise(F.lit(0.0))
    return cells.select("threshold_micro", "tp", "fp", "fn", "tn",
                        prec.alias("precision"), rec.alias("recall"),
                        f1.alias("f1"))


def nb_confusion(pred: DataFrame, truth: DataFrame, *,
                 id_col: str = "doc_id",
                 label_col: str = "label") -> DataFrame:
    """(true_label, pred_label, n_docs) confusion counts — the
    held-out evaluation table for a fitted classifier."""
    t = truth.select(F.col(id_col),
                     F.col(label_col).alias("true_label"))
    return (pred.join(t, id_col)
            .groupBy("true_label", "pred_label")
            .agg(F.count("*").alias("n_docs")))


def save_nb_model(labels: DataFrame, cond: DataFrame, path: str) -> None:
    """Persist a fitted model through Spark writers (object-store safe
    — same discipline as IvfIndex/SearchIndex metadata). Both tables
    are small (k and <= k*buckets rows); one file each keeps the load
    cheap."""
    import os
    labels.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "labels"))
    cond.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "cond"))


def load_nb_model(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(labels, cond) back from ``save_nb_model`` output."""
    import os
    return (spark.read.parquet(os.path.join(path, "labels")),
            spark.read.parquet(os.path.join(path, "cond")))


def calibration_bins(margins: DataFrame, truth: DataFrame, *,
                     pos_label, n_bins: int = 10,
                     id_col: str = "doc_id",
                     label_col: str = "label") -> DataFrame:
    """Reliability table for the margin scores (Guo et al. 2017's ECE
    framing; Niculescu-Mizil & Caruana 2005 documented NB's chronic
    over-confidence): ``p = sigmoid(margin)`` quantized ONCE to ppm,
    fixed-width probability bins, per-bin mean predicted probability
    vs empirical positive rate and their |gap| — ``Σ n_b·gap_b / N``
    is the expected calibration error. The table that decides whether
    the margin needs Platt scaling before anyone reads it as a
    probability.

    One join + one (bin) aggregate; every published number is exact
    integer arithmetic over the once-quantized p. Returns (bin,
    n_docs, mean_pred_ppm, pos_rate_ppm, gap_ppm) ordered by bin."""
    width = 1_000_000 // int(n_bins)
    t = truth.select(F.col(id_col),
                     (F.col(label_col) == F.lit(pos_label))
                     .alias("__pos"))
    j = margins.join(t, id_col)
    p_micro = F.round(
        F.lit(1e6) / (F.lit(1.0)
                      + F.exp((-F.col("margin_micro").cast("double"))
                              / F.lit(1e6))), 0).cast("long")
    binned = j.select(p_micro.alias("__p"), "__pos") \
        .withColumn("bin", F.least(F.expr(f"__p div {width}"),
                                   F.lit(int(n_bins) - 1)).cast("long"))
    g = binned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("__p").alias("__sp"),
        F.sum(F.col("__pos").cast("long")).alias("__np"))
    return (g.select(
        "bin", "n_docs",
        F.expr("__sp div n_docs").alias("mean_pred_ppm"),
        F.expr("(__np * 1000000) div n_docs").alias("pos_rate_ppm"))
        .withColumn("gap_ppm",
                    F.abs(F.col("mean_pred_ppm")
                          - F.col("pos_rate_ppm"))))
