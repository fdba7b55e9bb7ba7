r"""LM-perplexity quality filtering — the CCNet recipe (Wenzek et al.,
LREC 2020, arXiv:1911.00359): score every document's perplexity under a
language model trained on a small CLEAN reference corpus (CCNet uses a
KenLM 5-gram on Wikipedia), then split the corpus into head / middle /
tail perplexity buckets; training mixes prefer head+middle.

Re-expressed Spark-first with the repo's portability discipline:

  * the LM is a hashed-vocabulary add-alpha bigram model — context and
    word tokens hash into ``buckets`` slots via the repo-wide portable
    60-bit md5 hash, so DuckDB replays every count and every score
    (a KenLM binary would be an opaque, unverifiable side input);
  * every per-bigram log probability is quantized ONCE to integer
    micro-nats (the dsir.py fixed-point rule) so per-doc sums are exact
    64-bit arithmetic in any engine / summation order;
  * the head/middle/tail cut is by exact GLOBAL RANK of the score, not
    by approximate percentile — reusing sample.global_stratum_ranks'
    range-partition prefix-rank engine (bounded driver read, no
    single-task global window), with integer-percent cutoffs
    (``(N * head_pct) div 100``) so the boundary is engine-exact.

Plan shape at 100 TB:

  * the reference corpus is small by construction (CCNet: Wikipedia) —
    both count tables are built once and BROADCAST; scoring the corpus
    is map-side joins + one (doc_id, partial-sum) shuffle with map-side
    combine;
  * the bucket cut is one range partition by score + a bounded
    per-(partition) count read — the same machinery already proven for
    stratified sampling and sequence packing.

Per-doc scores are mean negative log-likelihood per bigram in
micro-nats — exactly ``ln(perplexity) * 1e6`` under the bigram model —
monotone in perplexity, so ranking/bucketing on it is ranking on
perplexity without ever leaving integer space.

Documents with fewer than two tokens have no bigrams and no perplexity;
they are absent from the scored output (CCNet likewise drops
empty/degenerate docs before LM scoring) — callers wanting them must
anti-join and route them to ``tail`` explicitly.

Reference parity: the reference repo has no corpus-quality stage (it
serves per-request OCR); this operator belongs to the LLM-training-data
layer the graft adds (SURVEY §2 extension), alongside dsir/decontam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_engine_spark.functions.decontam import word_tokens_col
from ocr_engine_spark.functions.text import md5_int60_col

MICRO = 1e6  # fixed-point scale: integer micro-nats (dsir.MICRO twin)


def bigram_pairs(df: DataFrame, *, buckets: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One (id, cb, wb) row per bigram occurrence: context bucket and
    word bucket under the portable 60-bit hash. Pure map-side —
    tokenize once (materialized column: HOFs never codegen, see
    functions/text.py), zip the token array against its own shift,
    explode. DuckDB twin zips two ``unnest``s of ``t[1:n-1]`` /
    ``t[2:n]`` in one SELECT."""
    toks = df.select(F.col(id_col),
                     word_tokens_col(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    pairs = F.when(n >= 2, F.arrays_zip(
        F.slice("__t", 1, n - 1).alias("c"),
        F.slice("__t", 2, n - 1).alias("w"))
    ).otherwise(F.array().cast("array<struct<c:string,w:string>>"))
    return (toks.select(id_col, F.explode(pairs).alias("__p"))
            .select(id_col,
                    (md5_int60_col(F.col("__p.c")) % F.lit(buckets))
                    .alias("cb"),
                    (md5_int60_col(F.col("__p.w")) % F.lit(buckets))
                    .alias("wb")))


def fit_bigram_lm(reference: DataFrame, *, buckets: int,
                  id_col: str = "doc_id", text_col: str = "text"
                  ) -> tuple[DataFrame, DataFrame]:
    """(ctx_counts, big_counts): ``(cb, c_ctx)`` context-occurrence
    counts and ``(cb, wb, c_big)`` bigram counts over the reference
    corpus. Both are bounded by the reference's gram volume (small by
    construction) and enter scoring as broadcast build sides."""
    pairs = bigram_pairs(reference, buckets=buckets, id_col=id_col,
                         text_col=text_col)
    ctx = pairs.groupBy("cb").agg(F.count("*").alias("c_ctx"))
    big = pairs.groupBy("cb", "wb").agg(F.count("*").alias("c_big"))
    return ctx, big


def doc_log_ppl(docs: DataFrame, ctx_counts: DataFrame,
                big_counts: DataFrame, *, buckets: int,
                alpha: float = 1.0, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, nll_micro, log_ppl_micro) per document with
    >= 1 bigram. ``log_ppl_micro = nll_micro div n_bigrams`` — mean
    negative log-likelihood per bigram in integer micro-nats, i.e.
    ``ln(perplexity) * 1e6``. Add-alpha smoothing:
    ``p(w|c) = (c_big + alpha) / (c_ctx + alpha * buckets)`` with
    counts coalesced to 0 for grams unseen in the reference; p <= 1
    always (c_big <= c_ctx), so every per-gram term is >= 0."""
    pairs = bigram_pairs(docs, buckets=buckets, id_col=id_col,
                         text_col=text_col)
    joined = (pairs
              .join(F.broadcast(big_counts), ["cb", "wb"], "left")
              .join(F.broadcast(ctx_counts), ["cb"], "left")
              .withColumn("c_big", F.coalesce(F.col("c_big"), F.lit(0)))
              .withColumn("c_ctx", F.coalesce(F.col("c_ctx"), F.lit(0))))
    alpha_v = alpha * buckets  # python-folded literal, same in SQL twin
    p = (F.col("c_big") + F.lit(alpha)) / (F.col("c_ctx") + F.lit(alpha_v))
    lp_micro = F.round(F.log(p) * F.lit(MICRO), 0).cast("long")
    return (joined.withColumn("__lp", lp_micro)
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 (-F.sum("__lp")).alias("nll_micro"))
            .withColumn("log_ppl_micro",
                        F.expr("nll_micro div n_bigrams")))


def ppl_bucket(docs: DataFrame, reference: DataFrame, *,
               buckets: int = 4096, alpha: float = 1.0,
               head_pct: int = 30, middle_pct: int = 40,
               id_col: str = "doc_id", text_col: str = "text",
               partitions: int | None = None) -> DataFrame:
    """CCNet head/middle/tail split: fit the bigram LM on ``reference``,
    score ``docs``, rank ascending by ``(log_ppl_micro, id)`` with the
    range-partition rank engine, and cut at integer-percent boundaries
    — ``head`` = ranks 1..(N*head_pct div 100), ``middle`` the next
    ``middle_pct`` percent, ``tail`` the rest. Returns (id, n_bigrams,
    log_ppl_micro, ppl_rank, bucket), deterministic in (corpus,
    reference, buckets, alpha, pcts)."""
    from ocr_engine_spark.functions.sample import global_stratum_ranks
    ctx, big = fit_bigram_lm(reference, buckets=buckets, id_col=id_col,
                             text_col=text_col)
    scored = doc_log_ppl(docs, ctx, big, buckets=buckets, alpha=alpha,
                         id_col=id_col, text_col=text_col)
    ranked = global_stratum_ranks(
        scored.withColumn("__all", F.lit("all")),
        strata_col="__all", id_col=id_col, partitions=partitions,
        order_col="log_ppl_micro")
    if ranked is None:
        return (scored.withColumn("ppl_rank", F.lit(0).cast("long"))
                .withColumn("bucket", F.lit(""))
                .filter(F.lit(False)))
    # scalar N rides a 1-row broadcast cross join — one lazy plan
    total = scored.agg(F.count("*").alias("__n"))
    head_n = F.expr(f"(__n * {int(head_pct)}) div 100")
    mid_n = F.expr(f"(__n * {int(head_pct) + int(middle_pct)}) div 100")
    bucket = (F.when(F.col("__grank") <= head_n, F.lit("head"))
              .when(F.col("__grank") <= mid_n, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (ranked.crossJoin(F.broadcast(total))
            .withColumn("ppl_rank", F.col("__grank").cast("long"))
            .withColumn("bucket", bucket)
            .drop("__grank", "__all", "__n"))


def fit_kn_bigram_lm(reference: DataFrame, *, buckets: int,
                     id_col: str = "doc_id", text_col: str = "text"
                     ) -> tuple[DataFrame, DataFrame, DataFrame,
                                DataFrame]:
    """Interpolated Kneser-Ney statistics (Kneser & Ney 1995; Chen &
    Goodman 1998 — the smoothing KenLM itself uses, here on the hashed
    bucket basis): returns ``(big, ctx, n1w, scalars)`` where

      * ``big``     = (cb, wb, c_big) bigram counts;
      * ``ctx``     = (cb, c_ctx, n1c): context totals and the number
        of DISTINCT bucket types following cb (N1+(cb·));
      * ``n1w``     = (wb, n1w): distinct contexts preceding wb
        (N1+(·wb) — the continuation count that makes KN score a word
        by how many contexts it completes, not how often it occurs);
      * ``scalars`` = 1 row (nb, n1, n2): distinct bigram types and
        the count-of-counts feeding the Ney-Essen-Kneser discount
        ``D = n1 / (n1 + 2·n2)``.

    Everything derives from ONE pass over the reference's bigram
    table; all four outputs are bounded by reference gram volume and
    broadcast into scoring."""
    pairs = bigram_pairs(reference, buckets=buckets, id_col=id_col,
                         text_col=text_col)
    big = pairs.groupBy("cb", "wb").agg(F.count("*").alias("c_big"))
    ctx = big.groupBy("cb").agg(F.sum("c_big").alias("c_ctx"),
                                F.count("*").alias("n1c"))
    n1w = big.groupBy("wb").agg(F.count("*").alias("n1w"))
    scalars = big.agg(
        F.count("*").alias("nb"),
        F.sum((F.col("c_big") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c_big") == 2).cast("long")).alias("n2"))
    return big, ctx, n1w, scalars


def doc_log_ppl_kn(docs: DataFrame, big: DataFrame, ctx: DataFrame,
                   n1w: DataFrame, scalars: DataFrame, *, buckets: int,
                   id_col: str = "doc_id", text_col: str = "text"
                   ) -> DataFrame:
    """(id, n_bigrams, nll_micro, log_ppl_micro) under interpolated
    Kneser-Ney:

      ``p(w|c) = (max(c(c,w) - D, 0) + D · N1+(c·) · Pcont(w)) / c(c·)``
      ``Pcont(w) = N1+(·w) / nb``, floored at ``1/(nb + buckets)`` for
      words completing no reference context; contexts with ``c(c·)=0``
      back off to ``Pcont(w)`` alone.

    Portability: D, Pcont and p are each ONE double expression over
    exact int64 counts (the n-row scalar rides a broadcast cross
    join — never a Python literal, so both engines derive it from the
    same integers), ln() is quantized ONCE to micro-nats, per-doc sums
    are exact integers. The interpolation term can push p marginally
    above 1 for pathological contexts (documented Chen-Goodman
    artifact of flooring Pcont), so single-gram lp may be slightly
    positive — scores remain a valid ranking signal.

    Plan: three broadcast joins + one 1-row cross join + one
    (doc, partial-sum) shuffle with map-side combine — identical shape
    to the add-alpha scorer."""
    pairs = bigram_pairs(docs, buckets=buckets, id_col=id_col,
                         text_col=text_col)
    joined = (pairs
              .join(F.broadcast(big), ["cb", "wb"], "left")
              .join(F.broadcast(ctx), ["cb"], "left")
              .join(F.broadcast(n1w), ["wb"], "left")
              .crossJoin(F.broadcast(scalars))
              .withColumn("c_big", F.coalesce(F.col("c_big"), F.lit(0)))
              .withColumn("c_ctx", F.coalesce(F.col("c_ctx"), F.lit(0)))
              .withColumn("n1c", F.coalesce(F.col("n1c"), F.lit(0)))
              .withColumn("n1w", F.coalesce(F.col("n1w"), F.lit(0))))
    d = F.when(F.col("n1") + 2 * F.col("n2") == 0, F.lit(0.5)) \
         .otherwise(F.col("n1").cast("double")
                    / (F.col("n1") + 2 * F.col("n2")).cast("double"))
    pcont = F.when(F.col("n1w") > 0,
                   F.col("n1w").cast("double")
                   / F.col("nb").cast("double")) \
             .otherwise(F.lit(1.0)
                        / (F.col("nb") + F.lit(buckets)).cast("double"))
    p = F.when(
        F.col("c_ctx") > 0,
        (F.greatest(F.col("c_big").cast("double") - d, F.lit(0.0))
         + d * F.col("n1c").cast("double") * pcont)
        / F.col("c_ctx").cast("double")) \
        .otherwise(pcont)
    lp_micro = F.round(F.log(p) * F.lit(MICRO), 0).cast("long")
    return (joined.withColumn("__lp", lp_micro)
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 (-F.sum("__lp")).alias("nll_micro"))
            .withColumn("log_ppl_micro",
                        F.expr("nll_micro div n_bigrams")))


def trigram_triples(df: DataFrame, *, buckets: int,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One (id, ub, vb, wb) row per trigram occurrence under the
    portable hash — the order-3 sibling of ``bigram_pairs`` (same
    materialize-then-zip discipline; docs under 3 tokens contribute
    nothing)."""
    toks = df.select(F.col(id_col),
                     word_tokens_col(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    trips = F.when(n >= 3, F.arrays_zip(
        F.slice("__t", 1, n - 2).alias("u"),
        F.slice("__t", 2, n - 2).alias("v"),
        F.slice("__t", 3, n - 2).alias("w"))
    ).otherwise(F.array().cast(
        "array<struct<u:string,v:string,w:string>>"))
    return (toks.select(id_col, F.explode(trips).alias("__p"))
            .select(id_col,
                    (md5_int60_col(F.col("__p.u")) % F.lit(buckets))
                    .alias("ub"),
                    (md5_int60_col(F.col("__p.v")) % F.lit(buckets))
                    .alias("vb"),
                    (md5_int60_col(F.col("__p.w")) % F.lit(buckets))
                    .alias("wb")))


def fit_kn_trigram_lm(reference: DataFrame, *, buckets: int,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> dict[str, DataFrame]:
    """Full interpolated Kneser-Ney order-3 statistics (Chen &
    Goodman 1998 §4.1.6 — lower orders use CONTINUATION counts, not
    raw counts): returns a dict of broadcastable tables

      * ``tri``   (ub, vb, wb, c3): raw trigram counts;
      * ``tctx``  (ub, vb, c3tot, n13): trigram context totals and
        N1+(uv·);
      * ``cont2`` (vb, wb, c2h): continuation bigram counts
        N1+(·vw) — how many left contexts the bigram completes;
      * ``c2ctx`` (vb, c2tot, n12): continuation-context totals and
        N1+(v·) over the continuation table;
      * ``cont1`` (wb, c1h): N1+ (·w) over continuation bigrams;
      * ``sca``   1 row (nb2, n1_3, n2_3, n1_2, n2_2): distinct
        continuation-bigram types and both levels' count-of-counts
        feeding D3 = n1_3/(n1_3+2·n2_3), D2 = n1_2/(n1_2+2·n2_2).

    Everything flows from ONE trigram-table pass; all outputs are
    reference-bounded broadcast sides."""
    trips = trigram_triples(reference, buckets=buckets, id_col=id_col,
                            text_col=text_col)
    tri = trips.groupBy("ub", "vb", "wb").agg(F.count("*").alias("c3"))
    tctx = tri.groupBy("ub", "vb").agg(F.sum("c3").alias("c3tot"),
                                       F.count("*").alias("n13"))
    cont2 = tri.groupBy("vb", "wb").agg(F.count("*").alias("c2h"))
    c2ctx = cont2.groupBy("vb").agg(F.sum("c2h").alias("c2tot"),
                                    F.count("*").alias("n12"))
    cont1 = cont2.groupBy("wb").agg(F.count("*").alias("c1h"))
    sca = (tri.agg(
        F.sum((F.col("c3") == 1).cast("long")).alias("n1_3"),
        F.sum((F.col("c3") == 2).cast("long")).alias("n2_3"))
        .crossJoin(cont2.agg(
            F.count("*").alias("nb2"),
            F.sum((F.col("c2h") == 1).cast("long")).alias("n1_2"),
            F.sum((F.col("c2h") == 2).cast("long")).alias("n2_2"))))
    return {"tri": tri, "tctx": tctx, "cont2": cont2, "c2ctx": c2ctx,
            "cont1": cont1, "sca": sca}


def doc_log_ppl_kn3(docs: DataFrame, model: dict[str, DataFrame], *,
                    buckets: int, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_trigrams, nll_micro, log_ppl_micro) under interpolated
    order-3 Kneser-Ney with the continuation-count backoff chain:

      p1(w)      = c1h/nb2, floored at 1/(nb2+buckets);
      p2(w|v)    = (max(c2h-D2,0) + D2·N1+(v·)·p1(w)) / c2tot(v),
                   backing fully to p1 when v completes nothing;
      p3(w|u,v)  = (max(c3-D3,0) + D3·N1+(uv·)·p2(w|v)) / c3tot(u,v),
                   backing fully to p2 when (u,v) is unseen.

    Same portability contract as the bigram scorer: D2/D3/p1/p2/p3
    are single double expressions over exact int64 counts riding a
    broadcast 1-row cross join; ln() quantizes once; per-doc sums are
    exact integers. Plan: five broadcast joins + one 1-row cross join
    + one (doc, partial-sum) shuffle."""
    trips = trigram_triples(docs, buckets=buckets, id_col=id_col,
                            text_col=text_col)
    j = (trips
         .join(F.broadcast(model["tri"]), ["ub", "vb", "wb"], "left")
         .join(F.broadcast(model["tctx"]), ["ub", "vb"], "left")
         .join(F.broadcast(model["cont2"]), ["vb", "wb"], "left")
         .join(F.broadcast(model["c2ctx"]), ["vb"], "left")
         .join(F.broadcast(model["cont1"]), ["wb"], "left")
         .crossJoin(F.broadcast(model["sca"])))
    for c in ("c3", "c3tot", "n13", "c2h", "c2tot", "n12", "c1h"):
        j = j.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    d3 = F.when(F.col("n1_3") + 2 * F.col("n2_3") == 0, F.lit(0.5)) \
          .otherwise(F.col("n1_3").cast("double")
                     / (F.col("n1_3") + 2 * F.col("n2_3"))
                     .cast("double"))
    d2 = F.when(F.col("n1_2") + 2 * F.col("n2_2") == 0, F.lit(0.5)) \
          .otherwise(F.col("n1_2").cast("double")
                     / (F.col("n1_2") + 2 * F.col("n2_2"))
                     .cast("double"))
    p1 = F.when(F.col("c1h") > 0,
                F.col("c1h").cast("double")
                / F.col("nb2").cast("double")) \
          .otherwise(F.lit(1.0)
                     / (F.col("nb2") + F.lit(buckets)).cast("double"))
    p2 = F.when(
        F.col("c2tot") > 0,
        (F.greatest(F.col("c2h").cast("double") - d2, F.lit(0.0))
         + d2 * F.col("n12").cast("double") * p1)
        / F.col("c2tot").cast("double")) \
        .otherwise(p1)
    p3 = F.when(
        F.col("c3tot") > 0,
        (F.greatest(F.col("c3").cast("double") - d3, F.lit(0.0))
         + d3 * F.col("n13").cast("double") * p2)
        / F.col("c3tot").cast("double")) \
        .otherwise(p2)
    lp_micro = F.round(F.log(p3) * F.lit(MICRO), 0).cast("long")
    return (j.withColumn("__lp", lp_micro)
            .groupBy(id_col)
            .agg(F.count("*").alias("n_trigrams"),
                 (-F.sum("__lp")).alias("nll_micro"))
            .withColumn("log_ppl_micro",
                        F.expr("nll_micro div n_trigrams")))
