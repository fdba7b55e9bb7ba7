"""Deterministic exact-count stratified sampling — the corpus-balancing
step (per-language / per-source quotas) every large-scale training-data
pipeline runs before mixing.

Semantics: within each stratum, keep the ``n`` rows with the smallest
PORTABLE hash rank ``md5(stratum || 0x1f || id)`` — deterministic,
engine-independent (DuckDB computes the identical rank), and unbiased
with respect to any corpus ordering.

Scale design — the naive implementation is
``Window.partitionBy(stratum).orderBy(rank)``: ONE task per stratum, so
a 100-TB corpus with 30 languages sorts 30 multi-TB groups in 30 tasks.
Instead the same two-phase range-partition prefix rank as
``pack.pack_sequences``:

  * ``repartitionByRange((stratum, rank))`` — every stratum occupies a
    contiguous run of bounded partitions, ordered by rank;
  * per-(partition, stratum) counts to the driver — bounded by
    n_partitions + n_strata rows (each partition holds at most one
    partial stratum at each edge), NOT by data size;
  * running per-stratum offsets broadcast back; global rank =
    stratum offset before this partition + within-partition rank, where
    the within-partition window groups on (partition, stratum) — skew
    proof, every window group is bounded by the range-partition size.

The only full-data shuffles are the range partition (it IS the order)
and the window's hash partition on (partition, stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# unit separator — cannot appear in ids/strata, keeps the concat
# collision-free and is expressible in DuckDB as chr(31)
_SEP = "\x1f"


def sample_rank_col(strata_col, id_col):
    """The portable per-row rank key: ``md5(stratum || 0x1f || id)``.
    DuckDB twin: ``md5(stratum || chr(31) || CAST(id AS VARCHAR))``."""
    return F.md5(F.concat_ws(_SEP, strata_col.cast("string"),
                             id_col.cast("string")))


def global_stratum_ranks(df: DataFrame, *, strata_col: str = "lang",
                         id_col: str = "doc_id",
                         partitions: int | None = None,
                         order_col: str | None = None
                         ) -> DataFrame | None:
    """``df`` plus ``__grank`` — the exact 1-based within-stratum rank
    by portable hash (or by ``order_col`` ascending when given) —
    computed with the range-partition prefix-rank scheme (no
    one-task-per-stratum window; bounded driver read). Returns None for
    an empty input. Shared engine for every quota-based sampler below
    plus the score-ordered rankers (lm.ppl_bucket) and the epoch
    shuffle."""
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rk = (F.col(order_col) if order_col is not None
          else sample_rank_col(F.col(strata_col), F.col(id_col)))
    d = (df.withColumn("__rk", rk)
         .repartitionByRange(partitions, strata_col, "__rk", id_col)
         .withColumn("__part", F.spark_partition_id())
         .persist())
    # phase 1: bounded driver read — one row per (partition, stratum)
    # pair that actually co-occurs; ordered running sum per stratum
    counts = (d.groupBy("__part", strata_col).count()
              .orderBy(strata_col, "__part").collect())
    if not counts:
        return None
    offsets, acc, cur = [], 0, None
    for r in counts:
        if r[strata_col] != cur:
            cur, acc = r[strata_col], 0
        offsets.append((r["__part"], r[strata_col], acc))
        acc += r["count"]
    # schema inferred from the values so non-string strata keep their
    # type for the equi-join below
    off_df = (spark.createDataFrame(offsets,
                                    ["__part", strata_col, "__off"])
              .withColumn("__part", F.col("__part").cast("int")))
    # phase 2: within-(partition, stratum) rank + broadcast offset.
    # Range partitioning ordered by (stratum, rank) makes
    # offset + local rank the exact global within-stratum rank.
    w = Window.partitionBy("__part", strata_col).orderBy("__rk", id_col)
    return (d.join(F.broadcast(off_df), ["__part", strata_col])
            .withColumn("__grank", F.col("__off") + F.row_number().over(w))
            .drop("__rk", "__part", "__off"))


def stratified_sample(df: DataFrame, n_per_stratum: int, *,
                      strata_col: str = "lang", id_col: str = "doc_id",
                      partitions: int | None = None,
                      rank_out: str | None = None) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum —
    the ones with the smallest portable hash rank. Columns of ``df``
    pass through unchanged; ``rank_out`` optionally adds the 1-based
    within-stratum rank.

    Deterministic for a given (strata, id) population regardless of row
    order, partitioning or cluster size — the property that makes a
    sampled corpus reproducible across reruns and engine versions.
    """
    ranked = global_stratum_ranks(df, strata_col=strata_col,
                                  id_col=id_col, partitions=partitions)
    if ranked is None:
        return df.filter(F.lit(False))
    out = ranked.filter(F.col("__grank") <= n_per_stratum)
    if rank_out is not None:
        out = out.withColumn(rank_out, F.col("__grank"))
    return out.drop("__grank")


def shuffle_corpus(df: DataFrame, *, seed: int = 0,
                   id_col: str = "doc_id",
                   partitions: int | None = None,
                   pos_out: str = "shuffle_pos") -> DataFrame:
    """Deterministic global epoch shuffle: every row gets ``pos_out`` —
    its 0-based position in the pseudo-random permutation keyed by
    ``md5(seed || 0x1f || id)``. Training pipelines need the corpus in
    a RANDOM but REPRODUCIBLE order (Megatron/GPT-NeoX shuffle the
    sample index per epoch from a seed); a plain ``ORDER BY rand()``
    is neither rerun-stable nor engine-portable.

    The permutation depends only on (id population, seed) — not on row
    order, partitioning, or cluster size — so epoch N's order can be
    re-materialized byte-identically for mid-epoch resume, and a
    different ``seed`` gives an independent permutation for the next
    epoch. Scale: the seed rides the rank engine's stratum slot as a
    constant, so this is one range partition + bounded driver read —
    no single-task global window.

    Typical composition: ``shuffle_corpus(docs, seed=epoch)`` →
    ``pack_sequences`` over the shuffled order → ``write_training_shards``.
    """
    keyed = df.withColumn("__seed", F.lit(str(int(seed))))
    ranked = global_stratum_ranks(keyed, strata_col="__seed",
                                  id_col=id_col, partitions=partitions)
    if ranked is None:
        return df.withColumn(pos_out, F.lit(0).cast("long")) \
                 .filter(F.lit(False))
    return (ranked.withColumn(pos_out, (F.col("__grank") - 1)
                              .cast("long"))
            .drop("__grank", "__seed"))


def temperature_quotas(df: DataFrame, *, alpha: float, total_out: int,
                       strata_col: str = "lang") -> DataFrame:
    """(stratum, __c, __quota): per-stratum output quotas under
    temperature-``alpha`` resampling (mT5 / XLM-R corpus mixing):
    ``p_l = c_l^alpha / sum(c^alpha)``, ``quota_l = round(total_out *
    p_l)``. ``alpha < 1`` flattens the distribution — low-resource
    strata get MORE than their share (upsampled by repetition in
    ``temperature_sample``), high-resource strata are downsampled.

    Cross-engine exactness: ``pow`` is the one libm call, so each
    weight is quantized ONCE to integer micro-units (the dsir.py
    fixed-point discipline); the quota arithmetic after that is
    integer/IEEE-identical in DuckDB."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__c"))
    w = F.round(F.pow(F.col("__c").cast("double"), F.lit(float(alpha)))
                * F.lit(1e6), 0).cast("long")
    ws = counts.select(strata_col, F.col("__c"), w.alias("__w"))
    tot = ws.agg(F.sum("__w").alias("__sw"))
    quota = F.round(F.lit(int(total_out))
                    * ((F.col("__w") * F.lit(1.0)) / F.col("__sw")), 0) \
             .cast("long")
    return (ws.crossJoin(F.broadcast(tot))
            .select(strata_col, "__c", quota.alias("__quota")))


def temperature_sample(df: DataFrame, *, alpha: float, total_out: int,
                       strata_col: str = "lang", id_col: str = "doc_id",
                       partitions: int | None = None,
                       rank_out: str | None = None,
                       copy_out: str = "copy_id") -> DataFrame:
    """Temperature-``alpha`` resampled corpus: each stratum emits
    exactly its quota of rows. Downsampled strata keep their
    ``quota`` lowest-rank rows once; upsampled strata emit EVERY row
    ``quota div c`` times plus one extra copy for the ``quota % c``
    lowest ranks — repetition is how real multilingual mixes upsample
    low-resource languages (mT5). ``copy_out`` numbers the copies from
    1 so downstream shuffles can tell them apart.

    Deterministic in (population, alpha, total_out); strata whose
    quota rounds to 0 vanish (document the mix, don't hide it)."""
    ranked = global_stratum_ranks(df, strata_col=strata_col,
                                  id_col=id_col, partitions=partitions)
    if ranked is None:
        return (df.withColumn(copy_out, F.lit(1))
                .filter(F.lit(False)))
    quotas = temperature_quotas(df, alpha=alpha, total_out=total_out,
                                strata_col=strata_col)
    return _resample_by_quotas(ranked, quotas, strata_col,
                               rank_out=rank_out, copy_out=copy_out)


def _resample_by_quotas(ranked: DataFrame, quotas: DataFrame,
                        strata_col: str, *, rank_out: str | None,
                        copy_out: str) -> DataFrame:
    """Shared resampling core: ``ranked`` carries ``__grank`` (the
    portable within-stratum rank), ``quotas`` carries (stratum, __c,
    __quota). Downsampling keeps the quota lowest ranks once;
    upsampling repeats every row ``quota div c`` times plus one extra
    copy for the ``quota % c`` lowest ranks."""
    base = F.expr("__quota div __c")
    rem = F.col("__quota") % F.col("__c")
    copies = base + F.when(F.col("__grank") <= rem, 1).otherwise(0)
    out = (ranked.join(F.broadcast(quotas), strata_col)
           .withColumn("__copies", copies)
           .filter(F.col("__copies") >= 1)  # before explode: sequence()
                                            # DESCENDS for stop < start
           .withColumn(copy_out,
                       F.explode(F.sequence(F.lit(1), F.col("__copies")))))
    if rank_out is not None:
        out = out.withColumn(rank_out, F.col("__grank"))
    return out.drop("__grank", "__c", "__quota", "__copies")


def quota_sample(df: DataFrame, quotas: dict[str, int], *,
                 strata_col: str = "lang", id_col: str = "doc_id",
                 partitions: int | None = None,
                 rank_out: str | None = None,
                 copy_out: str = "copy_id") -> DataFrame:
    """Resample to EXPLICIT per-stratum quotas — the mixing step when
    the recipe comes from outside the corpus (DoReMi-optimized domain
    weights, The Pile's hand-set epochs-per-source, a product
    requirement), rather than from a temperature formula over the
    counts. Same deterministic engine as ``temperature_sample``:
    downsampled strata keep their quota lowest portable ranks once,
    upsampled strata repeat rows (``copy_out`` numbers the copies).

    Strata absent from ``quotas`` get quota 0 and vanish — the recipe
    defines the mix; quota keys absent from the corpus are ignored.
    """
    if any(int(q) < 0 for q in quotas.values()):
        raise ValueError("quotas must be >= 0")
    ranked = global_stratum_ranks(df, strata_col=strata_col,
                                  id_col=id_col, partitions=partitions)
    if ranked is None:
        return (df.withColumn(copy_out, F.lit(1))
                .filter(F.lit(False)))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__c"))
    pairs = [x for kv in sorted(quotas.items())
             for x in (F.lit(kv[0]), F.lit(int(kv[1])))]
    qmap = F.create_map(*pairs)
    qdf = counts.select(
        strata_col, "__c",
        F.coalesce(qmap[F.col(strata_col).cast("string")],
                   F.lit(0)).cast("long").alias("__quota"))
    return _resample_by_quotas(ranked, qdf, strata_col,
                               rank_out=rank_out, copy_out=copy_out)


def split_thresholds_ppm(weights: dict[str, float]) -> list[tuple[str, int]]:
    """``weights`` (name -> fraction, summing to 1) as cumulative
    integer parts-per-million thresholds in insertion order; the last
    threshold is pinned to exactly 1_000_000 so rounding can never
    leave an unassignable hash residue."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every weight must be > 0")
    names = list(weights)
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        out.append((name, round(cum * 1_000_000)))
    out.append((names[-1], 1_000_000))
    return out


def split_col(id_col, weights: dict[str, float], *, salt: str = "split"):
    """The split-assignment expression: portable 60-bit hash of
    ``salt || 0x1f || id`` mod 1e6 against the cumulative ppm
    thresholds. DuckDB twin of the hash:
    ``('0x' || substr(md5('salt' || chr(31) || id::VARCHAR), 1, 15))
    ::BIGINT % 1000000``."""
    from ocr_engine_spark.functions.text import md5_int60_col
    ppm = F.pmod(md5_int60_col(F.concat_ws(_SEP, F.lit(salt),
                                           id_col.cast("string"))),
                 F.lit(1_000_000))
    thresholds = split_thresholds_ppm(weights)
    expr = F.lit(thresholds[-1][0])
    for name, cum in reversed(thresholds[:-1]):
        expr = F.when(ppm < cum, F.lit(name)).otherwise(expr)
    return expr


def split_corpus(df: DataFrame, weights: dict[str, float], *,
                 id_col: str = "doc_id", salt: str = "split",
                 split_out: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment — every training-data
    pipeline's last step before sharding, and the one place where
    rank-based sampling is the WRONG tool: a doc's split must never
    change when the corpus grows (new crawl snapshot, extra language),
    or yesterday's training docs silently leak into today's eval set.

    Hash-threshold assignment has exactly that stability: the split of
    a given ``id`` depends only on (id, salt, weights), not on the
    rest of the corpus, row order, partitioning, or cluster size.
    Expected (not exact) proportions — the standard trade: exact
    quotas require a global rank, which is what breaks growth
    stability. ``salt`` gives independent re-splits.

    Scale: pure map-side CASE on a hash — zero shuffle, zero UDF,
    whole-stage-codegen'd, pipelined into the scan at any corpus size.
    """
    return df.withColumn(split_out, split_col(F.col(id_col), weights,
                                              salt=salt))


def split_leakage_report(df: DataFrame, weights: dict[str, float], *,
                         id_col: str = "doc_id", text_col: str = "text",
                         salt: str = "split") -> DataFrame:
    """Audit a hash split for EVAL LEAKAGE: content that appears (after
    dedup normalization) in more than one split. Hash splits assign by
    id, so two byte-equal documents with different ids — re-crawls,
    mirrors, boilerplate twins — can land one copy in train and one in
    test, silently inflating eval scores. Decontamination papers (Dodge
    et al. 2021) audit exactly this boundary; every serious pipeline
    runs the check after splitting and before shipping the eval set.

    Returns one row per leaking fingerprint group: the 128-bit content
    fingerprint, the sorted distinct splits it straddles, how many
    documents carry it, and the smallest id (the canonical copy to
    keep; resolve by dropping the others or re-assigning the group).

    Scale: split assignment is map-side (split_corpus), then ONE
    shuffle on the fingerprint with map-side partial aggregation —
    the same shape as exact dedup, because leakage IS exact dedup
    restricted to groups that cross a boundary.
    """
    from ocr_engine_spark.functions.text import fingerprint_col
    s = split_corpus(df, weights, id_col=id_col, salt=salt)
    fp = s.select(F.col(id_col).alias("__id"), "split",
                  fingerprint_col(F.col(text_col)).alias("fp"))
    return (fp.groupBy("fp")
            .agg(F.array_join(F.sort_array(F.collect_set("split")),
                              ",").alias("splits"),
                 F.countDistinct("split").alias("n_splits"),
                 F.count("*").alias("n_docs"),
                 F.min("__id").alias("min_id"))
            .filter(F.col("n_splits") > 1)
            .drop("n_splits"))


# ---------------------------------------------------------------------------
# token-budget mixture allocation (water-filling over domain weights)
# ---------------------------------------------------------------------------


def mixture_allocation(df: DataFrame, weights: dict[str, int],
                       *, strata_col: str = "source",
                       text_col: str = "text",
                       budget_num: int = 1,
                       budget_den: int = 1,
                       max_epochs: int = 1) -> DataFrame:
    """Water-filling allocation of a token budget across strata.

    The mixture step every pretraining pipeline runs after curation
    (The Pile's per-set epochs, DoReMi/FineWeb domain weights): target
    weights ``w_s`` say how the final corpus SHOULD mix, but a stratum
    only has ``c_s`` tokens — scarce strata saturate (take everything)
    and their unmet share re-flows to the rest, i.e. maximize the
    water level ``r`` with ``a_s = min(c_s, r * w_s)`` and
    ``sum(a_s) = budget``. Budget is ``total_tokens * budget_num /
    budget_den`` so the same allocation query is scale-invariant
    across fixture sizes.

    Closed form instead of iteration: sort strata by saturation point
    ``c_s / w_s`` ascending (scaled-integer key, 1e9); the saturated
    set is a PREFIX of that order, found with one window pass —
    stratum k saturates iff ``c_k * W_rest <= R_k * w_k`` where
    ``R_k``/``W_rest`` are budget and weight mass left after the
    strata before it. Unsaturated strata get
    ``floor(R * w_s / W_rest)`` of the post-prefix remainder; a
    ``least(c_s, ...)`` belt keeps degenerate scaled-key ties feasible
    (they can undershoot the budget by the tie's deficit, never
    overshoot).

    Integer contract: pure int64 end-to-end. Bound (documented, not
    silent — the gini lesson): products are ``budget * max_w`` and
    ``c_s * W_total``, so with weights capped at 1e4 ("basis-point
    shares") the math is exact to ~9.2e14 tokens (~4 PB of text);
    rescale weights down for anything larger. Asserted below.

    Scale: one groupBy over the corpus for capacities; everything
    after runs on the |strata|-row table through two ordered windows —
    no per-stratum data shuffles at all.

    ``max_epochs > 1`` allows REPEATED data (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models": repeating up to ~4
    epochs is nearly as good as fresh data): each stratum's ceiling
    becomes ``c_s * max_epochs`` and the output gains ``epochs_ppm =
    allocated * 1e6 div available`` — the per-stratum repetition factor
    the training job must realize. Budget stays a fraction of UNIQUE
    tokens, so budgets above 1x the corpus are expressible. The int64
    bound above divides by ``max_epochs`` accordingly.

    Returns (stratum, available, weight, allocated, saturated
    [, epochs_ppm when max_epochs > 1]).
    """
    max_w = max(weights.values()) if weights else 0
    assert 0 < max_w <= 10_000, \
        "weights are basis-point shares; cap 1e4 keeps int64 exact"
    assert min(weights.values()) >= 0
    assert 1 <= int(max_epochs) <= 100
    wmap = F.create_map(*[F.lit(x) for kv in weights.items()
                          for x in kv])
    caps = (df.groupBy(F.col(strata_col).alias("stratum"))
            .agg(F.sum(F.size(F.split(F.col(text_col), " "))
                       .cast("long")).alias("available")))
    w = F.coalesce(wmap[F.col("stratum")].cast("long"), F.lit(0))
    t = (caps.select("stratum", "available", w.alias("weight"))
         .withColumn("__cap",
                     F.expr(f"available * {int(max_epochs)}")))
    # the strata table is |strata| rows — one-partition windows are the
    # intended plan here, not a scale hazard
    everything = (Window.partitionBy()
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))
    # integer `div` throughout: float '/' then casting rounds in DuckDB
    # but truncates in Spark — div floors identically on both engines
    key = F.expr("CASE WHEN weight > 0 THEN "
                 "(__cap * 1000000000) div weight END")
    ordw = (Window.orderBy(F.asc_nulls_last("__key"), F.col("stratum"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = (t.withColumn("__key", key)
         .withColumn("__W", F.sum("weight").over(everything))
         .withColumn("__tot", F.sum("available").over(everything))
         .withColumn("__B", F.expr(f"(__tot * {int(budget_num)}) "
                                   f"div {int(budget_den)}"))
         .withColumn("__cum_c", F.sum("__cap").over(ordw))
         .withColumn("__cum_w", F.sum("weight").over(ordw)))
    sat_raw = (
        (F.col("weight") > 0)
        & (F.col("__cap") * (F.col("__W") - (F.col("__cum_w")
                                             - F.col("weight")))
           <= (F.col("__B") - (F.col("__cum_c") - F.col("__cap")))
           * F.col("weight")))
    # the saturated set is the longest all-true prefix
    t = (t.withColumn("__sat_raw", sat_raw.cast("int"))
         .withColumn("saturated",
                     (F.min("__sat_raw").over(ordw) == 1)))
    t = (t.withColumn("__S_sat",
                      F.sum(F.when(F.col("saturated"),
                                   F.col("__cap"))
                            .otherwise(F.lit(0))).over(everything))
         .withColumn("__W_sat",
                     F.sum(F.when(F.col("saturated"), F.col("weight"))
                           .otherwise(F.lit(0))).over(everything)))
    rest_share = F.expr(
        "((__B - __S_sat) * weight) div nullif(__W - __W_sat, 0)")
    allocated = F.when(F.col("saturated"), F.col("__cap")) \
                 .otherwise(F.least(F.col("__cap"),
                                    F.coalesce(rest_share, F.lit(0))))
    out = t.select("stratum", "available", "weight",
                   allocated.alias("allocated"), "saturated")
    if int(max_epochs) == 1:
        return out
    return out.withColumn(
        "epochs_ppm",
        F.expr("(allocated * 1000000) div nullif(available, 0)"))


def mixture_take(df: DataFrame, weights: dict[str, int],
                 *, strata_col: str = "source",
                 id_col: str = "doc_id", text_col: str = "text",
                 budget_num: int = 1,
                 budget_den: int = 1) -> DataFrame:
    """Materialize a :func:`mixture_allocation`: within each stratum,
    walk documents in portable-hash order and keep them while the
    tokens taken so far are under the stratum's allocation (greedy
    whole-document knapsack — the last kept doc may overshoot by less
    than its own length, the standard corpus-assembly convention).

    Returns per-stratum realization: (stratum, allocated, n_docs,
    n_tokens) — the audit table a mixture job publishes next to its
    shards.

    Scale note: the per-stratum cumulative sum is a window over
    (stratum, hash-rank); a hot stratum serializes in one task, so for
    100-TB strata swap in the range-partition prefix-sum machinery of
    :func:`global_stratum_ranks` (same contract) — at audit-table
    scale the plain window is the right plan.
    """
    alloc = mixture_allocation(df, weights, strata_col=strata_col,
                               text_col=text_col,
                               budget_num=budget_num,
                               budget_den=budget_den)
    toks = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col).alias("__id"),
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("__n"),
        sample_rank_col(F.col(strata_col), F.col(id_col)).alias("__r"))
    wnd = (Window.partitionBy("stratum").orderBy("__r", "__id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = toks.withColumn("__cum", F.sum("__n").over(wnd))
    picked = (cum.join(F.broadcast(alloc), "stratum")
              .filter(F.col("__cum") - F.col("__n")
                      < F.col("allocated")))
    return (picked.groupBy("stratum")
            .agg(F.min("allocated").alias("allocated"),
                 F.count("*").alias("n_docs"),
                 F.sum("__n").alias("n_tokens")))


def curriculum_order(df: DataFrame, *, score_col: str,
                     id_col: str = "doc_id", n_bins: int = 10,
                     interleave: bool = True,
                     partitions: int | None = None) -> DataFrame:
    """Difficulty-curriculum ordering: exact global rank by
    ``(score asc, id)`` -> ``n_bins`` exact rank-quantile difficulty
    bins -> a total training order.

    ``interleave=False`` is the classic easy-to-hard curriculum
    (Bengio et al. 2009): position = rank - 1.  ``interleave=True``
    round-robins across bins (position = within_bin_rank * n_bins +
    bin) so EVERY training window mixes difficulty levels — the mixed
    curriculum that avoids catastrophic ordering effects when the
    score correlates with domain. Interleaved positions are sparse
    when bins are uneven (a total order, not a dense index);
    re-rank once more if a dense index is needed.

    Scale: ranking reuses the range-partition prefix-rank engine
    (:func:`global_stratum_ranks` with a constant stratum and
    ``order_col`` = the score) — no single-task global window; the
    count joins back as a 1-row broadcast. Bin arithmetic is integer
    (exact quantiles by rank, not approximate percentiles).
    """
    assert 1 <= int(n_bins) <= 10_000
    tagged = df.withColumn("__all", F.lit("_"))
    ranked = global_stratum_ranks(tagged, strata_col="__all",
                                  id_col=id_col, order_col=score_col,
                                  partitions=partitions)
    if ranked is None:
        return (df.withColumn("bin", F.lit(0).cast("long"))
                .withColumn("curriculum_pos", F.lit(0).cast("long"))
                .filter(F.lit(False)))
    n1 = ranked.agg(F.count("*").alias("__n"))
    r = ranked.crossJoin(F.broadcast(n1))
    nb = int(n_bins)
    r = r.withColumn("bin",
                     F.expr(f"((__grank - 1) * {nb}) div __n"))
    # first 0-based rank of bin b is ceil(b * n / n_bins)
    start = F.expr(f"(bin * __n + {nb} - 1) div {nb}")
    within = (F.col("__grank") - 1) - start
    pos = (within * nb + F.col("bin")) if interleave \
        else (F.col("__grank") - 1).cast("long")
    return (r.withColumn("curriculum_pos", pos.cast("long"))
            .drop("__all", "__grank", "__n"))
