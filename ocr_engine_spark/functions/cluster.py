"""Near-dup cluster resolution: pairs -> connected components -> keep-one.

Every dedup family in this engine (MinHash-LSH, SimHash, cosine-LSH)
emits *pairs*; a training-data pipeline has to turn those into dedup
DECISIONS — the reference's keep-one guard motif (A7, ``dropDuplicates``
in SURVEY.md §2.5) lifted from exact groups to near-dup graphs.

``connected_components`` is iterative min-label propagation with
POINTER JUMPING (path compression), the classic MapReduce/Pregel CC
shape (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — the two-phase min-neighbor + label-jump iterate):

  * labels start as each node's own id;
  * each round folds in the minimum label over graph neighbors (one
    shuffle on the edge key) AND then re-reads labels through the label
    itself (``comp' = comp(comp)``) — pointer jumping halves label-chain
    depth every round, so convergence is O(log d) rounds for graph
    diameter d, not O(d) as plain propagation would be;
  * per-round ``localCheckpoint`` truncates lineage (iterative plans
    otherwise grow exponentially); on a real cluster with unreliable
    local storage use ``spark.sparkContext.setCheckpointDir`` + reliable
    ``checkpoint`` instead — same call site, noted below.

Everything is DataFrame joins/aggregates — no driver-side graph, no
RDDs. The only driver values are the per-round changed-row COUNT
(convergence test) and the round counter. Near-dup clusters in web
corpora are overwhelmingly tiny (pairs/stars), so rounds ~ 2-3 in
practice; ``max_iter`` bounds pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from ocr_engine_spark.functions.dedup import minhash_dedup_pairs


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", *,
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id reachable through pair edges.

    Input pairs are treated as undirected edges; duplicates and
    orientation don't matter. Nodes with no pairs are absent from the
    output (they are their own singleton components by definition —
    callers that need them can union them in, ``drop_near_duplicates``
    doesn't because absent == kept).

    Id type is PRESERVED: long doc ids and string ids (urls — the
    streaming near-dedup key) both work; ``min`` is just the ordering's
    least element, so string components label with the
    lexicographically smallest member.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge (a
    component with label-chain depth > 2^max_iter — practically
    unreachable for near-dup graphs).
    """
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = (e.unionByName(e.select(F.col("d").alias("s"),
                                    F.col("s").alias("d")))
             .filter(F.col("s") != F.col("d"))
             .distinct()
             .persist())
    labels = (edges.select(F.col("s").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint())
    for _ in range(max_iter):
        # round part 1: min label over graph neighbors — one shuffle on
        # the edge endpoint, map-side partial min for free
        nbr = (edges.join(labels, edges["d"] == labels["node"])
               .groupBy(F.col("s").alias("node"))
               .agg(F.min("comp").alias("nbr_comp")))
        stepped = (labels.join(nbr, "node", "left")
                   .select("node",
                           F.col("comp").alias("old_comp"),
                           F.least("comp", F.coalesce("nbr_comp", "comp"))
                           .alias("comp")))
        # round part 2: pointer jump — follow the label one hop
        # (comp := comp(comp)); labels are node ids so the self-join
        # always hits. This is what makes long chains collapse in
        # O(log d) rounds.
        lut = stepped.select(F.col("node").alias("comp"),
                             F.col("comp").alias("jump"))
        jumped = (stepped.join(lut, "comp")
                  .select("node", "old_comp", F.col("jump").alias("comp")))
        # localCheckpoint truncates the iterative lineage (reliable
        # `.checkpoint()` on a cluster with a checkpoint dir); the
        # convergence test rides on observe() of the SAME job — one
        # action per round, never a second pass over the labels
        obs = Observation()
        labels = jumped.observe(
            obs, F.sum((F.col("comp") != F.col("old_comp")).cast("long"))
            .alias("changed")).localCheckpoint()
        if not (obs.get["changed"] or 0):
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    edges.unpersist()
    return labels.select("node", "comp").withColumnRenamed("comp",
                                                           "component")


def dedup_decisions(pairs: DataFrame, src: str = "id_a",
                    dst: str = "id_b", *,
                    max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id, keep) — the keep-one-per-cluster resolution
    of a near-dup pair set: ``keep`` is true exactly for the minimum
    doc id of each cluster (the deterministic canonical-representative
    rule; min-id matches the exact-dedup ``keep_id`` convention in
    dedup.exact_duplicate_groups)."""
    comp = connected_components(pairs, src, dst, max_iter=max_iter)
    return comp.select(F.col("node").alias("doc_id"),
                       F.col("component").alias("cluster_id"),
                       (F.col("node") == F.col("component")).alias("keep"))


def representative_decisions(pairs: DataFrame, scores: DataFrame, *,
                             src: str = "id_a", dst: str = "id_b",
                             id_col: str = "doc_id",
                             score_col: str = "score",
                             max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id, score, keep) — keep-BEST-per-cluster: the
    member with the highest ``score_col`` survives, ties broken by
    minimum id. Curation pipelines keep the best document of a
    near-dup cluster (longest, highest quality score, most recent
    crawl), not an arbitrary one; min-id keep (``dedup_decisions``) is
    the deterministic fallback when no quality signal exists.

    ``scores`` is any (id, score) table — quality_score output, text
    length, ppl_bucket rank. Members missing from ``scores`` carry a
    null score and never win unless the whole cluster is score-less
    (then the min id of the cluster wins, degrading gracefully to the
    min-id rule).

    Resolution is two map-side-combined aggregations per cluster (max
    score, then min id among the maximizers) instead of a struct
    argmax: ``max(struct(score, id))`` would tie-break toward the
    LARGEST id, and negating ids to flip the order doesn't exist for
    string ids (urls)."""
    comp = connected_components(pairs, src, dst, max_iter=max_iter)
    m = comp.join(
        scores.select(F.col(id_col).alias("node"),
                      F.col(score_col).alias("score")),
        "node", "left")
    best = m.groupBy("component").agg(F.max("score").alias("__best"))
    winners = (m.join(best, "component")
               # null-safe: an all-null cluster has __best null and
               # every member ties — min id below resolves it
               .filter(F.col("score").eqNullSafe(F.col("__best")))
               .groupBy("component").agg(F.min("node").alias("__keep")))
    return (m.join(winners, "component")
            .select(F.col("node").alias(id_col),
                    F.col("component").alias("cluster_id"),
                    "score",
                    (F.col("node") == F.col("__keep")).alias("keep")))


def drop_near_duplicates(df: DataFrame, *, id_col: str = "doc_id",
                         text_col: str = "text", threshold: float = 0.8,
                         num_perm: int = 64, bands: int = 16,
                         n: int = 3, seed: int = 42,
                         score_col: str | None = None,
                         max_iter: int = 20) -> DataFrame:
    """End-to-end near-dedup: MinHash-LSH pairs -> connected components
    -> drop everything but one doc per cluster: the min-id member by
    default, or the best-``score_col`` member (ties to min id) when a
    quality column of ``df`` is named. Docs with no near-dup pair pass
    through untouched (left-anti join against the loser set only — the
    100 TB corpus never joins against itself)."""
    pairs = minhash_dedup_pairs(df, id_col=id_col, text_col=text_col,
                                threshold=threshold, num_perm=num_perm,
                                bands=bands, n=n, seed=seed)
    if score_col is None:
        decisions = dedup_decisions(pairs, max_iter=max_iter)
    else:
        decisions = representative_decisions(
            pairs, df.select(id_col, score_col), id_col=id_col,
            score_col=score_col, max_iter=max_iter)
    losers = (decisions
              .filter(~F.col("keep"))
              .select(F.col("doc_id").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


def soft_dedup_weights(pairs: DataFrame, corpus: DataFrame, *,
                       id_col: str = "doc_id",
                       max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, weight_micro) — SoftDedup
    reweighting: instead of DROPPING near-duplicates, every member of
    a near-dup cluster of size n trains at sampling weight 1/n, so the
    cluster contributes ONE document's worth of gradient in expectation
    while keeping its intra-cluster variation (He et al., "SoftDedup:
    an Efficient Data Reweighting Method for Speeding Up Language
    Model Pre-training", ACL 2024 — the 'commonness' downweighting
    motif with commonness = near-dup multiplicity). Singletons carry
    weight 1.

    ``weight_micro = 1_000_000 div cluster_size`` — integer micro
    units, exact on both engines (the oracle replays the recursive-CTE
    components + the same div).

    Scale shape: components over the PAIR set only (tiny vs corpus);
    one count shuffle over cluster members; singletons join the member
    table left-anti — the corpus never joins against itself. The
    output is the sampling-weight side input pack_sequences /
    temperature_sample consume."""
    comp = connected_components(pairs, max_iter=max_iter)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    members = (comp.join(sizes, "component")
               .select(F.col("node").alias(id_col),
                       F.col("component").alias("cluster_id"),
                       F.col("cluster_size").cast("long")
                       .alias("cluster_size")))
    singles = (corpus.select(F.col(id_col))
               .join(members.select(id_col), id_col, "left_anti")
               .select(F.col(id_col),
                       F.col(id_col).alias("cluster_id"),
                       F.lit(1).cast("long").alias("cluster_size")))
    return (members.unionByName(singles)
            .withColumn("weight_micro",
                        F.expr("1000000L div cluster_size")))
