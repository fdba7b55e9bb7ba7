"""SemDeDup semantic dedup: clustering + within-cell pairs + keep rule.

The oracle gate (semantic_dedup in __spark_entry__) replays the full
operator in DuckDB; these tests pin the PROPERTIES that make the keep
rule the published one (Abbas et al. 2023): within-cluster-only pairing,
exactly-one-exemplar per duplicate set, lowest-centroid-cosine wins,
untouched pass-through for singletons, and determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.semdedup import (
    semantic_dedup, semantic_dedup_decisions,
)


def _toy(spark):
    """Two tight groups far apart in 4-d, plus one singleton.

    Group A (ids 0,1,2) ~ e0 axis, group B (ids 10,11) ~ e1 axis,
    singleton 20 ~ e2 axis. Explicit centroids on the two axes force
    cells: A -> cell 0, B+20 -> cell 1 (20 pairs with nobody).
    """
    rows = [
        (0, [1.0, 0.02, 0.0, 0.0]),
        (1, [0.98, 0.0, 0.01, 0.0]),
        (2, [1.02, 0.01, 0.0, 0.01]),
        (10, [0.0, 1.0, 0.02, 0.0]),
        (11, [0.01, 0.97, 0.0, 0.0]),
        (20, [0.0, 0.3, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.1, 0.0])]


def test_keep_one_exemplar_per_set(spark):
    dec = semantic_dedup_decisions(_toy(spark), threshold=0.95,
                                   centroids=CENTS).collect()
    by_cluster: dict = {}
    for r in dec:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    # groups A and B each form one duplicate set; 20 is absent
    assert set(by_cluster) == {0, 10}
    assert {r["vec_id"] for r in by_cluster[0]} == {0, 1, 2}
    assert {r["vec_id"] for r in by_cluster[10]} == {10, 11}
    for members in by_cluster.values():
        assert sum(r["keep"] for r in members) == 1


def test_keep_rule_is_lowest_centroid_cosine(spark):
    dec = semantic_dedup_decisions(_toy(spark), threshold=0.95,
                                   centroids=CENTS).collect()
    by_cluster: dict = {}
    for r in dec:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        kept = next(r for r in members if r["keep"])
        expect = min(members,
                     key=lambda r: (r["centroid_cosine"], r["vec_id"]))
        assert kept["vec_id"] == expect["vec_id"]


def test_pairs_are_within_cell_only(spark):
    # 20 has cosine ~0.3 to everything in its cell but A's members are
    # in the OTHER cell — even with threshold 0 low enough to pair
    # everything, cross-cell pairs must never form
    dec = semantic_dedup_decisions(_toy(spark), threshold=0.0,
                                   centroids=CENTS)
    cells = (dec.groupBy("cluster_id")
             .agg(F.countDistinct("cell").alias("n_cells")).collect())
    assert cells and all(r["n_cells"] == 1 for r in cells)


def test_singletons_pass_through_untouched(spark):
    df = _toy(spark)
    kept = semantic_dedup(df, threshold=0.95, n_centroids=2,
                          refine_iters=0)
    # toy: hash-sampled centroids; whatever the clustering, 20 pairs
    # with nobody at 0.95 and must survive
    assert kept.filter(F.col("vec_id") == 20).count() == 1
    # exactly one survivor per duplicate set + the singleton
    dec = semantic_dedup_decisions(df, threshold=0.95, n_centroids=2,
                                   refine_iters=0)
    n_clusters = dec.select("cluster_id").distinct().count()
    n_losers = dec.filter(~F.col("keep")).count()
    assert kept.count() == df.count() - n_losers
    assert dec.count() == n_clusters + n_losers


def test_deterministic_across_runs(spark):
    df = _toy(spark)
    a = sorted(map(tuple, semantic_dedup_decisions(
        df, threshold=0.9, n_centroids=2, refine_iters=2).collect()))
    b = sorted(map(tuple, semantic_dedup_decisions(
        df, threshold=0.9, n_centroids=2, refine_iters=2).collect()))
    assert a == b


def test_copy_corpus_end_to_end(spark):
    # every same-cell +0.01-shift copy pair must resolve to one kept
    emb = (spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 150))
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01))
         .alias("embedding"))
    doubled = emb.select("vec_id", "embedding").unionByName(shifted)
    dec = semantic_dedup_decisions(doubled, n_centroids=4, threshold=0.95)
    rows = dec.collect()
    assert rows, "no duplicate sets found"
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        assert sum(r["keep"] for r in members) == 1
    # copy pairs are (i, i+1M): clusters of exactly that shape dominate
    pair_like = sum(
        1 for ms in by_cluster.values()
        if len(ms) == 2
        and abs(ms[0]["vec_id"] - ms[1]["vec_id"]) == 1_000_000)
    assert pair_like >= 0.8 * len(by_cluster)
    kept = semantic_dedup(doubled, n_centroids=4, threshold=0.95)
    assert kept.count() == doubled.count() - sum(
        1 for r in rows if not r["keep"])


def test_rejects_sparse_cell_ids(spark):
    with pytest.raises(AssertionError):
        semantic_dedup_decisions(
            _toy(spark), centroids=[(0, [1.0, 0, 0, 0]),
                                    (5, [0.0, 1, 0, 0])])


def test_within_cell_pairing_is_equi_join(spark):
    """Scale shape: pairing must be ONE equi-join shuffle on cell —
    never a cartesian/nested-loop join over the corpus."""
    from ocr_engine_spark.functions.semdedup import within_cell_pairs
    scored = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 1.0], 1)],
        "id long, v array<double>, cell int")
    pairs = within_cell_pairs(scored, 0.5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # equi-join on cell survived optimization


def test_hot_cell_guard_bounds_candidate_pairs(spark):
    """Planted hot cell: 60 rows land in one k-means cell. Unguarded,
    the pair join emits 60*59/2 = 1770 candidates; with
    max_cell_rows=10 the secondary-hash re-split must cap the
    candidate count near 6 sub-cells' worth (~sum ni*(ni-1)/2 with
    ni ~ 10) — the skew guard the round-3 verdict required."""
    from ocr_engine_spark.functions.semdedup import within_cell_pairs
    rows = [(i, [1.0, float(i) * 1e-6], 0) for i in range(60)]
    rows += [(100 + i, [0.0, 1.0 + i * 1e-6], 1) for i in range(5)]
    scored = spark.createDataFrame(
        rows, "id long, v array<double>, cell int")
    # threshold -1.0: count raw CANDIDATES, not survivors
    unguarded = within_cell_pairs(scored, -1.0).count()
    assert unguarded == 60 * 59 // 2 + 5 * 4 // 2
    guarded = within_cell_pairs(scored, -1.0, max_cell_rows=10).count()
    # 6 sub-cells of ~10 rows: expectation ~6*45=270; even a lopsided
    # hash split stays far under the quadratic 1770. The small cell
    # (5 <= bound) must NOT be split: its 10 pairs all survive.
    assert guarded < unguarded / 3
    small_cell_pairs = within_cell_pairs(
        scored.filter(F.col("cell") == 1), -1.0,
        max_cell_rows=10).count()
    assert small_cell_pairs == 10


def test_hot_cell_guard_deterministic_and_within_subcell(spark):
    """Guarded decisions replay identically across runs, and every
    emitted pair shares a sub-cell (xxhash64(id) % n_sub)."""
    from ocr_engine_spark.functions.semdedup import within_cell_pairs
    rows = [(i, [1.0, 0.0], 0) for i in range(30)]
    scored = spark.createDataFrame(
        rows, "id long, v array<double>, cell int")
    a = sorted((r.id_a, r.id_b) for r in
               within_cell_pairs(scored, 0.99,
                                 max_cell_rows=8).collect())
    b = sorted((r.id_a, r.id_b) for r in
               within_cell_pairs(scored, 0.99,
                                 max_cell_rows=8).collect())
    assert a == b and len(a) > 0
    # n=30, bound=8 -> ceil(30/8)=4 sub-cells; verify the hash rule
    df = spark.createDataFrame([(i,) for i in range(30)], "id long")
    sub = {r.id: r.s for r in df.select(
        "id", F.pmod(F.xxhash64(F.col("id")), F.lit(4)).alias("s"))
        .collect()}
    for ia, ib in a:
        assert sub[ia] == sub[ib]


def test_semantic_dedup_guarded_end_to_end(spark):
    """End-to-end with the guard on: exact-duplicate vectors that the
    hash happens to co-locate still collapse; output is a valid
    dedup (kept ids unique, no survivors above threshold lost from
    BOTH sides of a sub-cell)."""
    base = [float(x) for x in (1.0, 0.0, 0.0, 0.0)]
    other = [float(x) for x in (0.0, 1.0, 0.0, 0.0)]
    rows = [(i, base) for i in range(12)] + [(100, other)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(emb, n_centroids=2, threshold=0.95,
                          refine_iters=0, max_cell_rows=4)
    n = kept.count()
    # the 12 identical vectors keep ONE exemplar per (cell, sub-cell)
    # group (recall trade documented): with <=2 k-means cells and
    # ceil-split bound 4 that's at most 2*3 exemplars, far below 12;
    # the singleton always survives
    assert 1 + 1 <= n <= 6 + 1
    assert kept.select("vec_id").distinct().count() == n


def test_hot_cell_guard_recall_and_candidate_bound(spark):
    """Pin the documented hot-cell trade NUMERICALLY: at a forced
    250-row hot cell with 50 planted exact-duplicate pairs, the
    max_cell_rows=50 sub-split must (a) cut the candidate-pair count
    by >3x and (b) still recover at least the hash-collision floor of
    planted pairs (a pair survives iff both ids land in the same
    xxhash64 sub-cell, ~1/n_sub in expectation; deterministic here)."""
    import math

    from ocr_engine_spark.functions.semdedup import within_cell_pairs

    rows = []
    # 150 noise vectors: unit circle in (x, y) 0.1 rad apart with
    # z=+1 — the worst same-sign pair is 0.017 rad apart after the
    # circle wraps (i, i+63), cosine (cos 0.017 + 1)/2 ~ 0.999928,
    # still under the 0.99995 threshold
    for i in range(150):
        th = 0.1 * i
        rows.append((i, [math.cos(th), math.sin(th), 1.0], 0))
    # 50 planted duplicate pairs (id, id+10000) with z=-1: noise vs
    # planted cosine is <= 0, planted vs planted distinct pairs top
    # out at (cos 0.1 + 1)/2 ~ 0.9975; only exact dups reach 1.0
    for j in range(50):
        th = 0.1 * j
        v = [math.cos(th), math.sin(th), -1.0]
        rows.append((1000 + j, v, 0))
        rows.append((11000 + j, v, 0))
    scored = spark.createDataFrame(
        rows, "id long, v array<double>, cell int")

    def planted(df):
        return {(r.id_a, r.id_b) for r in df.collect()
                if r.id_b == r.id_a + 10000}

    full = within_cell_pairs(scored, 0.99995)
    assert planted(full) == {(1000 + j, 11000 + j) for j in range(50)}

    guarded = within_cell_pairs(scored, 0.99995, max_cell_rows=50)
    got = planted(guarded)
    recall = len(got) / 50.0
    # expectation 1/5 at n_sub=5; deterministic for xxhash64 —
    # pinned floor well under expectation, strictly positive
    assert recall >= 0.08, recall
    # nothing outside the planted set can pass the threshold
    assert {(r.id_a, r.id_b) for r in guarded.collect()} == got

    # candidate bound: all-pairs (threshold -1) counts the actual
    # join fan-out. Unguarded = C(250,2); guarded sums C(n_s,2) over
    # ~5 sub-cells of ~50 rows
    n_unguarded = within_cell_pairs(scored, -1.0).count()
    assert n_unguarded == 250 * 249 // 2
    n_guarded = within_cell_pairs(scored, -1.0, max_cell_rows=50).count()
    assert n_guarded < n_unguarded / 3, (n_guarded, n_unguarded)
