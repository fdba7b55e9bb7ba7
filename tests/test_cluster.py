"""Near-dup cluster resolution: pairs -> connected components ->
keep-one decisions (VERDICT r02 #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.cluster import (
    connected_components, dedup_decisions, drop_near_duplicates,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_topology_single_cluster(spark):
    # a-b, b-c, c-d must collapse into ONE cluster labelled min id
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_clusters_and_orientation(spark):
    # orientation and duplicate edges don't matter
    comp = connected_components(
        _pairs(spark, [(5, 2), (2, 5), (2, 9), (40, 30), (30, 40)]))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {2: 2, 5: 2, 9: 2, 30: 30, 40: 30}


def test_long_path_converges_logarithmically(spark):
    # 64-node path graph: plain min propagation needs ~63 rounds;
    # pointer jumping must land it comfortably inside max_iter=10
    comp = connected_components(
        _pairs(spark, [(i, i + 1) for i in range(63)]), max_iter=10)
    rows = comp.collect()
    assert len(rows) == 64
    assert {r["component"] for r in rows} == {0}


def test_empty_pairs(spark):
    comp = connected_components(
        _pairs(spark, []).filter(F.lit(False)))
    assert comp.count() == 0


def test_dedup_decisions_keep_min(spark):
    dec = dedup_decisions(_pairs(spark, [(7, 3), (3, 11), (20, 21)]))
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dec.collect()}
    assert got == {3: (3, True), 7: (3, False), 11: (3, False),
                   20: (20, True), 21: (20, False)}


def test_drop_near_duplicates_end_to_end(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again "
            "every single day of the long week"),
        (2, "completely different content about spark shuffle partitions "
            "and broadcast joins at terabyte scale"),
        (3, "a third unique document mentioning iceberg snapshots and "
            "parquet row groups and bloom filters"),
    ]
    # near-copies of doc 1 and 2 (one trailing token changed)
    dups = [(101, base[0][1] + " extra"), (102, base[1][1] + " extra")]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    kept = drop_near_duplicates(df, threshold=0.5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {1, 2, 3}
    # idempotent: deduping the deduped corpus is a no-op (A7 guard)
    again = drop_near_duplicates(kept, threshold=0.5)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} \
        == kept_ids


def test_drop_near_duplicates_passes_unique_docs(spark):
    df = spark.createDataFrame(
        [(i, f"unique document number {i} with entirely distinct words "
             f"token{i}a token{i}b token{i}c token{i}d") for i in range(8)],
        "doc_id long, text string")
    assert drop_near_duplicates(df, threshold=0.5).count() == 8


def test_string_ids_preserved(spark):
    """Url-keyed pair sets (the streaming near-dedup id type) must
    cluster without casts: min label = lexicographically smallest url."""
    comp = connected_components(spark.createDataFrame(
        [("https://b.com/x", "https://a.com/y"),
         ("https://a.com/y", "https://c.com/z"),
         ("https://q.com/1", "https://p.com/2")],
        "id_a string, id_b string"))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {
        "https://a.com/y": "https://a.com/y",
        "https://b.com/x": "https://a.com/y",
        "https://c.com/z": "https://a.com/y",
        "https://p.com/2": "https://p.com/2",
        "https://q.com/1": "https://p.com/2"}


def test_representative_decisions_keep_best(spark):
    from ocr_engine_spark.functions.cluster import representative_decisions
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (10, 4.0), (11, 4.0)],
        "doc_id long, score double")
    dec = representative_decisions(pairs, scores)
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dec.collect()}
    # cluster {1,2,3}: node 2 has the best score; cluster {10,11}:
    # tie -> min id
    assert got == {1: (1, False), 2: (1, True), 3: (1, False),
                   10: (10, True), 11: (10, False)}


def test_representative_decisions_missing_scores(spark):
    from ocr_engine_spark.functions.cluster import representative_decisions
    pairs = _pairs(spark, [(1, 2), (5, 6)])
    # node 2 unscored -> node 1 wins; cluster {5,6} fully unscored ->
    # min id wins (graceful degradation to the min-id rule)
    scores = spark.createDataFrame([(1, 0.1)], "doc_id long, score double")
    dec = representative_decisions(pairs, scores)
    got = {r["doc_id"]: r["keep"] for r in dec.collect()}
    assert got == {1: True, 2: False, 5: True, 6: False}


def test_drop_near_duplicates_keep_best_score(spark):
    base_text = ("the quick brown fox jumps over the lazy dog again and "
                 "again every single day of the long week")
    rows = [(1, base_text, 0.2), (2, base_text, 0.9),
            (3, "completely different content about spark shuffle "
                "partitions and broadcast joins at terabyte scale", 0.5)]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, quality double")
    kept = sorted(r["doc_id"] for r in drop_near_duplicates(
        df, threshold=0.9, score_col="quality").collect())
    # the HIGHER-quality copy (id 2) survives, not the min id
    assert kept == [2, 3]


def test_soft_dedup_weights(spark):
    """SoftDedup reweighting: cluster of 3 -> weight 333333 micro each,
    pair -> 500000, singleton -> 1000000; expected cluster mass ~1 doc."""
    from ocr_engine_spark.functions.cluster import soft_dedup_weights
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    corpus = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    out = {r.doc_id: r for r in
           soft_dedup_weights(pairs, corpus).collect()}
    assert len(out) == 6
    for d in (1, 2, 3):
        assert out[d].cluster_id == 1 and out[d].cluster_size == 3
        assert out[d].weight_micro == 333_333
    for d in (10, 11):
        assert out[d].cluster_id == 10 and out[d].weight_micro == 500_000
    assert out[99].cluster_id == 99 and out[99].cluster_size == 1
    assert out[99].weight_micro == 1_000_000
    # cluster mass in expectation: 3 * 333333 ~= one document (floor)
    assert sum(out[d].weight_micro for d in (1, 2, 3)) == 999_999


def test_soft_dedup_weights_string_ids(spark):
    from ocr_engine_spark.functions.cluster import soft_dedup_weights
    pairs = spark.createDataFrame(
        [("http://a/1", "http://a/2")], "id_a string, id_b string")
    corpus = spark.createDataFrame(
        [("http://a/1",), ("http://a/2",), ("http://b/x",)],
        "doc_id string")
    out = {r.doc_id: r.weight_micro for r in
           soft_dedup_weights(pairs, corpus).collect()}
    assert out == {"http://a/1": 500_000, "http://a/2": 500_000,
                   "http://b/x": 1_000_000}
