"""Record linkage (functions/linkage.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.001")


def test_planted_variants_link_and_shifted_do_not(spark):
    from ocr_engine_spark.functions.linkage import link_report
    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .filter(F.col("doc_id") < 60).select("doc_id", "text"))
    trunc = docs.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.expr("substr(text, 1, greatest(length(text) - 7, 1))")
        .alias("text"))
    shifted = docs.select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat(F.lit("zz "), F.col("text")).alias("text"))
    corpus = docs.unionByName(trunc).unionByName(shifted)
    rep = link_report(corpus).collect()
    by_min = {r.min_id: r for r in rep}
    # every original links its truncated twin; the prefix-shifted twin
    # moved its block key and must NOT join that cluster
    linked = [r for r in rep
              if r.min_id < 60 and r.max_id == r.min_id + 100_000]
    assert len(linked) >= 55  # allow a few cross-doc block collisions
    for r in rep:
        members_shifted = r.min_id >= 200_000
        if not members_shifted:
            assert r.max_id < 200_000, r
    # shifted twins cluster among themselves exactly like originals do
    assert all(r.n_members >= 2 for r in rep)


def test_pair_scores_and_threshold(spark):
    from ocr_engine_spark.functions.linkage import blocked_link_pairs
    rows = [(0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zetX"),   # dist 1
            (2, "alpha beta gamma delta epsilon QQQQ"),   # dist 4
            (3, "omega beta gamma delta epsilon zeta")]   # other block
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.dist
           for r in blocked_link_pairs(df, max_dist=3).collect()}
    assert got == {(0, 1): 1}
    got10 = {(r.id_a, r.id_b): r.dist
             for r in blocked_link_pairs(df, max_dist=10).collect()}
    assert got10 == {(0, 1): 1, (0, 2): 4, (1, 2): 4}


def test_no_cartesian_in_plan(spark):
    from ocr_engine_spark.functions.linkage import blocked_link_pairs
    df = spark.createDataFrame([(0, "abc def"), (1, "abc xyz")],
                               "doc_id long, text string")
    plan = blocked_link_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
