"""stratified_sample: exact counts, determinism, bounded driver read,
and agreement with the naive single-window reference implementation."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window, functions as F

from ocr_engine_spark.functions.sample import (
    sample_rank_col, stratified_sample,
)


def _docs(spark, n=120, strata=("en", "de", "fr")):
    rows = [(i, strata[i % len(strata)], f"doc {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _naive(df, n, strata_col="lang", id_col="doc_id"):
    """Reference: the one-task-per-stratum window the scale path avoids."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_rank_col(F.col(strata_col), F.col(id_col)), id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def test_exact_count_per_stratum(spark):
    out = stratified_sample(_docs(spark), 7, partitions=5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7}


def test_matches_naive_window(spark):
    df = _docs(spark, n=150)
    got = sorted((r["lang"], r["doc_id"]) for r in
                 stratified_sample(df, 11, partitions=7).collect())
    want = sorted((r["lang"], r["doc_id"]) for r in
                  _naive(df, 11).collect())
    assert got == want


def test_stratum_smaller_than_n_keeps_all(spark):
    df = _docs(spark, n=9)  # 3 per stratum
    out = stratified_sample(df, 100, partitions=4)
    assert out.count() == 9


def test_deterministic_across_partitioning_and_input_order(spark):
    df = _docs(spark, n=90)
    shuffled = df.orderBy(F.md5(F.col("doc_id").cast("string")))
    a = sorted(r["doc_id"] for r in
               stratified_sample(df, 5, partitions=3).collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(shuffled, 5, partitions=13).collect())
    assert a == b


def test_rank_out_is_global_within_stratum(spark):
    df = _docs(spark, n=60)
    out = stratified_sample(df, 6, partitions=5, rank_out="rank")
    for lang in ("en", "de", "fr"):
        ranks = sorted(r["rank"] for r in
                       out.filter(F.col("lang") == lang).collect())
        assert ranks == [1, 2, 3, 4, 5, 6]


def test_rank_key_is_md5_portable(spark):
    # the rank key must equal plain md5(lang + \x1f + id) so the DuckDB
    # oracle can reproduce the selection bit-for-bit
    row = (spark.range(1)
           .select(sample_rank_col(F.lit("en"), F.lit(42)).alias("k"))
           .collect()[0])
    assert row["k"] == hashlib.md5("en\x1f42".encode()).hexdigest()


def test_empty_input(spark):
    df = _docs(spark).filter(F.lit(False))
    assert stratified_sample(df, 5, partitions=3).count() == 0
