"""Salted skew handling: correctness (salted == direct results) and the
actual load-spread property on the hot-host fixture corpus (one host ~30%
of rows by construction, fixtures/gen_pages.py:40)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.skew import (
    host_col, key_histogram, salt_col, salted_agg, salted_repartition,
)


@pytest.fixture(scope="module")
def hosts_df(pages_df):
    return pages_df.select(
        "url", host_col(F.col("url")).alias("host"),
        F.length("html").alias("n_bytes")).cache()


def test_fixture_corpus_is_skewed(hosts_df):
    top = key_histogram(hosts_df, F.col("host"), top_k=1).first()
    assert top.key == "big-portal.example.com"
    assert top.share > 0.2  # the designed hot host


def test_salted_agg_matches_direct(hosts_df):
    direct = {r.host: (r.n, r.total, r.mx) for r in
              hosts_df.groupBy("host")
              .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("total"),
                   F.max("n_bytes").alias("mx")).collect()}
    salted = {r.host: (r.n, r.total, r.mx) for r in
              salted_agg(hosts_df, "host", F.col("url"),
                         [("n_bytes", "count", "n"),
                          ("n_bytes", "sum", "total"),
                          ("n_bytes", "max", "mx")],
                         n_salt=8).collect()}
    assert salted == direct


def test_salt_is_deterministic_and_spread(hosts_df):
    s1 = hosts_df.select(salt_col(F.col("url"), 16).alias("s"))
    assert s1.distinct().count() == 16
    a = [r.s for r in s1.collect()]
    b = [r.s for r in hosts_df.select(
        salt_col(F.col("url"), 16).alias("s")).collect()]
    assert a == b  # no rand(): resume-safe


def test_salted_repartition_breaks_hot_partition(hosts_df):
    """Partitioning by raw host sends the hot host to ONE partition;
    salting spreads it. Compare max-partition row share."""
    n_parts = 16

    def max_share(df):
        sizes = (df.withColumn("pid", F.spark_partition_id())
                 .groupBy("pid").count().collect())
        total = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / total

    plain = hosts_df.repartition(n_parts, F.col("host"))
    salted = salted_repartition(hosts_df, F.col("host"), F.col("url"),
                                n_parts, n_salt=16)
    assert max_share(plain) > 0.2          # hot host pinned to one task
    assert max_share(salted) < 0.15        # spread across the cluster
