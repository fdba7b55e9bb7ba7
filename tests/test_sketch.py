"""Portable HyperLogLog (functions/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.sketch import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def test_hll_accuracy_within_sketch_error(spark):
    # 5000 distinct values, b=10 -> expected rel err ~1.04/32 ~ 3.3%
    df = spark.range(5000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    r = hll_distinct(df, "v", b=10).collect()[0]
    assert r.n_exact == 5000
    assert abs(r.err_ppm) < 120_000          # < 12% (3.6 sigma)
    # err_ppm is the pinned integer derivation of the two counts —
    # Spark div / DuckDB // both truncate toward zero (Python //
    # floors, hence int() here)
    assert r.err_ppm == int((r.estimate - r.n_exact) * 1_000_000
                            / r.n_exact)


def test_hll_duplicates_do_not_inflate(spark):
    uniq = spark.range(800).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    dup = uniq.union(uniq).union(uniq)
    e1 = hll_distinct(uniq, "v", b=10).collect()[0].estimate
    e3 = hll_distinct(dup, "v", b=10).collect()[0].estimate
    assert e1 == e3


def test_hll_small_range_linear_counting(spark):
    df = spark.range(40).select(
        F.concat(F.lit("s"), F.col("id")).alias("v"))
    r = hll_distinct(df, "v", b=10).collect()[0]
    # 40 values in 1024 buckets: linear counting regime, very accurate
    assert abs(r.estimate - 40) <= 2
    assert r.n_zero_buckets >= 1024 - 40


def test_hll_registers_merge_property(spark):
    a = spark.range(0, 600).select(
        F.concat(F.lit("m"), F.col("id")).alias("v"))
    b_ = spark.range(300, 900).select(
        F.concat(F.lit("m"), F.col("id")).alias("v"))
    merged = (hll_registers(a, "v").union(hll_registers(b_, "v"))
              .groupBy("bucket").agg(F.max("register")
                                     .alias("register")))
    est_m = hll_estimate(merged).collect()[0].estimate
    est_u = hll_estimate(
        hll_registers(a.union(b_), "v")).collect()[0].estimate
    assert est_m == est_u        # register-max merge == union sketch
