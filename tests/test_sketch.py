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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

import hashlib

from ocr_engine_spark.functions.sketch import (
    cms_counters,
    cms_estimate,
    cms_topk_audit,
)


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cms(values, d, w):
    """Reference CMS: dict[(row, slot)] -> count."""
    c = {}
    for v in values:
        for row in range(d):
            slot = _md5_int60(f"{row}\x1f{v}") % w
            c[(row, slot)] = c.get((row, slot), 0) + 1
    return c


def _py_estimate(c, v, d, w):
    return min(c.get((row, _md5_int60(f"{row}\x1f{v}") % w), 0)
               for row in range(d))


def _zipf_values():
    # value "t<i>" appears 200//(i+1) times: a heavy head + long tail
    vals = []
    for i in range(60):
        vals.extend([f"t{i}"] * (200 // (i + 1)))
    return vals


def test_cms_counters_match_python_reference(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {(r.row, r.slot): r.cnt
           for r in cms_counters(df, "v", d=3, w=32).collect()}
    assert got == _py_cms(vals, 3, 32)


def test_cms_estimate_never_undercounts_and_is_exact_when_wide(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    # narrow sketch: one-sided error only, equal to the replica
    ref = _py_cms(vals, 3, 32)
    rows = cms_topk_audit(df, "v", d=3, w=32, k=60).collect()
    assert len(rows) == 60
    for r in rows:
        assert r.n_exact == exact[r.value]
        assert r.overcount >= 0                      # never undercounts
        assert r.estimate == _py_estimate(ref, r.value, 3, 32)
    # wide sketch: no collisions at this cardinality -> exact
    wide = cms_topk_audit(df, "v", d=4, w=4096, k=60).collect()
    assert all(r.overcount == 0 for r in wide)


def test_cms_counters_sum_merge_equals_union_sketch(spark):
    from pyspark.sql import functions as F
    vals = _zipf_values()
    a = spark.createDataFrame([(v,) for v in vals[:400]], ["v"])
    b = spark.createDataFrame([(v,) for v in vals[400:]], ["v"])
    merged = (cms_counters(a, "v", d=3, w=32)
              .union(cms_counters(b, "v", d=3, w=32))
              .groupBy("row", "slot").agg(F.sum("cnt").alias("cnt")))
    whole = cms_counters(a.union(b), "v", d=3, w=32)
    as_map = lambda df: {(r.row, r.slot): r.cnt for r in df.collect()}
    assert as_map(merged) == as_map(whole)


def test_cms_absent_item_reads_min_slot(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    counters = cms_counters(df, "v", d=3, w=32)
    probe = spark.createDataFrame([("never-seen-xyz",)], ["v"])
    ref = _py_cms(vals, 3, 32)
    got = cms_estimate(counters, probe, "v", d=3, w=32).collect()[0]
    assert got.estimate == _py_estimate(ref, "never-seen-xyz", 3, 32)
    assert got.estimate >= 0


def test_kmv_jaccard_known_overlap(spark):
    # two 300-element sets sharing 100 elements: true J = 100/500 =
    # 0.2. A k=64 KMV estimate has relative error ~1/sqrt(64) = 12.5%;
    # assert inside a 3-sigma band and exactness of the plumbing
    # (sketch sizes, merged k-min size).
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sketch import kmv_jaccard, kmv_sketch
    a = spark.range(0, 300).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    b = spark.range(200, 500).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    row = kmv_jaccard(kmv_sketch(a, "v", k=64),
                      kmv_sketch(b, "v", k=64), k=64).collect()[0]
    assert row["n_a"] == 64 and row["n_b"] == 64
    assert row["k_union"] == 64
    assert 0 <= row["n_both"] <= 64
    assert 50_000 < row["est_jaccard_ppm"] < 400_000


def test_kmv_sketch_smaller_than_k_is_exact(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sketch import kmv_jaccard, kmv_sketch
    a = spark.range(0, 10).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    b = spark.range(5, 15).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    # below k the sketch IS the distinct set -> the estimate is exact:
    # J = 5/15
    row = kmv_jaccard(kmv_sketch(a, "v", k=64),
                      kmv_sketch(b, "v", k=64), k=64).collect()[0]
    assert row["n_a"] == 10 and row["n_b"] == 10
    assert row["k_union"] == 15 and row["n_both"] == 5
    assert row["est_jaccard_ppm"] == 333_333


def test_value_sample_quantiles_close_to_exact(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sketch import (
        sketch_quantiles, value_sample_sketch,
    )
    # values 0..999 uniformly; a k=128 sample's median must land
    # within ~3 sigma of 500 (binomial spread ~ n*sqrt(p q / k) ~ 44)
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"),
                                     F.col("id").alias("val"))
    sk = value_sample_sketch(df, "val", id_col="doc_id", k=128)
    est = {r["pct"]: r["est_value"]
           for r in sketch_quantiles(sk, [50, 90]).collect()}
    assert 360 < est[50] < 640
    assert 800 < est[90] <= 999


def test_value_sample_sketch_mergeable(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sketch import value_sample_sketch
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"),
                                    F.col("id").alias("val"))
    a = df.filter(F.col("doc_id") < 250)
    b = df.filter(F.col("doc_id") >= 250)
    k = 64
    merged = (value_sample_sketch(a, "val", id_col="doc_id", k=k)
              .unionByName(value_sample_sketch(b, "val",
                                               id_col="doc_id", k=k))
              .orderBy(F.col("h").asc()).limit(k))
    direct = value_sample_sketch(df, "val", id_col="doc_id", k=k)
    assert sorted(tuple(r) for r in merged.collect()) == \
        sorted(tuple(r) for r in direct.collect())


def test_hll_grouped_matches_global_per_group(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sketch import (
        hll_distinct, hll_grouped_distinct,
    )
    # two groups with different cardinalities; the grouped sketch must
    # equal the global sketch run on each group alone
    df = (spark.range(0, 700)
          .select(F.when(F.col("id") < 200, F.lit("a"))
                  .otherwise(F.lit("b")).alias("g"),
                  F.concat(F.lit("v"),
                           (F.col("id") % 400)).alias("v")))
    grouped = {r["g"]: r for r in
               hll_grouped_distinct(df, "g", "v").collect()}
    for gname in ("a", "b"):
        solo = hll_distinct(df.filter(F.col("g") == gname),
                            "v").collect()[0]
        got = grouped[gname]
        assert got["estimate"] == solo["estimate"]
        assert got["n_exact"] == solo["n_exact"]
        assert got["sum_scaled"] == solo["sum_scaled"]
    assert grouped["a"]["n_exact"] == 200
    assert grouped["b"]["n_exact"] == 400


def test_hll_growth_curve_monotone_and_matches_final_sketch(spark):
    """The prefix-union estimate must (a) be monotone non-decreasing,
    (b) equal the plain grouped-union sketch at the LAST bucket (the
    union of everything), and (c) track the exact cumulative distinct
    within HLL error at m=1024 (~3.25%; assert a loose 10% band)."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.functions.sketch import (
        hll_distinct, hll_growth_curve,
    )
    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select((F.col("doc_id") % 8).alias("tb"),
                F.explode(F.split(F.trim(F.lower("text")), r"\s+"))
                .alias("tok"))
        .filter(F.col("tok") != ""))
    curve = hll_growth_curve(docs, "tb", "tok").collect()
    assert [r.bucket for r in curve] == sorted({r.bucket for r in curve})
    ests = [r.estimate for r in curve]
    assert ests == sorted(ests)  # union only grows
    exacts = [r.n_exact_cum for r in curve]
    assert exacts == sorted(exacts)
    for r in curve:
        assert abs(r.err_ppm) < 100_000, r
    final = hll_distinct(docs, "tok").collect()[0]
    assert curve[-1].estimate == final["estimate"]
    assert curve[-1].n_exact_cum == final["n_exact"]
