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


# --- temperature_sample (mT5-style alpha resampling) ---------------------

def _skewed(spark):
    """480 en / 60 de / 12 fr — a skew alpha<1 must flatten."""
    rows = ([(i, "en") for i in range(480)]
            + [(1000 + i, "de") for i in range(60)]
            + [(2000 + i, "fr") for i in range(12)])
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_quotas_flatten_and_sum(spark):
    from ocr_engine_spark.functions.sample import temperature_quotas
    df = _skewed(spark)
    q = {r["lang"]: (r["__c"], r["__quota"])
         for r in temperature_quotas(df, alpha=0.3,
                                     total_out=300).collect()}
    # alpha<1: low-resource share of the OUTPUT beats its input share
    assert q["fr"][1] / 300 > 12 / 552
    assert q["en"][1] / 300 < 480 / 552
    # quotas approximately exhaust the budget (rounding only)
    assert abs(sum(v[1] for v in q.values()) - 300) <= len(q)


def test_temperature_sample_exact_quota_and_copies(spark):
    from ocr_engine_spark.functions.sample import (temperature_quotas,
                                                   temperature_sample)
    df = _skewed(spark)
    quotas = {r["lang"]: r["__quota"]
              for r in temperature_quotas(df, alpha=0.3,
                                          total_out=300).collect()}
    out = temperature_sample(df, alpha=0.3, total_out=300,
                             rank_out="rank").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert len(rows) == quotas[lang]  # exact quota per stratum
    # upsampled stratum: every doc present, copy counts differ by <= 1
    fr = by_lang["fr"]
    per_doc = {}
    for r in fr:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert len(per_doc) == 12  # every fr doc appears
    assert max(per_doc.values()) - min(per_doc.values()) <= 1
    # the extra copies go to the LOWEST ranks
    ranks_with_extra = {r["rank"] for r in fr
                        if per_doc[r["doc_id"]] == max(per_doc.values())}
    assert ranks_with_extra == set(range(1, len(ranks_with_extra) + 1))
    # downsampled stratum: distinct docs, exactly ranks 1..quota
    en = by_lang["en"]
    assert len({r["doc_id"] for r in en}) == len(en)
    assert sorted(r["rank"] for r in en) == list(range(1, len(en) + 1))
    # copy ids are 1-based consecutive per doc
    assert all(r["copy_id"] >= 1 for r in out)


def test_temperature_sample_deterministic(spark):
    from ocr_engine_spark.functions.sample import temperature_sample
    df = _skewed(spark)
    a = sorted(map(tuple, temperature_sample(
        df, alpha=0.5, total_out=100, partitions=3).collect()))
    b = sorted(map(tuple, temperature_sample(
        df.repartition(11), alpha=0.5, total_out=100,
        partitions=7).collect()))
    assert a == b


def test_temperature_alpha_one_is_proportional(spark):
    from ocr_engine_spark.functions.sample import temperature_quotas
    df = _skewed(spark)
    q = {r["lang"]: r["__quota"]
         for r in temperature_quotas(df, alpha=1.0,
                                     total_out=276).collect()}
    assert q == {"en": 240, "de": 30, "fr": 6}


# --- split_corpus (deterministic train/val/test assignment) -------------

def test_split_thresholds_validation():
    import pytest
    from ocr_engine_spark.functions.sample import split_thresholds_ppm
    with pytest.raises(ValueError):
        split_thresholds_ppm({})
    with pytest.raises(ValueError):
        split_thresholds_ppm({"train": 0.9, "val": 0.05})  # sums to 0.95
    with pytest.raises(ValueError):
        split_thresholds_ppm({"train": 1.5, "val": -0.5})
    # thirds round but the last cut is pinned to exactly 1e6
    t = split_thresholds_ppm({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert t[-1] == ("c", 1_000_000) and t[0][1] == 333_333


def test_split_every_row_assigned_and_deterministic(spark):
    from ocr_engine_spark.functions.sample import split_corpus
    df = _docs(spark, n=400)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"]
         for r in split_corpus(df, w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in split_corpus(df.repartition(13).orderBy(F.desc("doc_id")),
                               w).collect()}
    assert len(a) == 400 and set(a.values()) <= {"train", "val", "test"}
    assert a == b  # partitioning/order independent


def test_split_growth_stable(spark):
    """THE property that justifies hash splits over rank sampling: a
    doc's split never moves when the corpus grows."""
    from ocr_engine_spark.functions.sample import split_corpus
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    small = {r["doc_id"]: r["split"]
             for r in split_corpus(_docs(spark, n=100), w).collect()}
    big = {r["doc_id"]: r["split"]
           for r in split_corpus(_docs(spark, n=300), w).collect()}
    assert {k: big[k] for k in small} == small


def test_split_proportions_and_salt_independence(spark):
    from ocr_engine_spark.functions.sample import split_corpus
    df = _docs(spark, n=3000)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    counts = {r["split"]: r["n"] for r in
              split_corpus(df, w).groupBy("split")
              .agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 3000 - 0.9) < 0.03
    assert abs(counts["val"] / 3000 - 0.05) < 0.02
    a = {r["doc_id"]: r["split"]
         for r in split_corpus(df, w, salt="s1").collect()}
    b = {r["doc_id"]: r["split"]
         for r in split_corpus(df, w, salt="s2").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 100  # different salt = an independent re-split


def test_split_leakage_report(spark):
    """Doubled corpus under shifted ids: every leak the report finds
    must match a literal python replay of split + fingerprint, and
    groups whose copies land in ONE split must not appear."""
    from ocr_engine_spark.functions.sample import (
        split_corpus, split_leakage_report,
    )
    base = _docs(spark, n=120).select("doc_id", "text")
    corpus = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 10_000))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["fp"]: (r["splits"], r["n_docs"], r["min_id"])
           for r in split_leakage_report(corpus, w).collect()}
    # python replay from the split assignments the engine itself made
    rows = split_corpus(corpus, w).collect()
    import hashlib
    groups: dict[str, list] = {}
    for r in rows:
        fp = hashlib.md5(" ".join(r["text"].lower().split())
                         .encode()).hexdigest()
        groups.setdefault(fp, []).append(r)
    want = {}
    for fp, g in groups.items():
        splits = sorted({r["split"] for r in g})
        if len(splits) > 1:
            want[fp] = (",".join(splits), len(g),
                        min(r["doc_id"] for r in g))
    assert want and got == want
    # sanity: at least one duplicated group does NOT leak (both copies
    # in the majority split) — the filter is doing work
    same = [g for g in groups.values()
            if len(g) > 1 and len({r["split"] for r in g}) == 1]
    assert same


def test_quota_sample_explicit_recipe(spark):
    """Fixed quotas: exact downsample counts, repetition upsampling
    with extra copies to the lowest ranks, quota-0 strata dropped,
    unknown quota keys ignored, negative quotas rejected."""
    import pytest
    from ocr_engine_spark.functions.sample import quota_sample
    df = _docs(spark, n=120)  # 40 per lang in en/de/fr
    out = quota_sample(df, {"en": 10, "de": 100, "xx": 5},
                       rank_out="rank").collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de"}          # fr quota 0 -> dropped
    assert len(by_lang["en"]) == 10              # exact downsample
    assert len(by_lang["de"]) == 100             # 40 docs -> 100 rows
    # every de doc appears 100 div 40 = 2 times; ranks 1..20 get a 3rd
    copies = {}
    for r in by_lang["de"]:
        copies[r["doc_id"]] = copies.get(r["doc_id"], 0) + 1
    assert sorted(copies.values()) == [2] * 20 + [3] * 20
    three = {r["rank"] for r in by_lang["de"]
             if copies[r["doc_id"]] == 3}
    assert three == set(range(1, 21))
    # en keeps the 10 LOWEST ranks once each
    assert sorted(r["rank"] for r in by_lang["en"]) == list(range(1, 11))
    with pytest.raises(ValueError):
        quota_sample(df, {"en": -1})
