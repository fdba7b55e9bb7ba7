"""Cleaning-funnel report: stage chaining, single-scan shape."""

import pyspark.sql.functions as F

from ocr_engine_spark.functions.funnel import filter_funnel


def test_funnel_stage_chaining(spark):
    long_good = ("the quick brown fox jumps over the lazy dog and then "
                 "runs back to the old barn with a friend of the family "
                 "for a long while before it rests")
    rows = [(0, long_good), (1, long_good),          # dup pair
            (2, "short text"),                        # fails length
            (3, long_good + " extra tail words here")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["stage_idx"]: r for r in filter_funnel(docs).collect()}
    assert [out[i]["stage"] for i in range(4)] == [
        "input", "min_tokens_25", "quality_micro_350000", "exact_dedup"]
    assert out[0]["n_in"] == out[0]["n_kept"] == 4
    # each stage's n_in chains from the previous stage's n_kept
    for i in range(1, 4):
        assert out[i]["n_in"] == out[i - 1]["n_kept"]
    assert out[1]["n_kept"] == 3            # doc 2 dropped
    assert out[3]["n_kept"] == out[3]["n_in"] - 1   # dup collapsed
    assert out[0]["drop_ppm"] == 0
    assert out[1]["drop_ppm"] == 250_000


def test_funnel_empty_corpus_null_ppm(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    out = {r["stage_idx"]: r for r in filter_funnel(docs).collect()}
    assert out[0]["n_in"] == 0
    assert out[1]["drop_ppm"] is None


def test_threshold_sweep_monotone(spark):
    from ocr_engine_spark.functions.funnel import threshold_sweep
    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs back to the old barn with a friend of the family "
            "for a long while before it rests")
    junk = "@@@ ### !!! ??? ;;; ::: ,,, ... ((( )))"
    docs = spark.createDataFrame(
        [(0, good), (1, good), (2, junk)], ["doc_id", "text"])
    rows = threshold_sweep(docs, [0, 300_000, 990_000]).collect()
    by_t = {r["threshold_micro"]: r for r in rows}
    assert by_t[0]["n_docs_kept"] == 3
    assert by_t[0]["docs_ppm"] == 1_000_000
    # junk falls out by 0.3; retention is monotone non-increasing
    assert by_t[300_000]["n_docs_kept"] == 2
    assert by_t[990_000]["n_docs_kept"] <= 2
    kept = [r["n_docs_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    toks = [r["n_tokens_kept"] for r in rows]
    assert toks == sorted(toks, reverse=True)
