"""Benchmark decontamination: n-gram overlap flagging + drop.

The oracle gate (decontaminate in __spark_entry__) replays the full
operator in DuckDB; these tests pin the operator PROPERTIES: exact
n-gram semantics (count, boundaries, tokenization), clean-corpus
pass-through, the drop composition, and the broadcast scale shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.decontam import (
    contamination_fraction, contamination_report, contamination_spans,
    decontaminate, decontaminate_fraction, ngrams_col, word_tokens_col,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_gram_is_detected_and_counted(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _df(spark, [
        # contains tokens 1..4 of the benchmark as a run -> with n=3
        # the overlapping grams are (alpha beta gamma), (beta gamma
        # delta): 2 distinct hits
        (1, "xx alpha beta gamma delta yy"),
        (2, "completely unrelated words here"),
    ])
    rep = {r["doc_id"]: r["n_hits"]
           for r in contamination_report(docs, bench, n=3).collect()}
    assert rep == {1: 2}


def test_tokenization_is_case_and_punct_insensitive(spark):
    bench = _df(spark, [(100, "Alpha, beta; GAMMA!")])
    docs = _df(spark, [(1, "prefix alpha BETA gamma suffix")])
    rep = contamination_report(docs, bench, n=3).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in rep] == [(1, 1)]


def test_short_docs_produce_no_grams(spark):
    bench = _df(spark, [(100, "only two")])
    docs = _df(spark, [(1, "only two")])  # < n tokens on both sides
    assert contamination_report(docs, bench, n=3).count() == 0
    toks = word_tokens_col(F.lit("only two"))
    row = (docs.limit(1)
           .select(ngrams_col(toks, 3).alias("g")).first())
    assert row["g"] == []


def test_decontaminate_drops_flagged_keeps_clean(spark):
    bench = _df(spark, [(100, "one two three four five six")])
    docs = _df(spark, [
        (1, "zz one two three four zz"),   # contaminated (n=4 gram)
        (2, "totally clean document text body"),
        (3, "three four five six tail words"),  # contaminated
    ])
    kept = sorted(r["doc_id"]
                  for r in decontaminate(docs, bench, n=4).collect())
    assert kept == [2]


def test_fraction_counts_positions_not_distinct_grams(spark):
    """PaLM-style fraction is POSITIONAL: a doc repeating one leaked
    gram is contaminated at every repeat position, not once."""
    bench = _df(spark, [(100, "alpha beta gamma")])
    docs = _df(spark, [
        # tokens: alpha beta gamma alpha beta gamma -> 4 trigram
        # positions; positions 1 and 4 hit (same distinct gram twice)
        (1, "alpha beta gamma alpha beta gamma"),
        (2, "clean words only in here now"),
    ])
    rows = {r["doc_id"]: r for r in
            contamination_fraction(docs, bench, n=3).collect()}
    assert set(rows) == {1}           # absent == clean
    assert rows[1]["n_grams"] == 4
    assert rows[1]["n_hits"] == 2
    assert rows[1]["hit_frac_micro"] == 500_000
    # the distinct-gram report would say 1 hit for the same doc
    rep = {r["doc_id"]: r["n_hits"] for r in
           contamination_report(docs, bench, n=3).collect()}
    assert rep == {1: 1}


def test_fraction_threshold_drop(spark):
    """decontaminate_fraction drops only docs at/above the threshold:
    a fully-leaked doc goes, a one-gram brush survives PaLM's 70%."""
    bench = _df(spark, [(100, "one two three four five six seven")])
    docs = _df(spark, [
        (1, "one two three four five six seven"),    # 100% leaked
        (2, "zz one two three zz yy xx ww vv uu"),   # 1/8 positions
        (3, "no overlap at all in this document"),
    ])
    kept = sorted(r["doc_id"] for r in
                  decontaminate_fraction(docs, bench, n=3,
                                         max_frac_micro=700_000).collect())
    assert kept == [2, 3]


def test_fraction_join_shape_is_broadcast(spark):
    """Scale shape: BOTH joins (gram semi-join, hits-back-to-sizes)
    broadcast the small side — no corpus-sized shuffle anywhere."""
    bench = _df(spark, [(100, "one two three four five six")])
    docs = _df(spark, [(1, "zz one two three four zz")])
    plan = (contamination_fraction(docs, bench, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_benchmark_side_is_broadcast(spark):
    """Scale shape: the gram semi-join must be a broadcast hash join —
    the corpus side is never shuffled to meet the benchmark."""
    bench = _df(spark, [(100, "one two three four five six")])
    docs = _df(spark, [(1, "zz one two three four zz")])
    plan = (contamination_report(docs, bench, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_spans_locate_the_leak(spark):
    """Hit positions are 1-based gram positions: a doc whose tokens
    3..7 replicate the benchmark run has its trigram hits exactly at
    positions 3,4,5 and span = 5-3+3 = 5 tokens."""
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _df(spark, [
        (1, "xx yy alpha beta gamma delta epsilon zz"),
        (2, "clean words only over here today"),
    ])
    rows = {r["doc_id"]: r for r in
            contamination_spans(docs, bench, n=3).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r.n_hits == 3
    assert r.first_hit == 3 and r.last_hit == 5
    assert r.hit_span_tokens == 5
