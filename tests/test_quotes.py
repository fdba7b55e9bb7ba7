"""Cross-document quote detection (functions/quotes.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.quotes import quote_spans


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_shared_span_is_maximal(spark):
    quote = "the quick brown fox jumps over the lazy dog"
    df = _df(spark, [
        (1, "alpha beta " + quote + " gamma"),
        (2, quote + " delta epsilon zeta"),
        (3, "unrelated words entirely here now okay fine sure"),
    ])
    rows = quote_spans(df, k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.a_start, r.b_start, r.n_tokens) == (2, 0, 9)
    assert r.quote == quote


def test_min_tokens_filters_short_spans(spark):
    df = _df(spark, [
        (1, "one two three x y z"),
        (2, "one two three p q r"),
    ])
    assert quote_spans(df, k=3, min_tokens=4).count() == 0
    assert quote_spans(df, k=3, min_tokens=3).count() == 1


def test_two_separate_spans_stay_separate(spark):
    df = _df(spark, [
        (1, "shared span one here MID shared span two there"),
        (2, "shared span one here GAP shared span two there"),
    ])
    rows = sorted(quote_spans(df, k=3).collect(),
                  key=lambda r: r.a_start)
    assert [(r.a_start, r.n_tokens) for r in rows] == [(0, 4), (5, 4)]
    assert rows[0].quote == "shared span one here"
    assert rows[1].quote == "shared span two there"


def test_hot_gram_guard_drops_boilerplate(spark):
    boiler = "all rights reserved by publisher"
    docs = [(i, f"doc {i} body text " + boiler) for i in range(8)]
    df = _df(spark, docs)
    # guard below the doc count: the viral gram never reaches the join
    assert quote_spans(df, k=3, max_docs_per_gram=4).count() == 0
    # guard above: all 28 pairs report the span
    assert quote_spans(df, k=3, max_docs_per_gram=10).count() == 28


def test_within_doc_repeat_reports_per_diagonal(spark):
    rep = "repeat me thrice"
    df = _df(spark, [
        (1, rep + " filler " + rep),         # two copies in doc 1
        (2, "lead in " + rep + " out"),      # one copy in doc 2
    ])
    rows = quote_spans(df, k=3).collect()
    # each copy in doc1 pairs with doc2's single copy
    assert sorted((r.a_start, r.b_start) for r in rows) == \
        [(0, 2), (4, 2)]
    assert all(r.quote == rep and r.n_tokens == 3 for r in rows)


def test_pairs_are_ordered_and_deduped(spark):
    q = "a shared phrase of words"
    df = _df(spark, [(i, f"x{i} " + q) for i in (5, 2, 9)])
    rows = quote_spans(df, k=5).collect()
    assert sorted((r.doc_a, r.doc_b) for r in rows) == \
        [(2, 5), (2, 9), (5, 9)]
    assert all(r.doc_a < r.doc_b for r in rows)
