"""Sentence segmentation (functions/sentence.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.sentence import (
    sentences,
    split_sentences_col,
)


def _split(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, t string")
    rows = (df.select("id", split_sentences_col(F.col("t")).alias("s"))
            .orderBy("id").collect())
    return [r.s for r in rows]


def test_basic_boundaries(spark):
    out = _split(spark, [
        "First sentence. Second one! Third? Yes.",
        "no capitals. no split here",
        "Trailing terminator.",
    ])
    assert out[0] == ["First sentence.", "Second one!", "Third?",
                      "Yes."]
    assert out[1] == ["no capitals. no split here"]
    assert out[2] == ["Trailing terminator."]


def test_abbreviations_do_not_split(spark):
    out = _split(spark, [
        "Dr. Smith met Mr. Jones. They spoke.",
        "See e.g. Fig. 4 for details. The plot thickens.",
        "Prices rose 3.5 percent. Markets fell.",
    ])
    assert out[0] == ["Dr. Smith met Mr. Jones.", "They spoke."]
    assert out[1] == ["See e.g. Fig. 4 for details.",
                      "The plot thickens."]
    assert out[2] == ["Prices rose 3.5 percent.", "Markets fell."]


def test_chained_boundaries(spark):
    (s,) = _split(spark, ["A. B. C. D."])
    assert s == ["A.", "B.", "C.", "D."]


def test_protect_marker_is_removed(spark):
    (s,) = _split(spark, ["Dr. Who arrived. End."])
    assert s == ["Dr. Who arrived.", "End."]
    assert all("\x02" not in x and "\x1e" not in x for x in s)


def test_sentences_rows(spark):
    df = spark.createDataFrame(
        [(7, "One two three. Four five. Six.")],
        "doc_id long, text string")
    rows = sentences(df).orderBy("sent_idx").collect()
    assert [(r.sent_idx, r.sentence, r.n_tokens) for r in rows] == [
        (0, "One two three.", 3),
        (1, "Four five.", 2),
        (2, "Six.", 1),
    ]
