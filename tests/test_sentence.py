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


def test_bitext_align_identical_sides_score_million(spark):
    from ocr_engine_spark.functions.sentence import bitext_align_score
    df = spark.createDataFrame(
        [(1, "One two. Three four. Five.")],
        "doc_id long, text string")
    r = bitext_align_score(df, df).collect()[0]
    assert (r.n_sents_a, r.n_sents_b, r.n_aligned) == (3, 3, 3)
    assert r.mean_ratio_ppm == 1_000_000
    assert r.align_score_ppm == 1_000_000


def test_bitext_align_length_ratio_math(spark):
    from ocr_engine_spark.functions.sentence import bitext_align_score
    a = spark.createDataFrame([(1, "Abcd. Wxyz.")],       # lens 5,5
                              "doc_id long, text string")
    b = spark.createDataFrame([(1, "Ab. Wxyzwxyzwx.")],   # lens 3,11
                              "doc_id long, text string")
    r = bitext_align_score(a, b).collect()[0]
    # ratios: 3e6//5=600000, 5e6//11=454545
    assert r.sum_ratio_ppm == 600_000 + 454_545
    assert r.mean_ratio_ppm == (600_000 + 454_545) // 2


def test_bitext_align_count_mismatch_penalized(spark):
    from ocr_engine_spark.functions.sentence import bitext_align_score
    a = spark.createDataFrame([(1, "Same text. Again.")],
                              "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "Same text. Again. Extra tail sentence. And more.")],
        "doc_id long, text string")
    r = bitext_align_score(a, b).collect()[0]
    assert (r.n_sents_a, r.n_sents_b, r.n_aligned) == (2, 4, 2)
    # perfect on the aligned prefix, halved by the unaligned tail
    assert r.mean_ratio_ppm == 1_000_000
    assert r.align_score_ppm == 2_000_000 // 4


def test_mixed_language_report_flags_code_switching(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.sentence import mixed_language_report
    en = ("The cat is on the mat with a dog. The day is good for the "
          "friends of the family.")
    mixed = en + " Le chat dort sur la table avec les amis et une souris."
    # 40 en sentences + 1 fr: majority 40/41 ~= 975_609 ppm > the
    # 950_000 gate -> a lone misvote must NOT flag a long doc mixed
    long_one_off = (en * 20
                    + " Le chat dort sur la table avec les amis et une"
                    " souris.")
    rows = [(0, en), (1, mixed), (2, long_one_off)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in mixed_language_report(df).collect()}
    assert not got[0]["is_mixed"]
    assert got[0]["majority_lang"] == "en"
    assert got[0]["majority_ppm"] == 1_000_000
    assert got[1]["is_mixed"]
    assert got[1]["majority_lang"] == "en"
    assert got[1]["n_langs"] == 2
    assert got[1]["majority_ppm"] < 1_000_000
    assert got[2]["n_langs"] == 2
    assert got[2]["majority_ppm"] > 950_000
    assert not got[2]["is_mixed"]


def test_burstiness_flat_vs_bursty(spark):
    from ocr_engine_spark.functions.sentence import burstiness_report
    flat = ("One two three four five. One two three four five. "
            "One two three four five. One two three four five.")
    bursty = ("Short. This sentence is rather a great deal longer "
              "than the first one by far. Tiny. "
              "Another moderately sized sentence follows here.")
    df = spark.createDataFrame(
        [(0, flat), (1, bursty)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in burstiness_report(df).collect()}
    assert got[0]["cv_milli"] == 0        # perfectly uniform
    assert got[0]["mean_len_milli"] == 5000
    assert got[1]["cv_milli"] > 500       # strongly bursty
    assert got[1]["n_sents"] == 4
