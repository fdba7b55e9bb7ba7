"""Unicode hygiene: double-UTF-8 repair vs a codecs ground truth and
NFC vs Python's unicodedata; property — repair(double_encode(x)) == x
for any text, including codepoints beyond Latin-1."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from ocr_engine_spark.functions.unicode_clean import (
    nfc_col, repair_double_utf8_col, with_unicode_clean,
)


def _double_encode(s: str) -> str:
    """The mojibake generator: UTF-8 bytes mis-decoded as Latin-1."""
    return s.encode("utf-8").decode("latin-1")


def _run_repair(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = df.select("i", repair_double_utf8_col(F.col("t")).alias("r"))\
             .collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["i"])]


def test_repair_roundtrip_identity(spark):
    originals = ["Café au lait", "naïve — résumé", "日本語テキスト",
                 "emoji \U0001F600 mix é", "plain ascii", "",
                 "mixed Ångström µ"]
    moji = [_double_encode(t) for t in originals]
    assert _run_repair(spark, moji) == originals


def test_repair_never_fires_wrongly(spark):
    # genuine Latin-1-range text, pure ASCII, and non-Latin-1 text must
    # all pass through byte-identical
    keep = ["café genuine", "ascii only!", "日本語 (not latin-1)",
            "tab\tand\nnewline", ""]
    assert _run_repair(spark, keep) == keep


def test_repair_matches_codecs_truth(spark):
    # mixed corpus: repair exactly where the python codecs roundtrip
    # is well-defined and produces the original
    cases = ["CafÃ©", "cafÃ© Ã  la carte", "café", "abcÿ", "Ã"]
    def truth(s):
        try:
            b = s.encode("latin-1")
        except UnicodeEncodeError:
            return s
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return s
    assert _run_repair(spark, cases) == [truth(c) for c in cases]


def test_nfc_matches_unicodedata(spark):
    texts = ["Café", "Å already", "ﬁ ligature stays",
             "ñ + composed ñ", "ascii", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = df.select("i", nfc_col(F.col("t")).alias("n")).collect()
    got = [r["n"] for r in sorted(rows, key=lambda r: r["i"])]
    assert got == [unicodedata.normalize("NFC", t) for t in texts]


def test_with_unicode_clean_flag_and_compose(spark):
    rows = [(1, _double_encode("déjà vu")), (2, "untouched"),
            (3, "Café decomposed only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_unicode"], r["was_repaired"])
           for r in with_unicode_clean(df).collect()}
    assert out[1] == ("déjà vu", True)
    assert out[2] == ("untouched", False)
    # NFC applied, but repair flag stays false for decomposed-only text
    assert out[3] == ("Café decomposed only", False)


def test_repair_plan_is_jvm_only(spark):
    # the repair column must not introduce any Python eval node
    df = spark.createDataFrame([("x",)], "t string")
    plan = df.select(repair_double_utf8_col(F.col("t")).alias("r"))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
