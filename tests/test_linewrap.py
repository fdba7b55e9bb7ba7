r"""Line-wrap + de-hyphenation repair (functions/linewrap.py)."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_engine_spark.functions.linewrap import (
    dehyphenate_col,
    dehyphenation_report,
    repair_wraps_col,
    unwrap_lines_col,
)


def _apply(spark, col_fn, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, t string")
    rows = df.select("id", col_fn(F.col("t")).alias("r")).orderBy("id")
    return [r.r for r in rows.collect()]


def test_dehyphenate_merges_lowercase_continuation(spark):
    out = _apply(spark, dehyphenate_col, [
        "an exam-\nple word",          # classic split -> merged
        "the Wi-\nFi router",          # uppercase continuation kept
        "a-\nb",                       # fragments too short -> kept
        "well-\nknown split",          # merges (rule is local)
        "trailing-\n",                 # no continuation -> kept
    ])
    assert out == [
        "an example word",
        "the Wi-\nFi router",
        "a-\nb",
        "wellknown split",
        "trailing-\n",
    ]


def test_unwrap_preserves_paragraphs_and_sentences(spark):
    out = _apply(spark, unwrap_lines_col, [
        "wrapped line\ncontinues here",       # soft wrap -> space
        "sentence ends.\nNew sentence",       # capital start kept
        "para one\n\npara two",               # blank line kept
        "ends with comma,\nthen more",        # clause wrap -> space
        "digits 12\n34 stay",                 # digit boundary kept
    ])
    assert out == [
        "wrapped line continues here",
        "sentence ends.\nNew sentence",
        "para one\n\npara two",
        "ends with comma, then more",
        "digits 12\n34 stay",
    ]


def test_repair_composes_dehyphen_before_unwrap(spark):
    src = "the exam-\nple text\nwraps twice here"
    (out,) = _apply(spark, repair_wraps_col, [src])
    assert out == "the example text wraps twice here"


def test_repair_identity_on_injected_wraps(spark):
    """wrap(text) then repair == text for well-spaced injections."""
    original = ("alpha beta gamma delta epsilon zeta eta theta "
                "iota kappa lambda mu")
    wrapped = original.replace("gamma delta", "gam-\nma delta") \
                      .replace("theta iota", "theta\niota")
    (out,) = _apply(spark, repair_wraps_col, [wrapped])
    assert out == original


def test_report_confirms_against_document_vocabulary(spark):
    df = spark.createDataFrame(
        [
            # 'customer' attested later -> confirmed
            (0, "the cus-\ntomer paid and the customer left"),
            # 'xylophone' never attested -> unconfirmed
            (1, "a xylo-\nphone solo starts"),
            # two sites in one doc, mixed outcomes
            (2, "win-\ndow then window and zz-\nqq end"),
            # no sites at all -> no rows
            (3, "plain text no breaks"),
        ],
        "doc_id long, text string")
    rows = dehyphenation_report(df).orderBy("doc_id", "site_idx") \
                                   .collect()
    got = [(r.doc_id, r.left, r.right, r.merged, r.confirmed)
           for r in rows]
    assert got == [
        (0, "cus", "tomer", "customer", True),
        (1, "xylo", "phone", "xylophone", False),
        (2, "win", "dow", "window", True),
        (2, "zz", "qq", "zzqq", False),
    ]


def test_report_site_itself_is_not_an_attestation(spark):
    """The hyphenated occurrence must never confirm itself."""
    df = spark.createDataFrame(
        [(0, "only occurrence is frag-\nment here")],
        "doc_id long, text string")
    rows = dehyphenation_report(df).collect()
    assert len(rows) == 1 and rows[0].confirmed is False


@settings(max_examples=25, deadline=None)
@given(st.text(
    alphabet=st.sampled_from("ab Z,.\n-\x85"), min_size=0, max_size=30))
@example("a-\x85b")            # U+0085 is NOT \n: no merge
@example("a-\nb" * 3)          # short fragments: untouched
@example("ab-\ncd-\nef")       # chained sites: one-pass contract
def test_repair_fuzz_only_removes_break_bytes(spark, s):
    """Repair may only delete '-\n' pairs or turn '\n' into ' ' —
    length never grows by more than the spaces it swaps, and a text
    with no '\n' at all is a fixed point."""
    (out,) = _apply(spark, repair_wraps_col, [s])
    assert len(out) <= len(s)
    if "\n" not in s:
        assert out == s
    # non-break bytes survive verbatim — U+0085 especially (the Java
    # line-terminator family must never be treated as '\n' here)
    for ch in "abZ,.\x85":
        assert out.count(ch) == s.count(ch)
