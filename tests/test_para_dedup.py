"""dedup_paragraphs: keep-first exact paragraph dedup vs a brute-force
python reference, plus the edge shapes (within-doc repeats, blank
preservation, min_chars exemption, whole-doc consumption, ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.dedup import dedup_paragraphs


def _brute(docs: dict[int, str], min_chars: int = 0
           ) -> dict[int, tuple[str, int, int]]:
    """(dedup_text, n_paras, n_removed) per doc — the spec executed
    literally: keep-first over eligible paragraphs in (doc_id, pos)
    order, ineligible (blank / < min_chars) always kept."""
    seen: set[str] = set()
    out = {}
    for d in sorted(docs):
        ps = docs[d].split("\n\n")
        kept = []
        for p in ps:
            if p.strip() == "" or len(p) < min_chars:
                kept.append(p)
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        out[d] = ("\n\n".join(kept), len(ps), len(ps) - len(kept))
    return out


def _run(spark, docs: dict[int, str], **kw):
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    rows = dedup_paragraphs(df, **kw).collect()
    return {r["doc_id"]: (r["dedup_text"], r["n_paras"], r["n_removed"])
            for r in rows}


def test_keep_first_across_docs(spark):
    docs = {1: "alpha block\n\nshared paragraph here",
            2: "shared paragraph here\n\nbeta block",
            3: "gamma\n\nshared paragraph here\n\ndelta"}
    assert _run(spark, docs) == _brute(docs)
    # doc 1 owns the shared paragraph (smallest doc_id)
    assert _run(spark, docs)[1][0] == docs[1]
    assert _run(spark, docs)[2] == ("beta block", 2, 1)


def test_within_doc_repeat_removed(spark):
    docs = {5: "same para\n\nmiddle\n\nsame para"}
    got = _run(spark, docs)
    assert got == _brute(docs)
    assert got[5] == ("same para\n\nmiddle", 3, 1)


def test_blank_paragraphs_always_kept(spark):
    # "a\n\n\n\nb" splits to ["a", "", "b"]: the blank block must
    # survive in BOTH docs (never treated as a duplicate) and the
    # rejoin must reproduce the original bytes where nothing else
    # was removed
    docs = {1: "a\n\n\n\nb", 2: "c\n\n\n\nd"}
    got = _run(spark, docs)
    assert got == _brute(docs)
    assert got[1][0] == docs[1]
    assert got[2][0] == docs[2]


def test_min_chars_exempts_short_paragraphs(spark):
    docs = {1: "hi\n\na sufficiently long paragraph",
            2: "hi\n\nanother long unique paragraph"}
    got = _run(spark, docs, min_chars=5)
    assert got == _brute(docs, min_chars=5)
    assert got[2][0] == docs[2]  # "hi" kept everywhere


def test_whole_doc_consumed(spark):
    docs = {1: "only paragraph", 2: "only paragraph"}
    got = _run(spark, docs)
    assert got[2] == ("", 1, 1)


def test_order_preserved_and_mixed(spark):
    docs = {1: "one\n\ntwo\n\nthree",
            2: "zero\n\ntwo\n\nfour\n\none\n\nfive"}
    got = _run(spark, docs)
    assert got == _brute(docs)
    assert got[2][0] == "zero\n\nfour\n\nfive"


def test_string_ids(spark):
    # keep-first order is lexicographic in the id type
    docs = {"a": "p q r", "b": "p q r"}
    df = spark.createDataFrame(sorted(docs.items()),
                               "url string, text string")
    rows = dedup_paragraphs(df, id_col="url").collect()
    got = {r["url"]: r["dedup_text"] for r in rows}
    assert got == {"a": "p q r", "b": ""}
