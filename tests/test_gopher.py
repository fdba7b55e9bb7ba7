"""Gopher structural-rule battery vs an independent pure-Python model.

The Python reference implements the pinned definitions from the
functions/gopher.py docstring from scratch (regex-free where possible)
so a shared regex misread can't pass both sides.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions import gopher


# ---------------------------------------------------------------- python ref

def _ref_signals(text: str) -> dict:
    words = text.split()
    n_words = len(words)
    lines = text.split("\n")
    paras = text.split("\n\n")

    def dup_fracs(segs):
        seen, n_dup, dup_chars, all_chars = set(), 0, 0, 0
        for s in segs:
            all_chars += len(s)
            if s in seen:
                n_dup += 1
                dup_chars += len(s)
            seen.add(s)
        return (round(n_dup / max(len(segs), 1), 6),
                round(dup_chars / max(all_chars, 1), 6))

    n_bullet = sum(bool(re.match(r"^[ \t]*[-*•‣▪]", ln))
                   for ln in lines)
    n_ellipsis = sum(bool(re.search(r"(\.\.\.|…)[ \t]*$", ln))
                     for ln in lines)
    n_alpha = sum(any(ch.isascii() and ch.isalpha() for ch in w)
                  for w in words)
    # '...' counted leftmost non-overlapping, same as the engines
    n_sym = (text.count("#") + len(re.findall(r"\.\.\.", text))
             + text.count("…"))
    low_words = set(re.findall(r"[a-z]+", text.lower()))
    dl, dlc = dup_fracs(lines)
    dp, dpc = dup_fracs(paras)
    return {
        "n_words": n_words,
        "mean_word_len": round(sum(len(w) for w in words)
                               / max(n_words, 1), 6),
        "symbol_ratio": round(n_sym / max(n_words, 1), 6),
        "bullet_line_frac": round(n_bullet / len(lines), 6),
        "ellipsis_line_frac": round(n_ellipsis / len(lines), 6),
        "alpha_word_frac": round(n_alpha / max(n_words, 1), 6),
        "n_required_stops": sum(w in low_words
                                for w in gopher.REQUIRED_STOPWORDS),
        "dup_line_frac": dl, "dup_line_char_frac": dlc,
        "dup_para_frac": dp, "dup_para_char_frac": dpc,
    }


DOCS = [
    ("plain", "the cat sat with a hat and that is all we have to say "
              "about the matter of cats " * 3),
    ("bullets", "- one thing\n- two things\n\t- three\n• four\nnot a "
                "bullet line here"),
    ("ellipsis", "to be continued...\nmore coming…  \nplain line\n"
                 "dots... in the middle stay"),
    ("numeric", "1 2 3 44 5.5 6,7 8 9 10 11 12 13 14 15 word"),
    ("adjacent_nonalpha", "123 456 789 %% ## !! alpha beta"),
    ("symbols", "x # y # z … w ... deep...... end"),
    ("dup_lines", "alpha beta\ngamma\nalpha beta\n\ngamma\nalpha beta"),
    ("dup_paras", "para one here\n\npara two\n\npara one here\n\npara two"),
    ("blank", ""),
    ("whitespace", "   \n\t \n  "),
    ("one_word", "hello"),
    ("unicode", "café naïve résumé über "
                "你好 世界 the of and"),
]


@pytest.fixture(scope="module")
def sig_rows(spark):
    df = spark.createDataFrame(DOCS, "name string, text string")
    out = gopher.gopher_signals(df, "text")
    return {r["name"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("name,text", DOCS)
def test_signals_match_python_reference(sig_rows, name, text):
    got = sig_rows[name]
    want = _ref_signals(text)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (name, k, got[k], v)


def test_filter_and_report_consistency(spark):
    df = spark.createDataFrame(DOCS, "name string, text string")
    kept = gopher.filter_gopher(df, "text")
    assert kept.columns == ["name", "text"]
    kept_names = {r["name"] for r in kept.collect()}
    # the long natural-language doc is the only one passing every rule
    assert kept_names == {"plain"}
    rep = gopher.gopher_report(df, "text").collect()[0]
    assert rep["n_docs"] == len(DOCS)
    assert rep["n_kept"] == len(kept_names)
    # each probe doc trips its intended rule
    assert rep["fail_bullet_heavy"] == 0  # bullets doc is only 4/5 lines
    assert rep["fail_ellipsis_heavy"] >= 1
    assert rep["fail_non_alpha"] >= 2  # numeric + adjacent_nonalpha
    assert rep["fail_symbol_heavy"] >= 1
    assert rep["fail_dup_lines"] >= 1
    assert rep["fail_dup_paragraphs"] >= 1
    assert rep["fail_missing_stopwords"] >= 3
    assert rep["fail_too_few_words"] >= 5


def test_report_grouped(spark):
    df = spark.createDataFrame(
        [("a", "one two"), ("a", "three"), ("b", "four")],
        "src string, text string")
    rows = gopher.gopher_report(df, "text", group_by="src").collect()
    assert [r["src"] for r in rows] == ["a", "b"]
    assert [r["n_docs"] for r in rows] == [2, 1]


def test_plan_is_jvm_only(spark):
    """The whole battery must stay inside codegen: no Python eval, no
    exchange before the aggregate's own shuffle."""
    df = spark.createDataFrame(DOCS, "name string, text string")
    plan = gopher.gopher_signals(df, "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


# ------------------------------------------------------------- n-gram family

def _ref_ngram_signals(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    toks = text.lower().split()
    out = {}
    for n in top_ns:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        from collections import Counter
        cnt = Counter(grams)
        top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        joined = len(" ".join(toks))
        out[f"top_{n}gram_char_frac"] = round(
            top[1] * len(top[0]) / joined, 6)
    wchars = sum(len(t) for t in toks)
    for n in dup_ns:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        from collections import Counter
        cnt = Counter(grams)
        covered = set()
        for i, g in enumerate(grams):
            if cnt[g] > 1:
                covered.update(range(i, i + n))
        cov = sum(len(toks[p]) for p in covered)
        out[f"dup_{n}gram_char_frac"] = round(cov / wchars, 6) \
            if wchars else 0.0
    return out


NGRAM_DOCS = [
    ("repeat_tail", "alpha beta gamma delta epsilon zeta eta theta "
                    "iota kappa alpha beta gamma delta epsilon zeta "
                    "eta theta iota kappa closing words here"),
    ("unique", "one two three four five six seven eight nine ten "
               "eleven twelve thirteen fourteen fifteen sixteen"),
    ("hot_bigram", "spam ham spam ham spam ham spam ham eggs and "
                   "some other words to dilute the signal a bit"),
    ("short", "tiny doc"),
    ("exact_n", "a b c d e"),          # exactly 5 tokens: one 5-gram
    ("doubled", " ".join(["w%d" % i for i in range(12)] * 2)),
]


def test_ngram_signals_match_python_reference(spark):
    from ocr_engine_spark.functions.gopher import gopher_ngram_signals
    df = spark.createDataFrame(NGRAM_DOCS, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict()
           for r in gopher_ngram_signals(df, id_col="doc_id").collect()}
    for name, text in NGRAM_DOCS:
        want = _ref_ngram_signals(text)
        for k, v in want.items():
            assert got[name][k] == pytest.approx(v, abs=1e-9), (name, k)
    # sanity on intent: the doubled doc is fully covered at n=5..10
    assert got["doubled"]["dup_5gram_char_frac"] == 1.0
    assert got["doubled"]["dup_10gram_char_frac"] == 1.0
    # hot bigram dominates its doc
    assert got["hot_bigram"]["top_2gram_char_frac"] > 0.2
    # unique doc has zero dup coverage
    assert got["unique"]["dup_5gram_char_frac"] == 0.0


def test_ngram_fail_col(spark):
    from ocr_engine_spark.functions.gopher import (
        gopher_ngram_fail_col, gopher_ngram_signals,
    )
    df = spark.createDataFrame(NGRAM_DOCS, "doc_id string, text string")
    # Gopher's n-gram thresholds presume the >= 50-word shape rule has
    # already run: on a SHORT doc even a single-occurrence top 4-gram
    # exceeds 0.16 of the characters, so only a long unique doc is a
    # meaningful negative control
    rows = NGRAM_DOCS + [
        ("unique_long", " ".join("tok%02d" % i for i in range(80)))]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sig = gopher_ngram_signals(df, id_col="doc_id")
    flagged = {r["doc_id"]
               for r in sig.filter(gopher_ngram_fail_col()).collect()}
    assert "doubled" in flagged and "hot_bigram" in flagged
    assert "unique_long" not in flagged
