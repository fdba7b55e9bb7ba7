"""Bloom-prefilter decontamination (functions/bloom.py): bit math vs a
pure-Python reference filter, exact equivalence to the broadcast-set
operator, the repeated-gram regression, and plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.bloom import (bloom_filter_words,
                                              bloom_might_contain,
                                              contamination_report_bloom)
from ocr_engine_spark.functions.decontam import contamination_report

M_BITS, K = 1 << 12, 5


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_positions(h: int) -> list[int]:
    h2 = (h >> 30) | 1
    return [(h + i * h2) % M_BITS for i in range(K)]


def test_filter_words_match_python_reference(spark):
    hashes = [_h60(w) for w in ("alpha", "beta", "gamma", "delta")]
    ref_words: dict[int, int] = {}
    for h in hashes:
        for p in _ref_positions(h):
            ref_words[p >> 6] = ref_words.get(p >> 6, 0) | (1 << (p % 64))
    df = spark.createDataFrame([(h,) for h in hashes], "gram_hash long")
    got = {r.word: r.bits
           for r in bloom_filter_words(df, m_bits=M_BITS, k=K).collect()}
    assert got == ref_words


def test_no_false_negatives_and_prefilter_prunes(spark):
    member = [(_h60(f"in{i}"),) for i in range(40)]
    other = [(_h60(f"out{i}"),) for i in range(400)]
    words = bloom_filter_words(
        spark.createDataFrame(member, "gram_hash long"),
        m_bits=M_BITS, k=K)
    probe = spark.createDataFrame(
        [(i, h) for i, (h,) in enumerate(member + other)],
        "doc_id long, gram_hash long")
    surv = bloom_might_contain(probe, words, m_bits=M_BITS, k=K)
    got = {r.gram_hash for r in surv.collect()}
    assert {h for (h,) in member} <= got          # no false negatives
    assert len(got) < len(member) + len(other)    # some pruning happened


def test_repeated_gram_still_survives(spark):
    """Regression: a gram occurring TWICE in one document must still
    pass the all-k-probes test (count(*) would see 2k probe rows)."""
    h = _h60("dup")
    words = bloom_filter_words(
        spark.createDataFrame([(h,)], "gram_hash long"),
        m_bits=M_BITS, k=K)
    probe = spark.createDataFrame([(1, h), (1, h)],
                                  "doc_id long, gram_hash long")
    out = bloom_might_contain(probe, words, m_bits=M_BITS, k=K).collect()
    assert [(r.doc_id, r.gram_hash) for r in out] == [(1, h)]


@pytest.fixture(scope="module")
def corpus(spark):
    mk = " ".join(f"w{i}" for i in range(30))
    bench = [(100 + j, f"bench doc {j} " + mk + f" tail {j}")
             for j in range(5)]
    clean = [(j, f"clean doc {j} nothing shared here at all number {j} "
              + " ".join(f"c{j}x{i}" for i in range(20)))
             for j in range(20)]
    leaked = [(200 + j, "leaked prefix " + t + " leaked suffix")
              for j, (_, t) in enumerate(bench[:3])]
    docs = spark.createDataFrame(clean + leaked, "doc_id long, text string")
    bench_df = spark.createDataFrame(bench, "doc_id long, text string")
    return docs, bench_df


def test_equals_exact_operator(spark, corpus):
    docs, bench = corpus
    exact = sorted((r.doc_id, r.n_hits)
                   for r in contamination_report(docs, bench, n=5)
                   .collect())
    bloom = sorted((r.doc_id, r.n_hits)
                   for r in contamination_report_bloom(
                       docs, bench, n=5, m_bits=M_BITS, k=K).collect())
    assert bloom == exact and len(exact) == 3


def test_plan_broadcast_no_cartesian(spark, corpus):
    docs, bench = corpus
    out = contamination_report_bloom(docs, bench, n=5,
                                     m_bits=M_BITS, k=K)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_rejects_bad_m_bits(spark):
    df = None
    with pytest.raises(ValueError):
        bloom_filter_words(df, m_bits=1000, k=3)
