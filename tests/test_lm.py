"""LM-perplexity filter tests (functions/lm.py): bigram extraction,
count-model math vs a pure-Python reference, bucket boundary exactness,
and determinism across partitioning."""

import math
import os
import re

import pyspark.sql.functions as F

from ocr_engine_spark.functions.lm import (
    bigram_pairs, doc_log_ppl, fit_bigram_lm, ppl_bucket,
)
from tests.conftest import TESTDATA_SF001

V = 64


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _h60(s):
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pairs(s):
    t = _tok(s)
    return [(_h60(c) % V, _h60(w) % V) for c, w in zip(t, t[1:])]


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bigram_pairs_match_python(spark):
    rows = [(0, "the cat sat on the mat"), (1, "one"), (2, ""),
            (3, "a b"), (4, None)]
    # null text -> no tokens -> no pairs (filter upfront like callers do)
    df = _docs(spark, rows).filter(F.col("text").isNotNull())
    got = sorted((r.doc_id, r.cb, r.wb) for r in
                 bigram_pairs(df, buckets=V).collect())
    want = sorted((i, cb, wb) for i, s in rows if s is not None
                  for cb, wb in _pairs(s))
    assert got == want  # 1-token and empty docs emit nothing


def test_doc_log_ppl_matches_python_model(spark):
    """Spark's fixed-point scores equal a transparent Python replay of
    the add-alpha hashed bigram model."""
    ref_rows = [(100, "the cat sat on the mat"),
                (101, "the dog sat on the log"),
                (102, "cats and dogs run fast")]
    doc_rows = [(0, "the cat sat"), (1, "quantum flux capacitor whirr"),
                (2, "the dog sat on the mat")]
    alpha = 0.5
    ref = _docs(spark, ref_rows)
    docs = _docs(spark, doc_rows)
    ctx_df, big_df = fit_bigram_lm(ref, buckets=V)
    got = {r.doc_id: (r.n_bigrams, r.nll_micro, r.log_ppl_micro)
           for r in doc_log_ppl(docs, ctx_df, big_df, buckets=V,
                                alpha=alpha).collect()}

    ctx, big = {}, {}
    for _, s in ref_rows:
        for cb, wb in _pairs(s):
            ctx[cb] = ctx.get(cb, 0) + 1
            big[(cb, wb)] = big.get((cb, wb), 0) + 1
    want = {}
    for i, s in doc_rows:
        lps = [round(math.log((big.get((cb, wb), 0) + alpha)
                              / (ctx.get(cb, 0) + alpha * V)) * 1e6)
               for cb, wb in _pairs(s)]
        if lps:
            nll = -sum(lps)
            want[i] = (len(lps), nll, nll // len(lps))
    assert got == want
    # the out-of-domain doc scores strictly worse than the in-domain one
    assert got[1][2] > got[0][2]


def test_ppl_bucket_boundaries_and_order(spark):
    """Ranks are 1..N ascending by (score, id); bucket sizes follow the
    integer-percent cutoffs exactly."""
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < 40).select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") < 10)
    out = ppl_bucket(docs, ref, buckets=256, head_pct=30,
                     middle_pct=40).collect()
    n = len(out)
    assert n > 0
    ranks = sorted(r.ppl_rank for r in out)
    assert ranks == list(range(1, n + 1))
    by_rank = sorted(out, key=lambda r: r.ppl_rank)
    scores = [(r.log_ppl_micro, r.doc_id) for r in by_rank]
    assert scores == sorted(scores)
    head_n, mid_n = n * 30 // 100, n * 70 // 100
    for r in by_rank:
        want = ("head" if r.ppl_rank <= head_n
                else "middle" if r.ppl_rank <= mid_n else "tail")
        assert r.bucket == want


def test_ppl_bucket_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < 30).select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    a = ppl_bucket(docs, ref, buckets=128).collect()
    b = ppl_bucket(docs.repartition(7).orderBy(F.rand(1)), ref,
                   buckets=128, partitions=3).collect()
    key = lambda rows: sorted((r.doc_id, r.n_bigrams, r.log_ppl_micro,
                               r.ppl_rank, r.bucket) for r in rows)
    assert key(a) == key(b)
