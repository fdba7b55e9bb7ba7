"""Epoch-shuffle tests (sample.shuffle_corpus): exact permutation,
seed independence, determinism across partitioning, hash-order match."""

import hashlib
import os

import pyspark.sql.functions as F

from ocr_engine_spark.functions.sample import shuffle_corpus
from tests.conftest import TESTDATA_SF001


def _docs(spark, n=60):
    return spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < n).select("doc_id", "text")


def _want_order(ids, seed):
    k = lambda i: hashlib.md5(f"{seed}\x1f{i}".encode()).hexdigest()
    return [i for i in sorted(ids, key=lambda i: (k(i), i))]


def test_shuffle_is_exact_hash_permutation(spark):
    df = _docs(spark)
    out = shuffle_corpus(df, seed=7).collect()
    ids = [r.doc_id for r in df.collect()]
    assert sorted(r.shuffle_pos for r in out) == list(range(len(ids)))
    got = [r.doc_id for r in sorted(out, key=lambda r: r.shuffle_pos)]
    assert got == _want_order(ids, 7)


def test_shuffle_seeds_differ_and_rerun_stable(spark):
    df = _docs(spark)
    o1 = {r.doc_id: r.shuffle_pos for r in
          shuffle_corpus(df, seed=1).collect()}
    o1b = {r.doc_id: r.shuffle_pos for r in
           shuffle_corpus(df.repartition(5), seed=1,
                          partitions=3).collect()}
    o2 = {r.doc_id: r.shuffle_pos for r in
          shuffle_corpus(df, seed=2).collect()}
    assert o1 == o1b          # partitioning-independent, rerun-stable
    assert o1 != o2           # a new seed is a new permutation


def test_shuffle_empty_input(spark):
    df = _docs(spark).filter(F.lit(False))
    out = shuffle_corpus(df, seed=0)
    assert out.count() == 0
    assert "shuffle_pos" in out.columns
