"""Sequence-packing tests: content-exact packing vs a driver-side
reference, bounded-window plan shape."""

import os

import pyspark.sql.functions as F

from ocr_engine_spark.functions.pack import (
    EOD_ID, pack_sequences, token_ids_col,
)
from tests.conftest import TESTDATA_SF001


def test_pack_sequences_content_exact(spark):
    """Every complete sequence must equal the corresponding slice of
    the doc-order token concatenation (built independently from the
    per-doc token arrays)."""
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < 40)
    per_doc = {r.doc_id: list(r.ids) for r in docs.select(
        "doc_id", token_ids_col(F.col("text")).alias("ids")).collect()}
    stream = []
    for did in sorted(per_doc):
        stream.extend(per_doc[did])
    L = 64
    expected = {i: stream[i * L:(i + 1) * L]
                for i in range(len(stream) // L)}
    got = {r.seq_id: list(r.tokens)
           for r in pack_sequences(docs, seq_len=L).collect()}
    assert got == expected
    assert all(len(t) == L for t in got.values())
    # EOD separators survived packing
    assert sum(t.count(EOD_ID) for t in got.values()) \
        == sum(1 for i in range(len(stream) // L * L)
               if stream[i] == EOD_ID)


def test_pack_prefix_sum_is_bucketed(spark):
    """The global prefix sum must run as a WITHIN-bucket window (never
    a single-partition global orderBy window)."""
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < 40)
    plan = pack_sequences(docs, seq_len=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "windowspecdefinition(__bkt" in plan
