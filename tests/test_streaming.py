"""Streaming twin of the extraction job: same results as batch, resume
via the streaming commit log, watermarked windowed metrics."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.engine.extract_job import extract_pages, read_pages
from ocr_engine_spark.streaming.stream_job import (
    read_pages_stream, start_extraction_stream,
    start_windowed_metrics_stream,
)


@pytest.fixture()
def workdir(tmp_path, corpus_dir):
    """Stream-source layout: the corpus parquet file copied into a
    directory the file source watches."""
    src = tmp_path / "pages_in"
    src.mkdir()
    shutil.copy(os.path.join(corpus_dir, "pages.parquet"),
                src / "part-000.parquet")
    return tmp_path


def test_stream_matches_batch(spark, workdir, pages_df):
    out = str(workdir / "extractions")
    ckpt = str(workdir / "ckpt")
    stream = read_pages_stream(spark, str(workdir / "pages_in"))
    q = start_extraction_stream(stream, out, ckpt, partitions=8)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    want = extract_pages(pages_df)
    assert got.count() == want.count()
    # byte-identical extracted text per url, streaming vs batch
    joined = (got.select("url", F.col("extracted_text").alias("s_text"))
              .join(want.select("url",
                                F.col("extracted_text").alias("b_text")),
                    "url"))
    assert joined.filter(
        ~(F.col("s_text").eqNullSafe(F.col("b_text")))).count() == 0


def test_stream_resume_no_duplicates(spark, workdir):
    """Restarting a finished availableNow stream reprocesses nothing
    (commit-log resume); adding a new file processes only that file."""
    out = str(workdir / "extractions")
    ckpt = str(workdir / "ckpt")
    src = str(workdir / "pages_in")
    q = start_extraction_stream(read_pages_stream(spark, src), out, ckpt,
                                partitions=8)
    q.awaitTermination(180)
    n1 = spark.read.parquet(out).count()
    # restart with no new input -> no new rows
    q2 = start_extraction_stream(read_pages_stream(spark, src), out, ckpt,
                                 partitions=8)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == n1
    # drop in one more file -> only its rows are appended
    shutil.copy(os.path.join(src, "part-000.parquet"),
                os.path.join(src, "part-001.parquet"))
    q3 = start_extraction_stream(read_pages_stream(spark, src), out, ckpt,
                                 partitions=8)
    q3.awaitTermination(180)
    total = spark.read.parquet(out).count()
    assert total == 2 * n1
    # urls are duplicated exactly once (same file twice) — the batch
    # dedupe guard (dropDuplicates) stays downstream, as in the catalog
    dups = (spark.read.parquet(out).groupBy("url").count()
            .filter(F.col("count") != 2).count())
    assert dups == 0


def test_windowed_metrics_finalize(spark, workdir):
    out = str(workdir / "metrics")
    ckpt = str(workdir / "mckpt")
    stream = read_pages_stream(spark, str(workdir / "pages_in"))
    q = start_windowed_metrics_stream(stream, out, ckpt, window="1 day",
                                      watermark="0 seconds")
    q.awaitTermination(180)
    m = spark.read.parquet(out)
    # append mode emits only watermark-finalized windows; with a zero
    # watermark every window but the max-event-time one finalizes
    assert m.count() > 0
    assert {r.payload_kind for r in m.select("payload_kind").distinct()
            .collect()} <= {"html", "pdf"}
    assert m.filter(F.col("n_docs") <= 0).count() == 0
    assert m.filter(F.col("n_success") > F.col("n_docs")).count() == 0
