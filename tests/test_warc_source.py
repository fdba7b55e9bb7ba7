"""WARC source tests: record parsing, gzip framing, Spark round-trip."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
import pytest

from ocr_engine_spark.sources.warc import (
    build_warc_bytes, iter_warc_records, read_warc,
)

RECORDS = [
    {"url": f"https://example.org/page/{i}",
     "warc_ts": datetime(2024, 3, 1 + i, 12, 0, 0),
     "payload": (f"<html><body><p>doc {i} body text that is long enough "
                 f"to matter</p></body></html>").encode()}
    for i in range(5)
]


def test_roundtrip_plain():
    data = build_warc_bytes(RECORDS)
    out = list(iter_warc_records(data))
    assert [r["url"] for r in out] == [r["url"] for r in RECORDS]
    assert [r["payload"] for r in out] == [r["payload"] for r in RECORDS]
    assert out[0]["warc_ts"].year == 2024


def test_roundtrip_gzip_members():
    import gzip
    data = build_warc_bytes(RECORDS, gzip_members=True)
    out = list(iter_warc_records(gzip.decompress(data)))
    assert [r["payload"] for r in out] == [r["payload"] for r in RECORDS]


def test_resource_records_have_no_http_envelope():
    data = build_warc_bytes(RECORDS, http_envelope=False)
    out = list(iter_warc_records(data))
    assert [r["payload"] for r in out] == [r["payload"] for r in RECORDS]


def test_non_page_records_skipped_and_truncation_graceful():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    data = info + build_warc_bytes(RECORDS[:2])
    out = list(iter_warc_records(data))
    assert len(out) == 2
    # truncated mid-record: earlier records still come out
    out2 = list(iter_warc_records(data[:-20]))
    assert len(out2) >= 1
    assert list(iter_warc_records(b"garbage not warc")) == []


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc_spark_roundtrip(spark, tmp_path, gz):
    ext = "warc.gz" if gz else "warc"
    # two files -> two file-tasks
    p1 = tmp_path / f"part-0.{ext}"
    p2 = tmp_path / f"part-1.{ext}"
    p1.write_bytes(build_warc_bytes(RECORDS[:3], gzip_members=gz))
    p2.write_bytes(build_warc_bytes(RECORDS[3:], gzip_members=gz))
    df = read_warc(spark, str(tmp_path))
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == len(RECORDS)
    for rec in RECORDS:
        row = rows[rec["url"]]
        assert bytes(row.html) == rec["payload"]
        assert row.warc_ts == rec["warc_ts"]
        assert row.text is None and row.lang is None


def test_warc_feeds_extraction_job(spark, tmp_path):
    """WARC files -> pages -> the extraction job, end to end."""
    from ocr_engine_spark.engine.extract_job import extract_pages
    path = tmp_path / "seg.warc"
    path.write_bytes(build_warc_bytes(RECORDS))
    pages = read_warc(spark, str(tmp_path))
    out = extract_pages(pages)
    got = {r.url: r for r in out.collect()}
    assert len(got) == len(RECORDS)
    for i, rec in enumerate(RECORDS):
        r = got[rec["url"]]
        assert r.status == "success"
        assert f"doc {i} body text" in r.extracted_text
