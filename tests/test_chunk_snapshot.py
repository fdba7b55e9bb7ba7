"""Chunking and snapshot-diff tests."""

import re

import pyspark.sql.functions as F
import pytest

from ocr_engine_spark.functions.chunk import chunk_documents
from ocr_engine_spark.functions.snapshot import (
    keep_latest_revision, snapshot_delta_summary, snapshot_diff,
)


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _want_chunks(s, size, stride):
    t = _tok(s)
    out = []
    k = 0
    while k * stride < len(t):
        w = t[k * stride: k * stride + size]
        out.append((k, k * stride + 1, len(w), " ".join(w)))
        k += 1
    return out


@pytest.mark.parametrize("size,stride", [(4, 2), (3, 3), (5, 1), (2, 4)])
def test_chunk_documents_matches_python(spark, size, stride):
    rows = [(0, "a b c d e f g h i j"), (1, "one two three"),
            (2, "solo"), (3, ""), (4, "x " * 7)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted((r.doc_id, r.chunk_id, r.tok_start, r.n_tokens,
                  r.chunk_text)
                 for r in chunk_documents(df, chunk_tokens=size,
                                          stride=stride).collect())
    want = sorted((i, *c) for i, s in rows
                  for c in _want_chunks(s, size, stride))
    assert got == want


def test_chunk_every_token_covered_once_when_partitioning(spark):
    """stride == chunk_tokens partitions the token stream exactly."""
    df = spark.createDataFrame([(0, " ".join(f"t{i}" for i in range(23)))],
                               ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=5, stride=5).collect()
    toks = [t for r in sorted(out, key=lambda r: r.chunk_id)
            for t in r.chunk_text.split(" ")]
    assert toks == [f"t{i}" for i in range(23)]


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=0)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "old text"), ("u3", "gone")],
        ["url", "text"])
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "new text"), ("u4", "fresh")],
        ["url", "text"])
    got = {r.url: r.status
           for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}
    summary = {r.status: r.n_keys
               for r in snapshot_delta_summary(old, new).collect()}
    assert summary == {"unchanged": 1, "changed": 1,
                       "removed": 1, "added": 1}


def test_keep_latest_revision_picks_freshest_per_canonical_url(spark):
    import datetime as dt

    def ts(d):
        return dt.datetime(2024, 1, d)

    rows = [
        # same canonical url via fragment variants: fresh one wins
        ("http://A.example/x#frag", ts(3), "fresh"),
        ("http://a.example/x", ts(1), "stale"),
        # timestamp tie INSIDE one canonical group (fragment variants
        # merge): raw-url string breaks it deterministically
        ("http://b.example/y#p1", ts(2), "tie-b1"),
        ("http://b.example/y#p2", ts(2), "tie-b2"),
        # singleton passes through
        ("http://c.example/z", ts(5), "only"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "text"])
    got = {r.canonical_url: r for r in keep_latest_revision(df).collect()}
    assert got["http://a.example/x"].text == "fresh"
    assert got["http://a.example/x"].n_revisions == 2
    # '#p2' > '#p1' lexicographically on the raw-url tie-break
    assert got["http://b.example/y"].text == "tie-b2"
    assert got["http://b.example/y"].n_revisions == 2
    assert got["http://c.example/z"].text == "only"
    assert got["http://c.example/z"].n_revisions == 1


def test_keep_latest_revision_custom_key(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [("k1", dt.datetime(2024, 1, 1), "old"),
         ("k1", dt.datetime(2024, 1, 2), "new"),
         ("k2", dt.datetime(2024, 1, 1), "solo")],
        ["doc_key", "warc_ts", "text"])
    got = {r.canonical_url: r.text
           for r in keep_latest_revision(df, key_col="doc_key").collect()}
    assert got == {"k1": "new", "k2": "solo"}


def test_keep_latest_revision_reapplies_to_own_output(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [("http://a.example/x", dt.datetime(2024, 1, 1), "v1"),
         ("http://a.example/x#m", dt.datetime(2024, 1, 2), "v2")],
        ["url", "warc_ts", "text"])
    once = keep_latest_revision(df)
    new_dump = spark.createDataFrame(
        [("http://a.example/x", dt.datetime(2024, 1, 5), "v3", 1)],
        ["url", "warc_ts", "text", "n_revisions"]) \
        .withColumn("canonical_url", F.col("url"))
    again = keep_latest_revision(
        once.unionByName(new_dump.select(*once.columns)))
    rows = again.collect()
    # no AMBIGUOUS_REFERENCE: output owns canonical_url/n_revisions
    assert again.columns.count("canonical_url") == 1
    assert len(rows) == 1
    assert rows[0]["text"] == "v3"
    assert rows[0]["n_revisions"] == 2  # counts within THIS input


def test_novelty_curve_detects_recrawl(spark):
    from ocr_engine_spark.functions.snapshot import novelty_curve
    rows = [(i, f"fresh text {i}") for i in range(100)]
    rows += [(100 + i, f"fresh text {i}") for i in range(50)]  # reuse
    rows += [(150 + i, f"late fresh {i}") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["bucket"]: r for r in
           novelty_curve(docs, bucket_docs=50).collect()}
    assert got[0]["novel_ppm"] == 1_000_000
    assert got[1]["novel_ppm"] == 1_000_000
    assert got[2]["novel_ppm"] == 0          # pure re-crawl bucket
    assert got[3]["novel_ppm"] == 1_000_000  # recovery
    assert got[2]["n_docs"] == 50 and got[2]["n_novel"] == 0
