"""WARC source: Common-Crawl archive files -> the canonical pages table.

The reference ingests documents one POST at a time (``api_gateway.py:94``);
at 10^12-document scale the unit of ingest is the WARC file (ISO 28500 —
the public format Common Crawl publishes). This connector turns a
directory of ``.warc`` / ``.warc.gz`` files into the exact pages shape
the extraction job consumes: ``(url, warc_ts, html, text, lang)``.

Spark-first design, scale notes:

* ``spark.read.format("binaryFile")`` assigns ONE FILE PER TASK — the
  natural parallelism unit for WARC (records are concatenated and
  gzip-member-framed, so a file is not byte-splittable without an index).
  Common-Crawl segment files are ~1 GB compressed; a 1000-executor
  cluster streams a full crawl as ~64k independent tasks with no shuffle.
* Record parsing happens in ONE ``mapInPandas`` stage (Arrow-batched,
  no per-row Python), emitting pages rows directly — the splitter and
  the downstream extraction kernel compose into a single Python stage
  when chained before any shuffle.
* ``.warc.gz`` uses one gzip member per record; Python's ``gzip``
  module decodes concatenated members in one call, so no member index
  is needed for the sequential whole-file scan.

Only ``WARC-Type: response`` (and ``resource``) records yield pages;
request/metadata/warcinfo records are skipped. The HTTP envelope of a
response record is stripped to its body. A malformed record ends the
scan of that file gracefully (crawl archives are append-truncated when
interrupted) — never a task failure.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from datetime import datetime, timezone
from typing import TYPE_CHECKING

import pandas as pd

from ocr_engine_spark.engine.extract_job import PAGES_SCHEMA

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] = WARC/1.0 version line
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return headers


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{url, warc_ts, payload}`` per response/resource record.

    Pure function over raw (already-decompressed) WARC bytes — the
    Spark-free core, property-tested round-trip against
    :func:`build_warc_bytes`.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLF padding
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # truncated / trailing garbage: stop gracefully
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated final record
        rec_type = headers.get(b"warc-type", b"")
        if rec_type in (b"response", b"resource"):
            payload = data[body_start:body_end]
            if rec_type == b"response":
                # strip the HTTP envelope (status line + headers)
                http_end = payload.find(_CRLF2)
                if http_end >= 0:
                    payload = payload[http_end + 4:]
            url = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace")
            ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
            try:
                ts = datetime.strptime(
                    ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
            except ValueError:
                ts = None
            yield {"url": url, "warc_ts": ts, "payload": payload}
        pos = body_end


def _maybe_gunzip(name: str, data: bytes) -> bytes:
    if name.endswith(".gz") or data[:2] == b"\x1f\x8b":
        # gzip decodes concatenated members (member-per-record framing)
        return gzip.decompress(data)
    return data


def read_warc(spark: "SparkSession", path: str) -> "DataFrame":
    """Directory (or glob) of WARC files -> pages DataFrame.

    Output schema is exactly ``PAGES_SCHEMA``; ``text`` and ``lang``
    are null (they are downstream products). Deterministic: rows come
    out in (file, record) order within each file-task.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def split_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                raw = _maybe_gunzip(name, bytes(blob))
                for rec in iter_warc_records(raw):
                    out.append({
                        "url": rec["url"],
                        "warc_ts": (rec["warc_ts"].replace(tzinfo=None)
                                    if rec["warc_ts"] else None),
                        "html": rec["payload"],
                        "text": None,
                        "lang": None,
                    })
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(split_files, schema=PAGES_SCHEMA)


def build_warc_bytes(records: list[dict], *, http_envelope: bool = True,
                     gzip_members: bool = False) -> bytes:
    """Serialize ``[{url, warc_ts, payload}]`` into WARC/1.0 bytes.

    Test/fixture twin of :func:`iter_warc_records` (and a usable sink
    for re-archiving). ``gzip_members=True`` emits the Common-Crawl
    member-per-record gzip framing.
    """
    chunks: list[bytes] = []
    for rec in records:
        payload: bytes = rec["payload"]
        if http_envelope:
            body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(payload)).encode()
                    + b"\r\n\r\n" + payload)
            rec_type = b"response"
        else:
            body = payload
            rec_type = b"resource"
        ts = rec.get("warc_ts")
        ts_s = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts
                else "2024-01-01T00:00:00Z")
        head = (b"WARC/1.0\r\n"
                b"WARC-Type: " + rec_type + b"\r\n"
                b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n"
                b"WARC-Date: " + ts_s.encode() + b"\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n"
                b"\r\n")
        member = head + body + b"\r\n\r\n"
        chunks.append(gzip.compress(member) if gzip_members else member)
    return b"".join(chunks)
