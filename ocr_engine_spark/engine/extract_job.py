"""The extraction job: pages table -> extractions table.

Spark lifecycle (the DataFrame mirror of the reference's POST /ocr path,
``api_gateway.py:94-105`` -> ``services/surya/surya_service.py:83-135``):

  read pages (url, warc_ts, html, text, lang)
    -> payload-kind classification (magic bytes; JVM-side)
    -> repartition(P, xxhash64(url))         # load-balance kernel cost
    -> mapInPandas(extract_batch)            # ONE Arrow-batched Python
         html: DOM parse + densitometric block scoring
         pdf:  text-layer layout analysis
         + clean_text (5-step pipeline) in the same pass
         + per-doc timing, per-batch lineage counters
    -> provider + structured-field columns   # JVM regexp_extract, T13
    -> extractions DataFrame

No per-row Python UDFs anywhere: the only Python stage is one
``mapInPandas`` over whole Arrow batches (the reference's model-per-
request becomes kernel-per-worker: module import = the analog of the
reference's load-models-once-at-startup, surya_service.py:55-75).

Errors are data: a malformed payload yields status='error' + error
message, never a task failure (surya_service.py:150-158).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

from ocr_engine_spark.kernels.fields import FIELD_PATTERNS

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

SPAN_TYPE = ArrayType(StructType([
    StructField("start", LongType()),
    StructField("end", LongType()),
    StructField("block_id", LongType()),
    StructField("kind", StringType()),
]))

# result contract (the reference's OCRResponse shape, surya_service.py:47-53,
# widened with spans + lineage)
EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("payload_kind", StringType()),
    StructField("extracted_text", StringType()),
    StructField("clean_text", StringType()),
    StructField("spans", SPAN_TYPE),
    StructField("n_blocks", IntegerType()),
    # T4: mean per-block densitometric score — the OCRResponse.confidence
    # analog (surya_service.py:47-53, :119-127); null when no blocks
    StructField("confidence", DoubleType()),
    StructField("status", StringType()),
    StructField("error", StringType()),
    StructField("processing_ms", DoubleType()),
    StructField("partition_id", IntegerType()),
    StructField("batch_seq", IntegerType()),
])

# parity with the reference's upload size guard (Claude.md:204 — 50 MB
# max file size): oversized payloads become error RECORDS, not failures
MAX_PAYLOAD_BYTES = 50 * 1024 * 1024

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def extract_batch_arrow(batches):
    """The kernel stage over raw Arrow RecordBatches (``mapInArrow``).

    Chosen over mapInPandas deliberately: url/warc_ts/lang/partition_id
    pass through ZERO-COPY (no pandas object materialization either
    way), and the new columns are built with ``pa.array`` directly —
    measured ~25% less wall than the pandas form on a 32 KB-page corpus,
    all of it serialization overhead, none of it kernel work. Kernels
    import lazily per worker (the reference's load-models-once analog,
    surya_service.py:55-75).
    """
    import pyarrow as pa

    from ocr_engine_spark.kernels.clean import clean_text
    from ocr_engine_spark.kernels.html_extract import extract_html
    from ocr_engine_spark.kernels.pdf_extract import extract_pdf

    span_t = pa.list_(pa.struct([
        ("start", pa.int64()), ("end", pa.int64()),
        ("block_id", pa.int64()), ("kind", pa.string())]))
    batch_seq = 0
    for rb in batches:
        names = rb.schema.names
        col = {n: rb.column(i) for i, n in enumerate(names)}
        kinds, texts, cleans, spans_col, n_blocks = [], [], [], [], []
        confs, statuses, errors, times = [], [], [], []
        for payload in col["html"]:
            t0 = time.perf_counter()
            raw = payload.as_py() or b""
            if len(raw) > MAX_PAYLOAD_BYTES:
                kind = "oversize"
                res = {"text": None, "spans": [], "n_blocks": 0,
                       "confidence": None, "status": "error",
                       "error": f"payload exceeds {MAX_PAYLOAD_BYTES} "
                                f"bytes"}
            elif raw.startswith(b"%PDF"):
                kind = "pdf"
                res = extract_pdf(raw)
            else:
                kind = "html"
                res = extract_html(raw)
            txt = res["text"]
            kinds.append(kind)
            texts.append(txt)
            # delta encoding: clean_text crosses the Arrow socket only
            # when it differs from extracted_text (usually it doesn't —
            # extraction output is already tidy); the JVM-side coalesce
            # in extract_pages restores the full column byte-identically
            cleaned = clean_text(txt) if txt is not None else None
            cleans.append(cleaned if cleaned != txt else None)
            spans_col.append([(s["start"], s["end"], s["block_id"],
                               s["kind"]) for s in res["spans"]])
            n_blocks.append(res["n_blocks"])
            confs.append(res["confidence"])
            statuses.append(res["status"])
            errors.append(res["error"])
            times.append((time.perf_counter() - t0) * 1000.0)
        n = rb.num_rows
        yield pa.RecordBatch.from_arrays([
            col["url"], col["warc_ts"], col["lang"],
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(cleans, pa.string()),
            pa.array(spans_col, span_t),
            pa.array(n_blocks, pa.int32()),
            pa.array(confs, pa.float64()),
            pa.array(statuses, pa.string()),
            pa.array(errors, pa.string()),
            pa.array(times, pa.float64()),
            col["partition_id"],
            pa.array([batch_seq] * n, pa.int32()),
        ], names=[f.name for f in EXTRACT_SCHEMA.fields])
        batch_seq += 1


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas form of the kernel stage (kept as the readable
    reference implementation and for pandas-pipeline composition; the
    hot path uses extract_batch_arrow)."""
    # lazy per-worker init — executed once per Python worker process
    from ocr_engine_spark.kernels.clean import clean_text
    from ocr_engine_spark.kernels.html_extract import extract_html
    from ocr_engine_spark.kernels.pdf_extract import extract_pdf

    batch_seq = 0
    for pdf_batch in batches:
        n = len(pdf_batch)
        rows = {
            "url": pdf_batch["url"], "warc_ts": pdf_batch["warc_ts"],
            "lang": pdf_batch["lang"],
            "partition_id": pdf_batch["partition_id"],
        }
        kinds, texts, cleans, spans_col, n_blocks = [], [], [], [], []
        confs, statuses, errors, times = [], [], [], []
        for payload in pdf_batch["html"]:
            t0 = time.perf_counter()
            raw = bytes(payload) if payload is not None else b""
            if len(raw) > MAX_PAYLOAD_BYTES:
                kind = "oversize"
                res = {"text": None, "spans": [], "n_blocks": 0,
                       "confidence": None, "status": "error",
                       "error": f"payload exceeds {MAX_PAYLOAD_BYTES} "
                                f"bytes"}
            elif raw.startswith(b"%PDF"):
                kind = "pdf"
                res = extract_pdf(raw)
            else:
                kind = "html"
                res = extract_html(raw)
            txt = res["text"]
            kinds.append(kind)
            texts.append(txt)
            cleans.append(clean_text(txt) if txt is not None else None)
            spans_col.append(res["spans"])
            n_blocks.append(res["n_blocks"])
            confs.append(res["confidence"])
            statuses.append(res["status"])
            errors.append(res["error"])
            times.append((time.perf_counter() - t0) * 1000.0)
        out = pd.DataFrame({
            **{k: v.reset_index(drop=True) for k, v in rows.items()},
            "payload_kind": kinds, "extracted_text": texts,
            "clean_text": cleans, "spans": spans_col,
            "n_blocks": pd.array(n_blocks, dtype="int32"),
            "confidence": pd.array(confs, dtype="float64"),
            "status": statuses, "error": errors,
            "processing_ms": times,
            "batch_seq": pd.array([batch_seq] * n, dtype="int32"),
        })
        batch_seq += 1
        yield out[[f.name for f in EXTRACT_SCHEMA.fields]]


def provider_col(url=None) -> F.Column:
    """T11 — filename-substring provider detection (qwen_service.py:260),
    as a pure JVM expression. (No module-level Column objects: executors
    import this module inside the mapInPandas worker, where Column
    construction is unavailable.)"""
    u = F.lower(url if url is not None else F.col("url"))
    return (F.when(u.contains("dewa"), F.lit("DEWA"))
             .when(u.contains("sewa"), F.lit("SEWA"))
             .otherwise(F.lit("Unknown")))


_LITERAL_PREFIX_RE = __import__("re").compile(r"^[^\\\[\(\{\.\+\*\?\|\^\$]+")


def fields_columns(text_col: str = "clean_text") -> list[F.Column]:
    """T13 — structured fields as JVM-side regexp_extract expressions
    (shared pattern table with the pure kernel, kernels/fields.py).

    Each regex is guarded by a substring test on its literal prefix
    ('Account Number: ' etc.) — implied by any match, so the guard is a
    pure fast path: only the ~8% bill-like documents pay the 13 regex
    scans (measured: 30% of total extraction wall without the guards)."""
    cols = []
    for name, (pattern, typ) in FIELD_PATTERNS.items():
        m = _LITERAL_PREFIX_RE.match(pattern)
        needle = m.group(0) if m else ""
        # a literal whose last char is quantified (e.g. r'Fees?: ') is
        # NOT implied by a match — drop it from the required substring
        if needle and len(pattern) > len(needle) \
                and pattern[len(needle)] in "?*{":
            needle = needle[:-1]
        c = F.regexp_extract(F.col(text_col), pattern, 1)
        if needle:
            c = F.when(F.col(text_col).contains(needle), c)
        c = F.when(c == "", None).otherwise(c)
        if typ == "long":
            c = c.cast("long")
        elif typ == "double":
            c = c.cast("double")
        cols.append(c.alias(name))
    return cols


def raw_response_col(text_col: str = "clean_text") -> F.Column:
    """T13 fallback — the reference returns ``{"raw_response": raw_text}``
    when the LLM output fails to parse (qwen_service.py:245-252). Our
    deterministic analog: a provider-detected (bill-like) document on
    which EVERY field regex missed keeps its full cleaned text in
    ``raw_response`` (null otherwise — a non-bill page is never a parse
    *failure*, and carrying the text twice for every crawl page would
    double the sink at table scale).

    References the field and provider columns BY NAME, so it must be
    applied downstream of ``fields_columns()`` — each regex is then
    evaluated exactly once, never re-instantiated for the null check."""
    all_null = None
    for name in FIELD_PATTERNS:
        isnull = F.col(name).isNull()
        all_null = isnull if all_null is None else (all_null & isnull)
    bill_like = F.col("provider") != "Unknown"
    return F.when(bill_like & all_null, F.col(text_col))


def _local_input_bytes(df: DataFrame) -> int:
    """Total bytes of a LOCAL file-backed source (file listing only, no
    job). 0 = unknown/in-memory; -1 = remote store (trust its scan)."""
    import os
    from urllib.parse import unquote, urlparse
    total = 0
    for f in df.inputFiles():
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return -1
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return 0
    return total


def _max_partition_bytes(spark) -> int:
    import re as _re
    conf = spark.conf.get("spark.sql.files.maxPartitionBytes",
                          "134217728")
    # Spark size-config strings keep their suffix ('128m', '64MB', ...)
    m = _re.match(r"(\d+)\s*([kmgt]?)b?$", str(conf).strip().lower())
    if m:
        return int(m.group(1)) * (
            1024 ** {"": 0, "k": 1, "m": 2, "g": 3, "t": 4}[m.group(2)])
    return 134_217_728


def _estimated_scan_splits(df: DataFrame) -> int:
    """Metadata-only estimate of how many scan splits the source yields
    (total input bytes / spark.sql.files.maxPartitionBytes — file
    listing only, no job). In-memory sources (no files) and unreadable
    paths estimate 0, i.e. 'under-parallelized' — the safe local
    answer; a table-scale source estimates millions and is never
    shuffled for balance."""
    total = _local_input_bytes(df)
    if total < 0:
        return 1 << 30  # remote store: trust the scan's own splits
    max_bytes = _max_partition_bytes(df.sparkSession)
    return -(-total // max_bytes) if total else 0


def extract_pages(pages: DataFrame, *, partitions: int | None = None,
                  balance: bool | str = "auto",
                  with_fields: bool = True) -> DataFrame:
    """pages DataFrame -> extractions DataFrame.

    Load-balancing (``balance``): the kernel stage wants ~4 tasks per
    slot (per-doc cost varies ~10x between PDF layout and HTML; finer
    tasks amortize stragglers — measured 4x beats 2x by ~15% wall at
    local[32]). But an unconditional ``repartition`` shuffles the FULL
    payload bytes — at table scale that is a 100 TB shuffle bought only
    for load-balancing. Default ``"auto"`` therefore shuffles ONLY when
    the scan under-parallelizes (input splits < 4 tasks per executor
    slot — true for a small/one-file corpus, never true for a 10^12-row
    table whose scan yields millions of size-bounded splits). The 4x
    margin matters empirically, not just for stragglers: at pinned 8
    cores a one-file ~850 MB corpus yields ~13 64 MB splits, which
    clears an ``< slots`` test yet schedules as 2 ragged waves
    (+28% wall measured, and the 2->8 scaling leg drops below the
    north rule's 0.8 on exactly this cliff). ``True``/
    ``partitions=N`` force the shuffle (layout-known-bad inputs),
    ``False`` never shuffles. Hash key xxhash64(url) is skew-free by
    construction (urls unique); for host-keyed downstream ops use
    functions/skew.py salting.
    """
    spark = pages.sparkSession
    slots = spark.sparkContext.defaultParallelism
    staged = pages.select("url", "warc_ts", "html", "lang")  # column
    # pruning: never carry the naive `text` dump into the kernel stage
    do_shuffle = balance is True or partitions is not None
    if balance == "auto" and partitions is None and not staged.isStreaming:
        # (streaming input: micro-batch sizing governs parallelism —
        # never buy a balance shuffle, and inputFiles() is undefined)
        do_shuffle = _estimated_scan_splits(staged) < slots * 4
    if do_shuffle:
        p = partitions or slots * 4
        staged = staged.repartition(p, F.xxhash64("url"))
    staged = staged.withColumn("partition_id", F.spark_partition_id())
    out = staged.mapInArrow(extract_batch_arrow, EXTRACT_SCHEMA)
    # undo the kernel's clean_text delta encoding (null == "same as
    # extracted_text"); error rows have both null, which coalesce keeps
    out = out.withColumn("clean_text",
                         F.coalesce("clean_text", "extracted_text"))
    out = out.withColumn("provider", provider_col())
    if with_fields:
        out = (out.select("*", *fields_columns())
               .withColumn("raw_response", raw_response_col()))
    return out


def read_pages(spark: "SparkSession", path: str, *,
               autosplit: bool = True) -> DataFrame:
    """Catalog-agnostic pages scan (Iceberg table name or parquet path —
    sandbox has no Iceberg jars; see engine/catalog.py seam).

    ``autosplit`` (default on): when a LOCAL corpus layout
    under-parallelizes the scan (< 4 splits per executor slot — the
    one-big-file fixture regime), lower
    ``spark.sql.files.maxPartitionBytes`` so the SCAN ITSELF yields
    that parallelism instead of letting extract_pages' auto-balance
    buy a full-payload repartition. Measured at pinned cores on the
    36800-page corpus: the payload shuffle drags the 2->8 scaling leg
    from 0.89 to 0.73 and costs ~2x the whole JVM->Arrow plumbing —
    splitting at the source is strictly better whenever the layout
    allows it (parquet can't split finer than a row group; the fixture
    writer uses 512-row groups precisely so it can). Floor 16 MB so a
    tiny corpus never degenerates to per-row-group tasks. NOTE: this
    sets a SESSION conf (file-scan splits are decided at execution
    time, a per-read option does not exist) — it only ever lowers the
    value, and a 10^12-row table never triggers it (its scan already
    yields millions of splits). Remote stores are untouched."""
    df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    if autosplit:
        slots = spark.sparkContext.defaultParallelism
        total = _local_input_bytes(df)
        want = slots * 4
        if total > 0 and -(-total // _max_partition_bytes(spark)) < want:
            target = max(16 << 20, total // want)
            if target < _max_partition_bytes(spark):
                spark.conf.set("spark.sql.files.maxPartitionBytes",
                               str(int(target)))
                df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    return df
