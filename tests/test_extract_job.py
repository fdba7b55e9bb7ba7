"""End-to-end Spark extraction job tests: the byte-identity gate."""

import pyspark.sql.functions as F


def test_extraction_byte_identical_on_clean_corpus(extractions_df, golden_df):
    """Every clean page's extracted text must equal its golden byte-for-
    byte — the north_rule invariant (the Spark analog of the reference's
    CER==0 claim on its golden fixtures, README.md:8)."""
    joined = extractions_df.join(
        F.broadcast(golden_df.select("url", "raw_text", "clean_text"
                                     ).withColumnRenamed("clean_text", "g_clean")),
        "url", "inner")
    n_golden = golden_df.count()
    n_joined = joined.count()
    assert n_joined == n_golden
    mismatches = joined.filter(
        (F.col("extracted_text") != F.col("raw_text"))
        | (F.col("clean_text") != F.col("g_clean"))).count()
    assert mismatches == 0
    assert joined.filter(F.col("status") != "success").count() == 0


def test_spans_match_golden(extractions_df, golden_df):
    joined = extractions_df.select("url", "spans").join(
        golden_df.select("url", F.col("spans").alias("g_spans")), "url")
    bad = joined.filter(F.to_json("spans") != F.to_json("g_spans")).count()
    assert bad == 0


def test_fields_match_golden(extractions_df, golden_fields_df):
    from ocr_engine_spark.kernels.fields import FIELD_PATTERNS
    field_names = list(FIELD_PATTERNS)
    ours = extractions_df.select("url", *field_names)
    golden = golden_fields_df
    joined = ours.join(
        F.broadcast(golden.select(
            "url", *[F.col(c).alias(f"g_{c}") for c in field_names])),
        "url", "inner")
    assert joined.count() == golden.count()
    for c in field_names:
        bad = joined.filter(
            ~(F.col(c).eqNullSafe(F.col(f"g_{c}")))).count()
        assert bad == 0, f"field mismatch: {c}"


def test_provider_detection_column(extractions_df):
    rows = extractions_df.filter(F.col("url").contains("/bills/")).select(
        "url", "provider").collect()
    assert rows
    for r in rows:
        assert (("dewa" in r.url) == (r.provider == "DEWA"))
        assert (("sewa" in r.url) == (r.provider == "SEWA"))


def test_errors_are_data_not_failures(spark):
    """Poison payloads produce status='error' rows, never task failures
    (surya_service.py:150-158 discipline)."""
    import datetime
    from ocr_engine_spark.engine.extract_job import PAGES_SCHEMA, extract_pages
    ts = datetime.datetime(2025, 5, 1)
    rows = [
        ("u://good", ts, b"<body><p>good page with plenty of words to "
                         b"pass the content threshold here</p></body>",
         "", "en"),
        ("u://null-payload", ts, None, "", "en"),
        ("u://pdf-garbage.pdf", ts, b"%PDF-1.4\x00\xff garbage", "", "en"),
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = extract_pages(df).select("url", "status", "extracted_text").collect()
    by_url = {r.url: r for r in out}
    assert by_url["u://good"].status == "success"
    assert len(out) == 3  # nothing dropped, nothing raised


def test_no_per_row_python_in_plan(pages_df):
    """The physical plan must contain exactly one Arrow-batched Python
    stage (mapInArrow) and no row-at-a-time PythonUDF/BatchEvalPython
    (input_hint: 'no per-row Python'). Also: the shuffle feeding the
    kernel must never carry the naive `text` dump (column pruning)."""
    from ocr_engine_spark.engine.extract_job import extract_pages
    # partitions=7 keeps this logical plan distinct from the session-
    # cached extractions_df fixture (no InMemoryRelation substitution)
    df = extract_pages(pages_df, partitions=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1
    scan_line = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    assert ",text#" not in scan_line and "[text#" not in scan_line


def test_lineage_columns_present(extractions_df):
    import pyspark.sql.functions as F
    stats = extractions_df.agg(
        F.countDistinct("partition_id").alias("nparts"),
        F.min("processing_ms").alias("min_ms")).collect()[0]
    assert stats.nparts >= 1
    assert stats.min_ms >= 0.0


def test_confidence_column(extractions_df):
    """T4 parity: per-doc mean block confidence in [0,1], non-null
    whenever blocks were emitted, null on empty/error docs."""
    stats = extractions_df.agg(
        F.min("confidence").alias("lo"), F.max("confidence").alias("hi"),
        F.sum(((F.col("n_blocks") > 0) & F.col("confidence").isNull())
              .cast("long")).alias("n_missing")).collect()[0]
    assert stats.n_missing == 0
    assert 0.0 <= stats.lo <= stats.hi <= 1.0
    # deterministic: two runs agree exactly
    a = {r.url: r.confidence
         for r in extractions_df.select("url", "confidence").collect()}
    assert len(set(a.values())) > 1  # not a constant column


def test_raw_response_fallback(spark):
    """T13 parity (qwen_service.py:245-252): a bill-like (provider-
    detected) document where every field regex misses carries its full
    cleaned text in raw_response; parsed bills and non-bill pages get
    null."""
    import datetime
    from ocr_engine_spark.engine.extract_job import PAGES_SCHEMA, extract_pages
    from ocr_engine_spark.kernels.fields import extract_fields
    ts = datetime.datetime(2025, 5, 1)
    filler = b" where the neighbours rescue pass needs plenty of words"
    rows = [
        ("u://bills/dewa_unparseable.html", ts,
         b"<body><p>Dear customer your statement could not be itemised"
         + filler + b"</p></body>", "", "en"),
        ("u://bills/dewa_ok.html", ts,
         b"<body><p>Account Number: 2052672303 for this billing cycle"
         + filler + b"</p></body>", "", "en"),
        ("u://blog/post.html", ts,
         b"<body><p>An ordinary web page about nothing in particular"
         + filler + b"</p></body>", "", "en"),
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    got = {r.url: r for r in extract_pages(df)
           .select("url", "clean_text", "account_number",
                   "raw_response").collect()}
    unparse = got["u://bills/dewa_unparseable.html"]
    assert unparse.raw_response == unparse.clean_text
    assert got["u://bills/dewa_ok.html"].raw_response is None
    assert got["u://bills/dewa_ok.html"].account_number == "2052672303"
    assert got["u://blog/post.html"].raw_response is None
    # pure-kernel twin agrees (shared rule)
    k = extract_fields(unparse.clean_text,
                       url="u://bills/dewa_unparseable.html")
    assert k["raw_response"] == unparse.clean_text
    k2 = extract_fields(got["u://blog/post.html"].clean_text,
                        url="u://blog/post.html")
    assert k2["raw_response"] is None


def test_balance_modes_plan(pages_df):
    """'auto' shuffles only when the scan under-parallelizes; False
    never buys the full-payload shuffle (the default path at table
    scale has NO Exchange before the kernel stage)."""
    from ocr_engine_spark.engine.extract_job import extract_pages

    def upto_kernel(plan: str) -> str:
        return plan.split("MapInArrow")[-1]  # below = upstream of kernel

    never = extract_pages(pages_df, balance=False, with_fields=False)
    plan_never = never._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in upto_kernel(plan_never)
    forced = extract_pages(pages_df, balance=True, with_fields=False)
    plan_forced = forced._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in upto_kernel(plan_forced)
    # this corpus is one small file -> fewer scan splits than slots ->
    # auto must load-balance
    auto = extract_pages(pages_df, with_fields=False)
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in upto_kernel(plan_auto)


def test_auto_balance_wants_four_tasks_per_slot(pages_df, monkeypatch):
    """Regression for the 2->8 scaling cliff: a scan whose split count
    clears `slots` but not `4*slots` schedules as ~2 ragged waves
    (+28% wall measured at pinned 8 cores on a one-file 850 MB corpus),
    so 'auto' must still buy the balance shuffle in that band — and
    must NOT once the scan yields >= 4 tasks per slot (the table-scale
    regime, where the shuffle would move the full payload bytes)."""
    from ocr_engine_spark.engine import extract_job

    def upto_kernel(plan: str) -> str:
        return plan.split("MapInArrow")[-1]

    slots = pages_df.sparkSession.sparkContext.defaultParallelism
    monkeypatch.setattr(extract_job, "_estimated_scan_splits",
                        lambda df: slots * 2)
    ragged = extract_job.extract_pages(pages_df, with_fields=False)
    plan = ragged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in upto_kernel(plan)

    monkeypatch.setattr(extract_job, "_estimated_scan_splits",
                        lambda df: slots * 4)
    wide = extract_job.extract_pages(pages_df, with_fields=False)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in upto_kernel(plan)


def test_oversize_payload_guard(monkeypatch):
    """Reference parity (Claude.md:204, 50 MB upload cap): oversized
    payloads become error records without entering the kernels. Tested
    through the in-process pandas kernel with a lowered cap."""
    import pandas as pd
    from ocr_engine_spark.engine import extract_job as ej
    monkeypatch.setattr(ej, "MAX_PAYLOAD_BYTES", 4096)
    pdf = pd.DataFrame({
        "url": ["u://big", "u://ok"],
        "warc_ts": [pd.Timestamp("2025-05-01")] * 2,
        "html": [b"x" * 5000,
                 b"<p>small page with plenty of words to pass the "
                 b"content threshold in one block</p>"],
        "lang": ["en", "en"], "partition_id": [0, 0]})
    out = next(ej.extract_batch(iter([pdf])))
    big, ok = out.iloc[0], out.iloc[1]
    assert big.status == "error" and "exceeds" in big.error
    assert big.payload_kind == "oversize" and big.extracted_text is None
    assert ok.status == "success"


def test_read_pages_autosplit(spark, tmp_path):
    """A one-file corpus that would under-parallelize the scan gets
    split at the SOURCE (maxPartitionBytes lowered) so auto-balance
    never buys the full-payload shuffle; the resulting plan has no
    Exchange before the kernel stage and >= 4 tasks/slot when row
    groups allow it."""
    from ocr_engine_spark.engine.extract_job import (
        extract_pages, read_pages,
    )
    from ocr_engine_spark.fixtures.gen_pages import write

    corpus = str(tmp_path / "pages_autosplit")
    # Common-Crawl page weight so the one file clears the 16 MB split
    # floor (a truly tiny corpus stays one split and falls back to the
    # cheap balance shuffle in extract_pages — also asserted below)
    write(corpus, n_pages=1200, seed=7, para_scale=48)
    before = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        pages = read_pages(spark, corpus + "/pages.parquet")
        slots = spark.sparkContext.defaultParallelism
        n_splits = pages.rdd.getNumPartitions()
        assert n_splits > 1  # source-split fired
        assert int(spark.conf.get(
            "spark.sql.files.maxPartitionBytes")) >= 16 << 20
        out = extract_pages(pages, with_fields=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        below_kernel = plan.split("MapInArrow")[-1]
        if n_splits >= slots * 4:
            assert "Exchange" not in below_kernel
        assert out.count() == pages.count()  # generator adds variants

        # tiny corpus: floor keeps it one split; auto-balance still
        # buys the (cheap) shuffle downstream
        tiny = str(tmp_path / "pages_tiny")
        write(tiny, n_pages=60, seed=7)
        tpages = read_pages(spark, tiny + "/pages.parquet")
        assert tpages.rdd.getNumPartitions() == 1
        tplan = (extract_pages(tpages, with_fields=False)
                 ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" in tplan.split("MapInArrow")[-1]
    finally:
        if before is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", before)
