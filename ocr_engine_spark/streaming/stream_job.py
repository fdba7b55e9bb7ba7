"""Structured Streaming wrapper over the batch extraction core.

The reference has no streaming semantics — its "batch" endpoint is a
bounded loop (api_gateway.py:174-196) and resumability is
restart-on-failure (railway.json:7-9). Our batch job therefore carries
the primary resume story (engine/catalog.py). This module is the
continuous-ingest form of the SAME core: because ``extract_pages`` is a
pure DataFrame->DataFrame function, it lifts into ``readStream`` ->
``writeStream`` unchanged — one code path for both modes.

Scale notes:
  * file-source streaming with ``maxFilesPerTrigger`` bounds micro-batch
    memory; at 10^12 docs the source would be Kafka/Iceberg incremental
    scan, same plan after the source node
  * exactly-once to the parquet sink comes from the streaming commit log
    (checkpointLocation) — the streaming twin of the ManifestCatalog
    batch markers
  * the watermarked windowed aggregate tolerates late WARC captures
    (event time = warc_ts), emitting finalized per-window metrics
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_engine_spark.engine.extract_job import PAGES_SCHEMA, extract_pages


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of a pages directory (schema fixed by the
    input-table contract; file source requires an explicit schema)."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def extract_stream(pages: DataFrame, *, partitions: int | None = None
                   ) -> DataFrame:
    """The batch extraction core applied to a streaming DataFrame —
    identical plan after the source node (mapInPandas is
    streaming-compatible; the repartition becomes a per-micro-batch
    shuffle)."""
    return extract_pages(pages, partitions=partitions)


def start_extraction_stream(pages_stream: DataFrame, output_path: str,
                            checkpoint_path: str, *,
                            available_now: bool = True,
                            partitions: int | None = None):
    """extractions sink with exactly-once commit-log semantics. With
    ``available_now`` the stream drains all pending input then stops —
    the bounded-backfill mode; otherwise it runs continuously."""
    out = extract_stream(pages_stream, partitions=partitions)
    w = (out.writeStream.format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_metrics_stream(pages_stream: DataFrame, *,
                            window: str = "1 day",
                            watermark: str = "2 days",
                            partitions: int | None = None) -> DataFrame:
    """Per-capture-window extraction metrics with late-data tolerance:
    event time = warc_ts, watermark bounds state. Append-mode windows
    finalize once the watermark passes — the streaming twin of the
    batch metrics side table."""
    out = extract_stream(pages_stream, partitions=partitions)
    return (out.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     F.col("payload_kind"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("status") == "success").cast("long"))
                  .alias("n_success"),
                 F.round(F.avg("processing_ms"), 3).alias("avg_ms"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "payload_kind", "n_docs", "n_success", "avg_ms"))


def start_windowed_metrics_stream(pages_stream: DataFrame, output_path: str,
                                  checkpoint_path: str, *,
                                  window: str = "1 day",
                                  watermark: str = "2 days",
                                  available_now: bool = True):
    m = windowed_metrics_stream(pages_stream, window=window,
                                watermark=watermark)
    w = (m.writeStream.format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
