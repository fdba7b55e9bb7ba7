"""Crawl snapshot diff — classify every key between two corpus
snapshots as added / removed / changed / unchanged by content
fingerprint. The continuous-crawl bookkeeping step: each new
Common-Crawl-style dump is diffed against the previous one so
downstream stages (dedup index update, re-extraction, re-embedding)
touch only `added` + `changed` keys instead of the whole corpus —
the batch analog of the streaming MinHashIndex incremental path
(functions/dedup.py).

Scale shape: fingerprints are computed map-side (md5 — the repo's
portable oracle hash; xxhash64 is the drop-in at scale where DuckDB
replay isn't needed); the diff is ONE full-outer shuffle join on the
key — the minimum any snapshot comparison needs — and the summary is
a map-side-combined count. With both snapshots bucketed/partitioned
by the key (catalog.write_bucketed), the join is Exchange-free.

Reference parity: none (the reference serves single requests); this
is continuous-ingest layer work the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, *,
                  key_col: str = "url", text_col: str = "text"
                  ) -> DataFrame:
    """(key, status, old_fp, new_fp) for every key in either snapshot:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    fingerprints differ), ``unchanged``. Keys are assumed unique per
    snapshot (canonical crawl keys — run canonical_url_col + exact
    dedup first)."""
    o = old.select(F.col(key_col).alias("__k"),
                   F.md5(F.col(text_col)).alias("old_fp"))
    n = new.select(F.col(key_col).alias("__k"),
                   F.md5(F.col(text_col)).alias("new_fp"))
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") != F.col("new_fp"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return (o.join(n, "__k", "full_outer")
            .select(F.col("__k").alias(key_col),
                    status.alias("status"), "old_fp", "new_fp"))


def snapshot_delta_summary(old: DataFrame, new: DataFrame, *,
                           key_col: str = "url",
                           text_col: str = "text") -> DataFrame:
    """(status, n_keys) — the dashboard row per crawl dump."""
    return (snapshot_diff(old, new, key_col=key_col, text_col=text_col)
            .groupBy("status").agg(F.count("*").alias("n_keys")))


def keep_latest_revision(df: DataFrame, *, key_col: str | None = None,
                         ts_col: str = "warc_ts") -> DataFrame:
    """Collapse a MULTI-crawl pages table to the newest revision per
    canonical url — the revisit policy every rolling crawl needs
    before extraction/dedup (a url re-fetched across N dumps must
    contribute one row, the freshest). ``key_col=None`` keys on
    ``canonical_url_col(url)`` (scrub.py — ONE url definition
    engine-wide); pass a column name to key on something else.

    Scale shape: groupBy ``max_by(struct(<all columns>),
    struct(ts, url))`` — ONE shuffle whose map-side partial
    aggregation absorbs hot urls (a million-revision url arrives at
    the reducer as one candidate per map partition). The
    window/row_number alternative sorts each url's full history in a
    single task — exactly the skew this engine never buys. Ties on
    the timestamp break deterministically by the raw url string.
    """
    from ocr_engine_spark.functions.scrub import canonical_url_col
    key = (canonical_url_col(F.col("url")) if key_col is None
           else F.col(key_col))
    tie = F.col("url") if "url" in df.columns else key
    ordk = F.struct(F.col(ts_col), tie)
    # the output owns 'canonical_url'/'n_revisions': same-named input
    # columns (re-applying the policy to its own output after unioning
    # a new dump) are recomputed, not carried — carrying them would
    # emit ambiguous duplicate columns
    carried = [c for c in df.columns
               if c not in ("canonical_url", "n_revisions")]
    row = F.struct(*[F.col(c) for c in carried])
    return (df.groupBy(key.alias("__key"))
            .agg(F.max_by(row, ordk).alias("__row"),
                 F.count("*").alias("n_revisions"))
            .select("__key", "n_revisions", "__row.*")
            .withColumnRenamed("__key", "canonical_url"))


def novelty_curve(df, *, bucket_docs: int = 50,
                  id_col: str = "doc_id",
                  text_col: str = "text"):
    """Crawl novelty curve — the doc-granularity companion of
    text.vocab_growth's Heaps diagnostic: walking the corpus in
    ``id_col`` order (crawl time in the fixture's convention), what
    fraction of each bucket's documents carries a fingerprint never
    seen in ANY earlier bucket?  A healthy crawl holds a high novel
    rate; re-crawl loops, mirror floods and frontier starvation all
    drag it down bucket by bucket — and unlike a global dup-rate, the
    CURVE shows when the rot started.

    Shape: one groupBy(fingerprint) argmin charges each fingerprint
    to its first-occurrence bucket (bounded by distinct content, not
    corpus rows; min(struct) needs no window), one bucket-keyed count
    pair joins them — no window over docs, the same scale discipline
    as vocab_growth. Returns (bucket, n_docs, n_novel, novel_ppm)."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.functions.text import fingerprint_col
    bucket = F.expr(f"{id_col} div {int(bucket_docs)}").alias("bucket")
    fp = df.select(bucket, fingerprint_col(F.col(text_col)).alias("fp"))
    firsts = (fp.groupBy("fp")
              .agg(F.min("bucket").alias("bucket"))
              .groupBy("bucket")
              .agg(F.count("*").alias("n_novel")))
    totals = fp.groupBy("bucket").agg(F.count("*").alias("n_docs"))
    return (totals.join(firsts, "bucket", "left")
            .select("bucket", "n_docs",
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"))
            .withColumn("novel_ppm",
                        F.expr("(n_novel * 1000000) div n_docs")))
