"""Batch gap-based sessionization over an event stream table.

The batch twin of ``streaming/stream_job.py:host_sessions_stream`` (the
``applyInPandasWithState`` operator): given (user, ts) events, a NEW
session starts whenever the gap from the user's previous event exceeds
``gap_min`` minutes. Everything is two windows partitioned by user —
group size is bounded by one user's activity, never corpus-global — and
one aggregate; all integer epoch arithmetic, so the DuckDB oracle
replays it verbatim.

This is the standard analytics building block (funnels, engagement,
crawl-politeness modeling on the fetch log); the reference-class
pipeline runs it over the fetch/event log next to the corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_min: int = 30) -> DataFrame:
    """(user_id, session_id, start_epoch, end_epoch, n_events,
    duration_s) — gap-based sessions per user. ``session_id`` is the
    1-based session index within the user (deterministic: events order
    by (ts, event_id), so simultaneous events can't flap the split).

    Plan: one shuffle on ``user_col`` shared by both windows (lag +
    running sum — Spark evaluates them in a single Window node chain),
    then the session aggregate re-uses the same partitioning. At
    10^12 events the only data moved is the (user, epoch) projection.
    """
    gap_s = int(gap_min) * 60
    ep = F.unix_timestamp(F.col(ts_col)).alias("__ep")
    w = Window.partitionBy(user_col).orderBy("__ep", id_col)
    d = events.select(F.col(user_col), F.col(id_col), ep)
    marked = d.withColumn(
        "__new",
        F.when(F.col("__ep") - F.lag("__ep").over(w) > gap_s, 1)
        .when(F.lag("__ep").over(w).isNull(), 1)
        .otherwise(0))
    sess = marked.withColumn(
        "session_id",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    return (sess.groupBy(user_col, "session_id")
            .agg(F.min("__ep").cast("long").alias("start_epoch"),
                 F.max("__ep").cast("long").alias("end_epoch"),
                 F.count("*").alias("n_events"))
            .withColumn("duration_s",
                        (F.col("end_epoch") - F.col("start_epoch"))
                        .cast("long")))
