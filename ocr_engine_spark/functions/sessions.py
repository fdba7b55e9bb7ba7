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


def retention_cohorts(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      period_s: int = 604_800) -> DataFrame:
    """Cohort retention matrix: (cohort, offset, n_users,
    retention_micro) — users grouped by their first-seen period
    (integer ``floor(epoch / period_s)``, default weekly; epoch-index
    arithmetic on purpose — ``date_trunc`` week/timezone conventions
    differ across engines, integer division doesn't), ``offset`` =
    periods since the cohort period, ``n_users`` = distinct cohort
    members active at that offset, ``retention_micro`` vs the cohort's
    offset-0 size (offset 0 is by construction every member).

    Plan: one (user, period) distinct, one min-per-user aggregate
    joined back (both hash the user key — exchange reuse), then a
    (cohort, offset) count; cohort sizes come back as a broadcast
    join. Corpus-sized data crosses the wire once."""
    per = (F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(period_s))
           .cast("long"))
    act = (events.select(F.col(user_col).alias("u"), per.alias("p"))
           .distinct())
    first = act.groupBy("u").agg(F.min("p").alias("p0"))
    joined = act.join(first, "u")
    cells = (joined.groupBy(F.col("p0").alias("cohort"),
                            (F.col("p") - F.col("p0")).cast("long")
                            .alias("offset"))
             .agg(F.count("*").alias("n_users")))
    sizes = (cells.filter(F.col("offset") == 0)
             .select(F.col("cohort"), F.col("n_users").alias("__c0")))
    return (cells.join(F.broadcast(sizes), "cohort")
            .select("cohort", "offset",
                    F.col("n_users").cast("long").alias("n_users"),
                    F.expr("(n_users * 1000000) div __c0")
                    .cast("long").alias("retention_micro")))


def funnel_report(events: DataFrame, steps: list[str], *,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: one row per step — (step_idx, step,
    n_users, conversion_micro) — where a user reaches step i only with
    an event of type ``steps[i]`` STRICTLY AFTER their earliest
    qualifying time for step i-1 (classic earliest-first funnel
    semantics; simultaneous events do not advance the funnel).
    ``conversion_micro`` is vs the FIRST step in integer micro-units.

    Plan: per step, one groupBy on ``user_col`` over only that step's
    events joined to the (shrinking) qualified-user set — every
    exchange hashes the same key, so Spark reuses the partitioning;
    the final report is a union of 1-row aggregates with the step-1
    count broadcast back for the division. Nothing corpus-sized
    survives past the first filter."""
    if not steps:
        raise ValueError("steps must be non-empty")
    base = events.select(F.col(user_col).alias("u"),
                         F.col(ts_col).alias("t"),
                         F.col(type_col).alias("et"))
    cur = None
    rows = []
    for i, st in enumerate(steps):
        f = base.filter(F.col("et") == st).select("u", "t")
        if cur is None:
            cur = f.groupBy("u").agg(F.min("t").alias("__t"))
        else:
            cur = (f.join(cur, "u")
                   .filter(F.col("t") > F.col("__t"))
                   .groupBy("u").agg(F.min("t").alias("__t")))
        rows.append(cur.agg(F.count("*").alias("n_users"))
                    .select(F.lit(i + 1).cast("long").alias("step_idx"),
                            F.lit(st).alias("step"), "n_users"))
    report = rows[0]
    for r in rows[1:]:
        report = report.unionByName(r)
    first = (report.filter(F.col("step_idx") == 1)
             .select(F.col("n_users").alias("__n1")))
    return (report.crossJoin(F.broadcast(first))
            .select("step_idx", "step",
                    F.col("n_users").cast("long").alias("n_users"),
                    F.when(F.col("__n1") <= 0, F.lit(0))
                    .otherwise(F.expr("(n_users * 1000000) div __n1"))
                    .cast("long").alias("conversion_micro")))


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
