"""Batch gap sessionization (functions/sessions.py) — hand-built
vectors; the oracle gate (sessionize in __spark_entry__) replays the
full window chain over the events table."""

from __future__ import annotations

import datetime

import pytest

from ocr_engine_spark.functions.sessions import sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2025, 5, 1, 0, 0, 0)
          + datetime.timedelta(seconds=s), u) for i, s, u in rows],
        "event_id long, ts timestamp, user_id long")


def test_gap_splits_sessions(spark):
    """User 1: events at t=0, 60, 5000 s with a 30-min gap -> two
    sessions; user 2: one event -> one singleton session."""
    df = _ev(spark, [(1, 0, 1), (2, 60, 1), (3, 5000, 1), (4, 0, 2)])
    got = {(r.user_id, r.session_id): r
           for r in sessionize(df, gap_min=30).collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s1 = got[(1, 1)]
    assert s1.n_events == 2 and s1.duration_s == 60
    s2 = got[(1, 2)]
    assert s2.n_events == 1 and s2.duration_s == 0
    assert s2.start_epoch - s1.end_epoch == 5000 - 60


def test_boundary_gap_is_same_session(spark):
    """A gap of EXACTLY gap_min minutes does not split (> not >=)."""
    df = _ev(spark, [(1, 0, 1), (2, 1800, 1), (3, 3601, 1)])
    got = sessionize(df, gap_min=30).collect()
    by_id = {r.session_id: r for r in got}
    assert set(by_id) == {1, 2}
    assert by_id[1].n_events == 2          # 0 and 1800 together
    assert by_id[2].start_epoch - by_id[1].end_epoch == 1801


def test_simultaneous_events_deterministic(spark):
    """Events sharing a timestamp order by event_id — repartitioning
    cannot flap the session split."""
    rows = [(i, 0, 1) for i in range(5)] + [(99, 10_000, 1)]
    df = _ev(spark, rows)
    a = sorted((r.session_id, r.n_events)
               for r in sessionize(df.repartition(1)).collect())
    b = sorted((r.session_id, r.n_events)
               for r in sessionize(df.repartition(7, "event_id")).collect())
    assert a == b == [(1, 5), (2, 1)]


def test_funnel_strictly_after_semantics(spark):
    """User 1 completes view->click->purchase in order; user 2 clicks
    BEFORE viewing (click doesn't count, purchase after view does not
    advance past the missing click); user 3 views only. Simultaneous
    view+click (user 4) does not advance."""
    from ocr_engine_spark.functions.sessions import funnel_report
    rows = [
        (1, 0, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "purchase"),
        (4, 0, 2, "click"), (5, 10, 2, "view"), (6, 20, 2, "purchase"),
        (7, 0, 3, "view"),
        (8, 0, 4, "view"), (9, 0, 4, "click"),
    ]
    import datetime
    df = spark.createDataFrame(
        [(i, datetime.datetime(2025, 5, 1) + datetime.timedelta(seconds=s),
          u, t) for i, s, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.step_idx: r for r in
           funnel_report(df, ["view", "click", "purchase"]).collect()}
    assert got[1].n_users == 4            # users 1,2,3,4 all viewed
    assert got[2].n_users == 1            # only user 1 clicked after view
    assert got[3].n_users == 1
    assert got[1].conversion_micro == 1_000_000
    assert got[2].conversion_micro == 250_000
    with pytest.raises(ValueError):
        funnel_report(df, [])


def test_retention_cohorts_matrix(spark):
    """Two cohorts, hand-built: cohort A (users 1,2) both active week
    0; user 1 returns week 1; user 2 returns week 2. Cohort B (user 3)
    active its own week 0 only."""
    from ocr_engine_spark.functions.sessions import retention_cohorts
    W = 604_800
    base = datetime.datetime(2025, 1, 6)  # epoch-week aligned enough
    rows = [(1, 0, 1), (2, 3600, 2),          # cohort A week 0
            (3, W + 60, 1),                   # user 1, +1 week
            (4, 2 * W + 60, 2),               # user 2, +2 weeks
            (5, 3 * W, 3)]                    # cohort B
    df = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=s), u)
         for i, s, u in rows],
        "event_id long, ts timestamp, user_id long")
    got = {(r.cohort, r.offset): r
           for r in retention_cohorts(df).collect()}
    cohorts = sorted({c for c, _ in got})
    a, b = cohorts[0], cohorts[1]
    assert got[(a, 0)].n_users == 2
    assert got[(a, 1)].n_users == 1
    assert got[(a, 2)].n_users == 1
    assert got[(a, 1)].retention_micro == 500_000
    assert got[(b, 0)].n_users == 1
    assert (b, 1) not in got
