"""Logic-level coverage of the Iceberg commit protocol (VERDICT r02
#6): the sandbox has no Iceberg runtime jars and no network to fetch
them (`curl repo1.maven.org` -> DNS failure, recorded in BENCH.md), so
the execution path stays classpath-gated — but the protocol pieces
(snapshot-summary parsing, batch-property lookup SQL, incremental
read-window selection, gate behavior) are pure driver logic and are
exercised here over stubs. ManifestCatalog (same semantics on parquet)
carries the executed resume coverage in test_resume/test_kill_resume.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from ocr_engine_spark.engine.catalog import (
    BATCH_PROP, IcebergCatalog, iceberg_available, incremental_read_options,
    snapshot_lookup_sql, snapshots_summary_sql, summary_batch_ids,
)


def _row(**kw):
    return SimpleNamespace(**kw)


def test_summary_batch_ids_parses_and_skips():
    rows = [
        _row(summary={BATCH_PROP: "3", "added-records": "100"}),
        _row(summary={BATCH_PROP: "7"}),
        # compaction / other-writer snapshots: no batch property
        _row(summary={"operation": "replace"}),
        # defensive: engines may surface a NULL summary map
        _row(summary=None),
        # replayed batch committing twice resolves to one id
        _row(summary={BATCH_PROP: "3"}),
    ]
    assert summary_batch_ids(rows) == {3, 7}


def test_summary_batch_ids_empty():
    assert summary_batch_ids([]) == set()


def test_snapshots_summary_sql_targets_metadata_table():
    assert snapshots_summary_sql("local.db.pages") \
        == "SELECT summary FROM local.db.pages.snapshots"


def test_snapshot_lookup_sql_is_property_keyed_and_tiebroken():
    sql = snapshot_lookup_sql("local.db.pages", 42)
    # keyed by OUR batch property, never by timestamp alone
    assert f"summary['{BATCH_PROP}'] = '42'" in sql
    # millisecond timestamp ties need the snapshot_id tie-break
    assert "ORDER BY committed_at DESC, snapshot_id DESC" in sql
    assert sql.strip().endswith("LIMIT 1")
    # batch id is int-coerced (no injection through a str batch id)
    assert "'9'" in snapshot_lookup_sql("t", "9")
    with pytest.raises(ValueError):
        snapshot_lookup_sql("t", "9; DROP TABLE x")


def test_incremental_read_options_windows():
    # later snapshot: read exactly (parent, new]
    snap = _row(snapshot_id=200, parent_id=100)
    assert incremental_read_options(snap) == {
        "start-snapshot-id": "100", "end-snapshot-id": "200"}
    # table-creating first snapshot: whole table (== the increment)
    assert incremental_read_options(_row(snapshot_id=1,
                                         parent_id=None)) == {}
    # missing snapshot row (summary-less engine edge): whole table
    assert incremental_read_options(None) == {}


def test_iceberg_gate_refuses_without_classpath(spark):
    """In this jar-less sandbox the gate must report unavailable and
    construction must fail with the ManifestCatalog pointer — never a
    half-working catalog."""
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="ManifestCatalog"):
        IcebergCatalog(spark)
