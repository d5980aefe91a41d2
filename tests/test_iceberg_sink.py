"""IcebergEdgeSink: SQL-generation unit tests (always run) and a gated
end-to-end test (requires an Iceberg runtime jar + catalog; skipped in this
sandbox)."""

import pytest

from relation_graph_spark.iceberg_sink import IcebergEdgeSink
from relation_graph_spark.sinks import EdgeSink


def test_protocol_surface():
    # the binding exposes the full EdgeSink protocol surface
    for name in (
        "is_committed",
        "committed_batches",
        "append",
        "append_new_only",
        "dedup_new",
        "read",
        "metrics",
    ):
        assert callable(getattr(IcebergEdgeSink, name))
    assert isinstance(EdgeSink, type(EdgeSink))  # protocol importable


def test_create_table_sql_pins_bucket_layout():
    sink = IcebergEdgeSink(None, "local.db.edges", n_buckets=64)
    sql = sink.create_table_sql()
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(64, edge_hash))" in sql
    assert "'write.delete.mode'='merge-on-read'" in sql
    assert "edge_hash STRING" in sql


def test_merge_sql_is_insert_only_on_idempotency_key():
    sql = IcebergEdgeSink.merge_sql("local.db.edges", "delta_v")
    assert sql.startswith("MERGE INTO local.db.edges t USING delta_v s")
    assert "ON t.edge_hash = s.edge_hash" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "WHEN MATCHED" not in sql  # append-only merge: no updates


def test_delete_sql_targets_tombstone_keys():
    sql = IcebergEdgeSink.delete_sql("local.db.edges", "tomb_v")
    assert sql == (
        "DELETE FROM local.db.edges WHERE edge_hash IN "
        "(SELECT edge_hash FROM tomb_v)"
    )


def test_maintenance_sql_compaction_analog():
    sink = IcebergEdgeSink(None, "local.db.edges")
    stmts = sink.maintenance_sql("2026-01-01 00:00:00")
    assert any("rewrite_data_files" in s for s in stmts)
    assert any("expire_snapshots" in s for s in stmts)
    assert all(s.startswith("CALL local.system.") for s in stmts)


def test_fresh_table_commit_log_is_empty(spark):
    """ADVICE r4 (medium): before the table exists, the snapshot scan must
    report 'nothing committed' instead of raising — so the very first
    append (and IncrementalClosureJob's is_committed-first call order) can
    proceed to create the table."""
    sink = IcebergEdgeSink(spark, "nonexistent_catalog.db.edges")
    assert sink._snapshot_summaries() == []
    assert sink.committed_batches() == []
    assert not sink.is_committed(0)
    assert sink.metrics() == []


def _iceberg_available(spark) -> bool:
    try:
        spark.conf.get("spark.sql.catalog.local")
    except Exception:
        return False
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.rgs_test")
        return True
    except Exception:
        return False


def test_iceberg_end_to_end(spark):
    """Exactly-once append + retraction + replay over a real Iceberg table.
    Runs only where the runtime jar and a `local` catalog are configured."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar / catalog in this environment")
    sink = IcebergEdgeSink(spark, "local.rgs_test.edges", n_buckets=8)
    sink.ensure_table()
    df = spark.createDataFrame(
        [(1, 2, 3, "e1", "h1"), (4, 5, 6, "e2", "h2")],
        "s int, p int, o int, edge string, edge_hash string",
    )
    m0 = sink.append(df, 0, extra_metrics={"k": 1})
    assert sink.is_committed(0) and m0["n_rows"] == 2
    # replay is a no-op
    sink.append(df, 0)
    assert sink.read().count() == 2
    # dedup_new drops committed keys; tombstone retracts via delete files
    assert sink.dedup_new(df).count() == 0
    tomb = spark.createDataFrame([("h1",)], "edge_hash string")
    sink.append(df.limit(0), 1, tombstones=tomb)
    assert {r.edge_hash for r in sink.read().collect()} == {"h2"}
    assert sink.committed_batches() == [0, 1]


def test_transient_commit_log_error_propagates(spark, monkeypatch):
    """Round-5 ADVICE (medium): a TRANSIENT failure while reading the
    snapshot log must raise, not read as 'nothing committed' — silently
    returning [] would re-append a committed batch (duplicates) and reset
    the watermark (late rows admitted)."""
    sink = IcebergEdgeSink(spark, "some_catalog.db.edges")
    monkeypatch.setattr(IcebergEdgeSink, "_table_exists", lambda self: True)

    def boom(_sql):
        raise RuntimeError("transient catalog outage")

    monkeypatch.setattr(sink.spark, "sql", boom)
    with pytest.raises(RuntimeError, match="transient"):
        sink._snapshot_summaries()
    with pytest.raises(RuntimeError, match="transient"):
        sink.committed_batches()


def test_unconfigured_catalog_maps_to_not_found(spark):
    """The not-found allowlist covers the unconfigured-catalog shape (falls
    through to spark_catalog's REQUIRES_SINGLE_PART_NAMESPACE), while a
    genuine missing table in the session catalog probes clean."""
    assert not IcebergEdgeSink(spark, "nonexistent_catalog.db.edges")._table_exists()
    assert not IcebergEdgeSink(
        spark, "spark_catalog.default.rgs_nope"
    )._table_exists()
