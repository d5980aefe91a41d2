"""Iceberg binding for the EdgeSink protocol (S7 at cluster scale).

The north rule's deployment target is an exactly-once sink on an Iceberg
table; no Iceberg runtime jar ships in this sandbox, so the shipping
binding is IdempotentParquetSink (same protocol over parquet + manifest
files). This class is the drop-in third binding: everything the offline
sink implements by hand maps to a native Iceberg mechanism —

  offline IdempotentParquetSink            IcebergEdgeSink
  ---------------------------------------  --------------------------------
  data/batch=N dirs + manifest/N.json      one table snapshot per batch,
                                           batch id + metrics committed
                                           ATOMICALLY as snapshot summary
                                           properties (`snapshot-property.`
                                           write options)
  pmod(xxhash64(edge_hash), n) partition   `bucket(n, edge_hash)` partition
                                           transform (layout pinned by the
                                           table spec itself)
  tombstone dirs + read-side anti-join     DELETE FROM -> merge-on-read
                                           delete files; plain table scans
                                           already exclude retracted rows
  bucket-pruned dedup_new anti-join        anti-join against the bucketed
                                           table (storage-partitioned join
                                           + runtime filtering) or MERGE
                                           INTO ... WHEN NOT MATCHED
  maybe_compact (LSM runs, manifest fold)  CALL rewrite_data_files /
                                           expire_snapshots maintenance

Crash-safety ordering inside `append` mirrors the offline sink: the
retraction DELETE runs first, the data append with the batch's snapshot
properties is the commit point. A crash in between leaves the deletes
applied but the batch uncommitted; the deterministic replay re-runs the
DELETE (a no-op — retractions are permanent) and the append, restoring
exactly-once. Reference framing: the reference only ever rewrites one
output file (Main.scala:60-78); this generalizes its deterministic
content-hash idempotency (RelationGraph.scala:236-238) to a snapshot log.

Tests: SQL-generation unit tests always run; the end-to-end test is gated
on an Iceberg catalog being configured (skipped in this sandbox).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

BATCH_PROP = "rgs.batch_id"
METRICS_PROP = "rgs.metrics"


class IcebergEdgeSink:
    """EdgeSink binding over an Iceberg table (requires the Iceberg Spark
    runtime jar and a configured catalog, e.g. spark.sql.catalog.local)."""

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 32):
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets

    # ---------------------------------------------------------------- DDL
    def create_table_sql(self) -> str:
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} "
            "(s INT, p INT, o INT, edge STRING, edge_hash STRING) "
            f"USING iceberg PARTITIONED BY (bucket({self.n_buckets}, edge_hash)) "
            "TBLPROPERTIES ("
            "'write.delete.mode'='merge-on-read', "
            "'write.merge.mode'='merge-on-read', "
            "'write.distribution-mode'='hash')"
        )

    def ensure_table(self) -> None:
        self.spark.sql(self.create_table_sql())

    @staticmethod
    def merge_sql(table: str, source_view: str) -> str:
        """MERGE-style append: insert only rows whose idempotency key is not
        yet in the table (the Iceberg-native append_new_only)."""
        return (
            f"MERGE INTO {table} t USING {source_view} s "
            "ON t.edge_hash = s.edge_hash "
            "WHEN NOT MATCHED THEN INSERT (s, p, o, edge, edge_hash) "
            "VALUES (s.s, s.p, s.o, s.edge, s.edge_hash)"
        )

    @staticmethod
    def delete_sql(table: str, source_view: str) -> str:
        """Retraction as Iceberg delete files (the tombstone analog)."""
        return (
            f"DELETE FROM {table} WHERE edge_hash IN "
            f"(SELECT edge_hash FROM {source_view})"
        )

    def maintenance_sql(self, older_than: str) -> list[str]:
        """The compaction analog: bin-pack small files, expire superseded
        snapshots (what IdempotentParquetSink.maybe_compact hand-rolls)."""
        catalog = self.table.split(".", 1)[0]
        return [
            f"CALL {catalog}.system.rewrite_data_files(table => '{self.table}')",
            f"CALL {catalog}.system.expire_snapshots(table => '{self.table}', "
            f"older_than => TIMESTAMP '{older_than}')",
        ]

    # --------------------------------------------------------- commit log
    # AnalysisException conditions that definitively mean "the table cannot
    # exist" (unknown catalog / namespace / table). Anything else — notably
    # transient catalog/network failures — must PROPAGATE: treating them as
    # 'nothing committed' would defeat the exactly-once replay guard (a
    # committed batch re-appends) and reset the watermark hwm to None
    # (round-5 ADVICE, medium).
    _NOT_FOUND_CONDITIONS = frozenset(
        {
            "TABLE_OR_VIEW_NOT_FOUND",
            "SCHEMA_NOT_FOUND",
            "CATALOG_NOT_FOUND",
            # an unconfigured catalog name falls through to spark_catalog,
            # which rejects the multi-part namespace with this condition
            "REQUIRES_SINGLE_PART_NAMESPACE",
        }
    )

    def _table_exists(self) -> bool:
        """Explicit existence probe; only definitive not-found maps to
        False, everything else re-raises."""
        from pyspark.errors import AnalysisException

        try:
            return self.spark.catalog.tableExists(self.table)
        except AnalysisException as e:
            cond = e.getCondition() if hasattr(e, "getCondition") else None
            if cond in self._NOT_FOUND_CONDITIONS:
                return False
            raise

    def _snapshot_summaries(self) -> list[dict]:
        if not self._table_exists():
            return []  # table not created yet: no snapshots, nothing committed
        # no blanket handler: a failing metadata query must surface, not
        # silently read as an empty commit log
        rows = self.spark.sql(
            f"SELECT summary FROM {self.table}.snapshots ORDER BY committed_at"
        ).collect()
        return [dict(r.summary) for r in rows]

    def committed_batches(self) -> list[int]:
        return sorted(
            {
                int(s[BATCH_PROP])
                for s in self._snapshot_summaries()
                if BATCH_PROP in s
            }
        )

    def is_committed(self, batch_id: int) -> bool:
        return batch_id in set(self.committed_batches())

    def metrics(self) -> list[dict]:
        out = {}
        for s in self._snapshot_summaries():
            if BATCH_PROP in s and METRICS_PROP in s:
                out[int(s[BATCH_PROP])] = json.loads(s[METRICS_PROP])
        return [out[b] for b in sorted(out)]

    # --------------------------------------------------------------- write
    def append(
        self,
        df: DataFrame,
        batch_id: int,
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
        n_rows_hint: int | None = None,
        n_tomb_hint: int | None = None,
    ) -> dict:
        if self.is_committed(batch_id):
            ms = [m for m in self.metrics() if m.get("batch_id") == batch_id]
            return ms[0] if ms else {"batch_id": batch_id}
        self.ensure_table()
        n_tomb = 0
        if tombstones is not None:
            tview = f"rgs_tomb_{batch_id}"
            tdf = tombstones.select("edge_hash").dropDuplicates()
            n_tomb = n_tomb_hint if n_tomb_hint is not None else tdf.count()
            if n_tomb:
                tdf.createOrReplaceTempView(tview)
                self.spark.sql(self.delete_sql(self.table, tview))
        manifest = {
            "batch_id": batch_id,
            "n_rows": n_rows_hint if n_rows_hint is not None else df.count(),
            "n_tombstones": n_tomb,
            **(extra_metrics or {}),
        }
        # the data append IS the commit point: batch id + metrics land in
        # the same Iceberg snapshot as the rows, atomically
        (
            df.select("s", "p", "o", "edge", "edge_hash")
            .writeTo(self.table)
            .option(f"snapshot-property.{BATCH_PROP}", str(batch_id))
            .option(f"snapshot-property.{METRICS_PROP}", json.dumps(manifest))
            .append()
        )
        return manifest

    def append_new_only(
        self,
        df: DataFrame,
        batch_id: int,
        key: str = "edge_hash",
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
        n_rows_hint: int | None = None,
    ) -> dict:
        # hint not honored here: the MERGE may drop duplicate keys
        return self.append(
            self.dedup_new(df, key=key),
            batch_id,
            tombstones=tombstones,
            extra_metrics=extra_metrics,
        )

    def dedup_new(self, df: DataFrame, key: str = "edge_hash") -> DataFrame:
        """Anti-join against the bucketed table; Iceberg's bucket transform
        plus runtime filtering prunes the history side to the buckets the
        delta touches (the storage-partitioned analog of the offline sink's
        bucket pruning)."""
        if key != "edge_hash":
            raise ValueError(
                "dedup_new pruning requires the bucket-layout key 'edge_hash' "
                f"(table is bucketed on it); got key={key!r}"
            )
        if not self._table_exists():
            return df  # table not created yet: nothing committed
        # a transient read failure must propagate — silently skipping the
        # anti-join would append duplicate rows (same class of bug as the
        # _snapshot_summaries blanket handler)
        existing = self.spark.table(self.table).select(key)
        return df.join(existing, on=key, how="left_anti")

    # ---------------------------------------------------------------- read
    def read(self) -> DataFrame | None:
        """Merge-on-read scans already exclude retracted rows — no manual
        tombstone anti-join."""
        if not self._table_exists():
            return None
        return self.spark.table(self.table)
