"""Sinks.

- to_ntriples_file / to_tsv_file: batch presentation sinks (reference S5/S6).
- EdgeSink: the exactly-once sink interface (S7, new per north rule).
- IdempotentParquetSink: parquet + manifest binding (offline Iceberg analog).
- InMemoryEdgeSink: driver-memory binding proving the interface seam.

The reference only ever overwrites one output file (Main.scala:60-78); its
only idempotency device is deterministic content-hash blank-node ids
(RelationGraph.scala:236-238). We generalize that hash into a first-class
commit protocol: Iceberg-style manifest commits over parquet, since no
Iceberg runtime jar ships in this sandbox (SURVEY.md section 7.2 calls for a
sink interface with an Iceberg MERGE INTO implementation when the runtime is
present; IdempotentParquetSink is the offline implementation and an Iceberg
binding is a drop-in third class behind the same protocol).

Protocol (exactly-once under micro-batch replay):
  1. each micro-batch writes its rows to  <root>/data/batch=<id>/  and —
     when the batch retracts previously-committed rows (late
     unsatisfiability, late mutual subsumption) — tombstone keys to
     <root>/tombstones/batch=<id>/   (both overwrite mode: a replayed batch
     rewrites byte-identical content because every row carries a
     deterministic edge_hash and the upstream computation is deterministic);
  2. the batch is COMMITTED by atomically renaming a manifest JSON into
     <root>/manifest/<id>.json carrying row counts + metrics;
  3. readers union only data dirs named in manifests and anti-join the
     committed tombstone keys — a crash between data-write and
     manifest-write leaves an invisible orphan that the replay overwrites.

Tombstones are the Iceberg delete-file analog: retraction events are rare
(a class turning unsatisfiable, a late reverse subsumption), so the
tombstone set stays vocabulary-sized and the read-side anti-join is a
broadcast — never a history-sized shuffle.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Protocol

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def to_ntriples_file(iri_edges: DataFrame, path: str) -> None:
    """N-Triples text sink (S5): one '<s> <p> <o> .' line per row."""
    from relation_graph_spark.hashing import to_ntriples

    to_ntriples(iri_edges).write.mode("overwrite").text(path)


def to_tsv_file(compacted: DataFrame, path: str) -> None:
    """TSV sink (S6): s\\tp\\to after prefix compaction."""
    compacted.write.mode("overwrite").option("sep", "\t").csv(path)


class EdgeSink(Protocol):
    """Exactly-once, retractable edge sink (S7).

    Implementations: IdempotentParquetSink (parquet+manifest, offline),
    InMemoryEdgeSink (tests), and — where a runtime jar exists — an Iceberg
    binding (append = MERGE INTO keyed by edge_hash; retract = positional /
    equality delete files; manifest = Iceberg snapshot)."""

    def is_committed(self, batch_id: int) -> bool: ...

    def committed_batches(self) -> list[int]: ...

    def append(
        self,
        df: DataFrame,
        batch_id: int,
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
    ) -> dict: ...

    def append_new_only(
        self,
        df: DataFrame,
        batch_id: int,
        key: str = "edge_hash",
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
    ) -> dict: ...

    def dedup_new(self, df: DataFrame, key: str = "edge_hash") -> DataFrame: ...

    def read(self) -> DataFrame | None: ...

    def metrics(self) -> list[dict]: ...


class IdempotentParquetSink:
    """Data files are HASH-BUCKETED: every batch dir is partitioned by
    ``bucket = pmod(xxhash64(edge_hash), n_buckets)`` (the offline analog of
    a bucket-partitioned Iceberg table). ``append_new_only``'s history
    anti-join then reads only the buckets the incoming delta touches —
    partition pruning bounds the history-side input bytes by the delta's
    bucket footprint instead of total committed history."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.tombstone_dir = os.path.join(root, "tombstones")
        self.manifest_dir = os.path.join(root, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)
        # pin the bucket modulus on first use: the pruned history anti-join
        # assumes every committed file shares it, so reopening an existing
        # sink with a different count must fail loudly, not mis-prune
        layout = os.path.join(root, "layout.json")
        if os.path.exists(layout):
            with open(layout) as fh:
                pinned = json.load(fh)["n_buckets"]
            if pinned != n_buckets:
                raise RuntimeError(
                    f"sink at {root} was written with n_buckets={pinned}; "
                    f"got n_buckets={n_buckets} — reopen with the pinned value"
                )
        else:
            with open(layout, "w") as fh:
                json.dump({"n_buckets": n_buckets}, fh)
        self.n_buckets = n_buckets

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.xxhash64("edge_hash"), F.lit(self.n_buckets)).cast("int")

    @staticmethod
    def _has_parquet(path: str) -> bool:
        """A partitionBy write of an EMPTY frame creates no data files (there
        is no partition value to name a dir after) — such batch dirs must be
        skipped on read, or schema inference fails."""
        for _root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    # -- commit log ---------------------------------------------------------
    def committed_batches(self) -> list[int]:
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.manifest_dir)
            if f.endswith(".json")
        )

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.manifest_dir, f"{batch_id}.json"))

    def metrics(self) -> list[dict]:
        out = []
        for b in self.committed_batches():
            with open(os.path.join(self.manifest_dir, f"{b}.json")) as fh:
                out.append(json.load(fh))
        return out

    # -- read ---------------------------------------------------------------
    def _tombstones(self) -> DataFrame | None:
        paths = [
            os.path.join(self.tombstone_dir, f"batch={b}")
            for b in self.committed_batches()
            if os.path.isdir(os.path.join(self.tombstone_dir, f"batch={b}"))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths).select("edge_hash").dropDuplicates()

    def _read_bucketed(self) -> DataFrame | None:
        """Committed data with the bucket partition column retained (for
        bucket-pruned history reads); tombstones NOT applied."""
        paths = [
            p
            for b in self.committed_batches()
            if self._has_parquet(p := os.path.join(self.data_dir, f"batch={b}"))
        ]
        if not paths:
            return None
        # basePath makes batch= and bucket= both partition columns (the dirs
        # nest), keeping bucket prunable across the whole committed set
        return self.spark.read.option("basePath", self.data_dir).parquet(*paths)

    def read(self) -> DataFrame | None:
        """Union of committed batch dirs minus committed tombstones (orphans
        of either kind are invisible)."""
        df = self._read_bucketed()
        if df is None:
            return None
        df = df.drop("bucket", "batch")
        ts = self._tombstones()
        if ts is not None:
            df = df.join(F.broadcast(ts), on="edge_hash", how="left_anti")
        return df

    # -- write --------------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        batch_id: int,
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
    ) -> dict:
        """Exactly-once append (+ optional retraction): skip if committed;
        else overwrite data (and tombstone) dirs, then atomically publish the
        manifest."""
        if self.is_committed(batch_id):
            with open(os.path.join(self.manifest_dir, f"{batch_id}.json")) as fh:
                return json.load(fh)
        path = os.path.join(self.data_dir, f"batch={batch_id}")
        df.withColumn("bucket", self._bucket_col()).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(path)
        n_tomb = 0
        if tombstones is not None:
            tdf = tombstones.select("edge_hash").dropDuplicates()
            tpath = os.path.join(self.tombstone_dir, f"batch={batch_id}")
            tdf.write.mode("overwrite").parquet(tpath)
            n_tomb = self.spark.read.parquet(tpath).count()
            if n_tomb == 0:
                # keep reads cheap: no empty tombstone dirs
                import shutil

                shutil.rmtree(tpath, ignore_errors=True)
        n_rows = (
            self.spark.read.parquet(path).count() if self._has_parquet(path) else 0
        )
        manifest = {
            "batch_id": batch_id,
            "n_rows": n_rows,
            "n_tombstones": n_tomb,
            **(extra_metrics or {}),
        }
        fd, tmp = tempfile.mkstemp(dir=self.manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.manifest_dir, f"{batch_id}.json"))
        return manifest

    def append_new_only(
        self,
        df: DataFrame,
        batch_id: int,
        key: str = "edge_hash",
        tombstones: DataFrame | None = None,
        extra_metrics: dict | None = None,
    ) -> dict:
        """MERGE-style append: drop rows whose `key` already exists in any
        committed batch (the left_anti pre-commit dedup of SURVEY.md S7).

        The history side is pruned to the buckets the incoming delta touches
        (edge_hash determines the bucket, so a matching key can only live in
        a touched bucket) — the parquet scan reads delta-footprint bytes,
        not total committed history. Used when the incremental engine cannot
        produce a delta (equivalence feedback); the fast path appends
        pre-computed deltas via `append` with no history join."""
        df = self.dedup_new(df, key=key)
        return self.append(df, batch_id, tombstones=tombstones, extra_metrics=extra_metrics)

    def dedup_new(self, df: DataFrame, key: str = "edge_hash") -> DataFrame:
        """Drop rows whose `key` already exists in any committed batch, with
        the history scan pruned to the buckets the incoming rows touch.
        Exposed so callers that need the surviving-row count BEFORE commit
        (running manifest totals) can dedup first and append exactly."""
        existing = self._read_bucketed()
        if existing is None:
            return df
        if key == "edge_hash":
            dfb = df.withColumn("bucket", self._bucket_col()).localCheckpoint(
                eager=False
            )
            touched = [r["bucket"] for r in dfb.select("bucket").distinct().collect()]
            df = dfb.drop("bucket")
            if touched:
                hist = (
                    existing.where(F.col("bucket").isin(touched))
                    .select(key)
                    .dropDuplicates()
                )
                df = df.join(hist, on=key, how="left_anti")
            return df
        return df.join(existing.select(key).dropDuplicates(), on=key, how="left_anti")


class InMemoryEdgeSink:
    """Driver-memory EdgeSink binding — proves the interface seam that an
    Iceberg MERGE binding drops into (VERDICT round-1 item 9). Test-only."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._data: dict[int, list] = {}
        self._tombs: dict[int, set[str]] = {}
        self._manifests: dict[int, dict] = {}
        self._schema = None

    def committed_batches(self) -> list[int]:
        return sorted(self._manifests)

    def is_committed(self, batch_id: int) -> bool:
        return batch_id in self._manifests

    def metrics(self) -> list[dict]:
        return [self._manifests[b] for b in self.committed_batches()]

    def append(self, df, batch_id, tombstones=None, extra_metrics=None):
        if self.is_committed(batch_id):
            return self._manifests[batch_id]
        rows = df.collect()
        self._schema = df.schema
        tombs = (
            {r["edge_hash"] for r in tombstones.select("edge_hash").collect()}
            if tombstones is not None
            else set()
        )
        self._data[batch_id] = rows
        self._tombs[batch_id] = tombs
        m = {
            "batch_id": batch_id,
            "n_rows": len(rows),
            "n_tombstones": len(tombs),
            **(extra_metrics or {}),
        }
        self._manifests[batch_id] = m
        return m

    def append_new_only(self, df, batch_id, key="edge_hash", tombstones=None, extra_metrics=None):
        return self.append(
            self.dedup_new(df, key=key),
            batch_id,
            tombstones=tombstones,
            extra_metrics=extra_metrics,
        )

    def dedup_new(self, df, key="edge_hash"):
        existing = self.read()
        if existing is None:
            return df
        return df.join(existing.select(key).dropDuplicates(), on=key, how="left_anti")

    def read(self):
        if not self._data:
            return None
        all_tombs = set().union(*self._tombs.values()) if self._tombs else set()
        rows = [
            r.asDict()
            for b in self.committed_batches()
            for r in self._data[b]
            if r["edge_hash"] not in all_tombs
        ]
        return self.spark.createDataFrame(rows, self._schema)
