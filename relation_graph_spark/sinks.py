"""Sinks.

- to_ntriples_file / to_tsv_file: batch presentation sinks (reference S5/S6).
- IdempotentParquetSink: the exactly-once sink (S7, new per north rule).

The reference only ever overwrites one output file (Main.scala:60-78); its
only idempotency device is deterministic content-hash blank-node ids
(RelationGraph.scala:236-238). We generalize that hash into a first-class
commit protocol: Iceberg-style manifest commits over parquet, since no
Iceberg runtime jar ships in this sandbox (SURVEY.md section 7.2 calls for a
sink interface with an Iceberg MERGE INTO implementation when the runtime is
present; this class is the offline implementation of that interface).

Protocol (exactly-once under micro-batch replay):
  1. each micro-batch writes its rows to  <root>/data/batch=<id>/   (overwrite
     mode — a replayed batch rewrites byte-identical content because every
     row carries a deterministic edge_hash and the upstream computation is
     deterministic);
  2. the batch is COMMITTED by atomically renaming a manifest JSON into
     <root>/manifest/<id>.json carrying row counts + metrics;
  3. readers union only data dirs named in the manifest — a crash between
     data-write and manifest-write leaves an invisible orphan that the replay
     overwrites.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def to_ntriples_file(iri_edges: DataFrame, path: str) -> None:
    """N-Triples text sink (S5): one '<s> <p> <o> .' line per row."""
    from relation_graph_spark.hashing import to_ntriples

    to_ntriples(iri_edges).write.mode("overwrite").text(path)


def to_tsv_file(compacted: DataFrame, path: str) -> None:
    """TSV sink (S6): s\\tp\\to after prefix compaction."""
    compacted.write.mode("overwrite").option("sep", "\t").csv(path)


class IdempotentParquetSink:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

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
    def read(self) -> DataFrame | None:
        """Union of committed batch dirs only (orphans are invisible)."""
        batches = self.committed_batches()
        if not batches:
            return None
        paths = [os.path.join(self.data_dir, f"batch={b}") for b in batches]
        return self.spark.read.parquet(*paths)

    # -- write --------------------------------------------------------------
    def append(self, df: DataFrame, batch_id: int, extra_metrics: dict | None = None) -> dict:
        """Exactly-once append: skip if committed; else overwrite data dir,
        then atomically publish the manifest."""
        if self.is_committed(batch_id):
            with open(os.path.join(self.manifest_dir, f"{batch_id}.json")) as fh:
                return json.load(fh)
        path = os.path.join(self.data_dir, f"batch={batch_id}")
        df.write.mode("overwrite").parquet(path)
        n_rows = self.spark.read.parquet(path).count()
        manifest = {"batch_id": batch_id, "n_rows": n_rows, **(extra_metrics or {})}
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
        extra_metrics: dict | None = None,
    ) -> dict:
        """MERGE-style append: drop rows whose `key` already exists in any
        committed batch (the left_anti pre-commit dedup of SURVEY.md S7)."""
        existing = self.read()
        if existing is not None:
            df = df.join(existing.select(key).dropDuplicates(), on=key, how="left_anti")
        return self.append(df, batch_id, extra_metrics)
