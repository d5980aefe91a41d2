"""Told-sequence audit trail with bounded retention (round-4 VERDICT item 3).

The streaming pipeline persists each micro-batch's told sequences for
audit/replay inspection (lineage METRICS come from running manifest totals
and never rescan this trail). Left alone, that is one `batch=N` dir per
micro-batch forever — the same unbounded file-listing growth the sink and
closure state have compaction/GC for. This module applies the same two-tier
policy, scaled to the trail's access pattern (append-only, audit-read-only):

- ``write_batch``: one dir per micro-batch, overwrite mode (a replayed
  batch rewrites identical content — exactly-once discipline unchanged);
- ``fold_through`` (INLINE, called when the pipeline takes a state
  snapshot): consolidates the per-batch dirs of the just-closed snapshot
  interval into ONE ``trail-<id>`` dir — cost bounded by the interval's
  own rows, never O(total trail). Trail-dir count grows one per snapshot
  interval (batches/compact_every), not one per batch;
- ``compact`` (OUT-OF-BAND, via the `maintain` CLI): merges all trail dirs
  into one — the O(total) rewrite that belongs in a maintenance process,
  mirroring the sink's inline-minor/out-of-band-major split.

Crash-safety: folds write to a hidden tmp dir, then an atomic rename
publishes, then sources are deleted. A crash between publish and delete
leaves duplicate coverage on disk; ``read()`` resolves it structurally
(a merged dir supersedes every trail/batch dir at or below its id) plus a
doc_id dedup belt. A crash before publish leaves only the tmp dir, which
the next fold sweeps. All steps are idempotent.

Naming: ``batch=<b>`` (raw), ``trail-<id>`` (covers batches (prev_id, id]),
``trail-<id>-m<k>`` (out-of-band merge generation k of everything <= id).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_TRAIL_RE = re.compile(r"^trail-(\d+)(?:-m(\d+))?$")


class ToldTrail:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- listing
    def _batch_ids(self) -> list[int]:
        return sorted(
            int(d[len("batch=") :])
            for d in os.listdir(self.root)
            if d.startswith("batch=")
        )

    def _trails(self) -> list[tuple[int, int, str]]:
        """[(id, merge_gen, dirname)] sorted ascending."""
        out = []
        for d in os.listdir(self.root):
            m = _TRAIL_RE.match(d)
            if m:
                out.append((int(m.group(1)), int(m.group(2) or 0), d))
        return sorted(out)

    def _sweep_tmp(self) -> None:
        for d in os.listdir(self.root):
            if d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    # -------------------------------------------------------------- write
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        # one file per batch dir: the trail is audit-only and batch-sized,
        # so file count should track batch count, not shuffle parallelism
        df.repartition(1).write.mode("overwrite").parquet(
            os.path.join(self.root, f"batch={int(batch_id)}")
        )

    # --------------------------------------------------------------- fold
    def fold_through(self, batch_id: int) -> bool:
        """INLINE interval fold: consolidate the raw batch dirs at or below
        `batch_id` into one `trail-<batch_id>` dir and remove them. Only
        batches newer than the newest existing trail are read (older
        leftovers are crash debris of an already-published fold — deleted,
        not re-read). Returns True if a trail was written."""
        self._sweep_tmp()
        trails = self._trails()
        covered = trails[-1][0] if trails else -1
        to_fold, debris = [], []
        for b in self._batch_ids():
            if b <= covered:
                debris.append(b)
            elif b <= batch_id:
                to_fold.append(b)
        for b in debris:
            shutil.rmtree(os.path.join(self.root, f"batch={b}"), ignore_errors=True)
        if not to_fold:
            return False
        paths = [
            p
            for b in to_fold
            if _has_parquet(p := os.path.join(self.root, f"batch={b}"))
        ]
        tmp = os.path.join(self.root, f".tmp-trail-{batch_id}")
        if paths:
            # basePath keeps `batch` out of partition inference collisions
            (
                self.spark.read.option("basePath", self.root)
                .parquet(*paths)
                .drop("batch")
                .repartition(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            os.rename(tmp, os.path.join(self.root, f"trail-{batch_id}"))
        for b in to_fold:
            shutil.rmtree(os.path.join(self.root, f"batch={b}"), ignore_errors=True)
        return bool(paths)

    def compact(self) -> bool:
        """OUT-OF-BAND merge of every trail dir into one (`maintain` CLI).
        Publishes trail-<max_id>-m<k+1> atomically, then deletes the source
        dirs; a crash in between is resolved by read()'s supersede rule."""
        self._sweep_tmp()
        trails = self._trails()
        if len(trails) < 2:
            return False
        max_id = trails[-1][0]
        gen = max(k for _i, k, _d in trails) + 1
        srcs = [
            p
            for _i, _k, d in trails
            if _has_parquet(p := os.path.join(self.root, d))
        ]
        name = f"trail-{max_id}-m{gen}"
        tmp = os.path.join(self.root, f".tmp-{name}")
        if srcs:
            self.spark.read.parquet(*srcs).dropDuplicates(["doc_id"]).repartition(
                1
            ).write.mode("overwrite").parquet(tmp)
            os.rename(tmp, os.path.join(self.root, name))
        for _i, _k, d in trails:
            if d != name:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        return True

    # ---------------------------------------------------------------- read
    def read(self) -> DataFrame | None:
        """Audit read: the highest-generation merged dir supersedes every
        trail/batch dir at or below its id; newer dirs union on top.
        doc_id dedup absorbs crash-window double coverage."""
        trails = self._trails()
        merged = [t for t in trails if t[1] > 0]
        base_id, frames = -1, []
        if merged:
            mid, mk, mdir = max(merged, key=lambda t: (t[0], t[1]))
            base_id = mid
            p = os.path.join(self.root, mdir)
            if _has_parquet(p):
                frames.append(self.spark.read.parquet(p))
        for tid, k, d in trails:
            if k == 0 and tid > base_id:
                p = os.path.join(self.root, d)
                if _has_parquet(p):
                    frames.append(self.spark.read.parquet(p))
        raw = [
            p
            for b in self._batch_ids()
            if b > base_id
            and _has_parquet(p := os.path.join(self.root, f"batch={b}"))
        ]
        if raw:
            frames.append(
                self.spark.read.option("basePath", self.root)
                .parquet(*raw)
                .drop("batch")
            )
        if not frames:
            return None
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        return df.dropDuplicates(["doc_id"])

    def dir_count(self) -> int:
        return len(self._batch_ids()) + len(self._trails())


def _has_parquet(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
