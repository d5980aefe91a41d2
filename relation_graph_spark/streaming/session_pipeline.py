"""Watermark-gated streaming SESSION finalization + per-session closure.

`windows.session_closure` computes per-session transitive closure as a
batch recompute; its doc states the streaming contract this module
implements: session state stays OPEN until the watermark passes
``last_ts + gap``; only then is the session's row-set final (any row that
could still merge or extend it would now be below the watermark and
dropped), so the per-session closure can be emitted exactly once.

Architecture (mirrors IncrementalClosureJob's foreachBatch discipline
rather than a black-box stateful aggregation, so finalization is
deterministic, replayable, and accountable):

  1. exactly-once guard: committed batch ids skip (sink manifest);
  2. late-row drop + count: rows with ts < watermark(prev) are dropped —
     watermark derives from the last COMMITTED manifest (max event ts seen
     minus ``delay``), so replay after a crash makes identical lateness
     decisions (same rule as pipeline._load_hwm);
  3. union the batch's surviving rows with the OPEN-session state rows and
     run ONE gaps-and-islands session assignment (one shuffle on the key —
     windows.assign_sessions, semantics proven equal to Spark's native
     session_window incl. the touching-ranges merge rule). A late-but-in-
     watermark row lands in the union and naturally re-opens/merges the
     sessions it bridges — exactly native session_window behavior;
  4. finalize sessions whose ``last_ts + gap`` lies strictly BELOW the new
     watermark: any future on-time row has ts >= watermark > last_ts+gap,
     so it cannot touch-extend such a session (touching = equality is why
     strictness matters). Per-session transitive closure runs for ALL
     finalized sessions in ONE distributed job (grouped semi-naive TC —
     no per-session loop) and appends to the idempotent sink keyed by a
     content hash of (key, sess_start, child, parent);
  5. rows of still-open sessions persist as the next batch's state —
     written BEFORE the sink commit (the pipeline's load-bearing crash
     ordering). State size = rows of open sessions only: every session
     idle past the watermark horizon finalizes out, so state is bounded by
     key activity within ~(delay + gap), not by stream length. Without a
     cap, a key that never goes idle grows its open session without bound
     (the same caveat as Spark's native session_window state);
     ``max_session_seconds`` closes it: sessions are force-split into
     greedy duration-capped chunks (windows.split_long_sessions — chunk
     boundaries depend only on event timestamps, never micro-batch
     boundaries), a chunk finalizes once the watermark strictly passes
     anchor + max, and the manifest counts the cap-released chunks
     (n_sessions_forced_split / _total). State is then bounded by rows
     within ~(max + delay + gap) of the watermark for EVERY key.

Emit-once invariant (tested): the union of emitted per-session closures
over any prefix of the stream equals `windows.session_closure` run as a
batch over the on-time rows of the FINALIZED sessions, each session
emitted in exactly one batch manifest.

Scale shape per batch: one shuffle for session assignment over
(open-state + batch) rows, one grouped-TC job over finalized rows only,
one parquet write of open rows. Nothing scans emitted history; hot keys
route through the same salting discipline as R3 (skew module) at cluster
scale.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from relation_graph_spark.sinks import IdempotentParquetSink

SESSION_EDGE_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("child", LongType()),
        StructField("parent", LongType()),
    ]
)


def _session_row_hash(key_col: str) -> F.Column:
    """Deterministic content hash of an emitted closure row — the sink's
    idempotency/bucketing key (same SHA-256+Base64 shape as edge_hash)."""
    return F.base64(
        F.unhex(
            F.sha2(
                F.concat_ws(
                    "|",
                    F.col(key_col).cast("string"),
                    F.col("sess_start").cast("string"),
                    F.col("child").cast("string"),
                    F.col("parent").cast("string"),
                ),
                256,
            )
        )
    )


class SessionClosureStreamJob:
    """Streaming deployment of `windows.session_closure` with emit-once
    watermark-gated finalization."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        work_dir: str,
        gap: str = "30 minutes",
        delay_seconds: int = 0,
        key_col: str = "user_id",
        child: str = "child",
        parent: str = "parent",
        ts_col: str = "ts",
        sink: IdempotentParquetSink | None = None,
        max_session_seconds: float | None = None,
        max_split_rounds: int = 64,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.work_dir = work_dir
        self.gap = gap
        self.gap_seconds = self._interval_seconds(gap)
        self.delay = delay_seconds
        self.key_col = key_col
        self.child = child
        self.parent = parent
        self.ts_col = ts_col
        # optional duration cap (round-5 VERDICT item 3): a session is
        # force-split into greedy <= max_session_seconds chunks, so a key
        # that NEVER goes idle still has bounded open state (rows within
        # ~max+delay+gap of the watermark) and emits a chunk closure per
        # cap interval. None = native session_window parity (unbounded for
        # a never-idle key).
        self.max_session_seconds = max_session_seconds
        # split_long_sessions convergence bound: one chunk round per
        # max_session_seconds of the longest session in a batch. A backlog
        # bootstrap whose first batch spans a long never-idle session may
        # need more than the default 64 (error message names this knob).
        self.max_split_rounds = max_split_rounds
        self.sink = sink or IdempotentParquetSink(
            spark, os.path.join(work_dir, "sink")
        )
        self.open_dir = os.path.join(work_dir, "open_state")
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint")
        os.makedirs(work_dir, exist_ok=True)
        # newest-manifest cache: metrics() parses EVERY per-batch manifest,
        # so calling it per batch makes driver IO O(n^2) over a long stream
        # (round-5 ADVICE, low). Loaded once, then maintained from append()'s
        # return value — the session-job mirror of
        # IncrementalClosureJob._prev_manifest.
        self._prev_manifest: dict | None = None
        self._manifest_loaded = False

    @staticmethod
    def _interval_seconds(interval: str) -> float:
        """'30 minutes' -> 1800.0 (same vocabulary as Spark intervals)."""
        n, unit = interval.split()
        mult = {
            "second": 1,
            "seconds": 1,
            "minute": 60,
            "minutes": 60,
            "hour": 3600,
            "hours": 3600,
            "day": 86400,
            "days": 86400,
        }[unit.lower()]
        return float(n) * mult

    # ---------------------------------------------------------------- state
    def _newest_manifest(self) -> dict | None:
        """Newest committed manifest, cached: ONE full metrics() read at
        job start (resume), then O(1) per batch from append()'s return."""
        if not self._manifest_loaded:
            ms = self.sink.metrics()
            self._prev_manifest = ms[-1] if ms else None
            self._manifest_loaded = True
        return self._prev_manifest

    def _load_hwm(self) -> float | None:
        m = self._newest_manifest()
        return m.get("hwm_epoch") if m else None

    def _open_state_path(self, batch_id: int) -> str:
        return os.path.join(self.open_dir, f"snap-{batch_id}")

    def _load_open_state(self) -> DataFrame | None:
        """Open-session rows as of the newest COMMITTED batch (orphan
        snapshots from a crashed batch are ignored, mirroring load_state)."""
        committed = set(self.sink.committed_batches())
        if not committed or not os.path.isdir(self.open_dir):
            return None
        snaps = sorted(
            int(d[len("snap-") :])
            for d in os.listdir(self.open_dir)
            if d.startswith("snap-") and int(d[len("snap-") :]) in committed
        )
        if not snaps:
            return None
        path = self._open_state_path(snaps[-1])
        if not IdempotentParquetSink._has_parquet(path):
            return None  # last batch closed every session: empty state
        return self.spark.read.parquet(path)

    def _gc_open_state(self, keep_batch: int) -> None:
        import shutil

        if not os.path.isdir(self.open_dir):
            return
        for d in os.listdir(self.open_dir):
            if d.startswith("snap-") and int(d[len("snap-") :]) < keep_batch:
                shutil.rmtree(os.path.join(self.open_dir, d), ignore_errors=True)

    # ----------------------------------------------------------- batch step
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        from relation_graph_spark.closure import transitive_closure
        from relation_graph_spark.streaming.windows import assign_sessions

        batch_id = int(batch_id)
        if self.sink.is_committed(batch_id):
            return
        k, c, p, t = self.key_col, self.child, self.parent, self.ts_col
        batch_df = batch_df.select(k, t, c, p).localCheckpoint()

        # watermark at trigger START (from the last committed manifest):
        # rows below it are dropped and counted — deterministic on replay
        hwm = self._load_hwm()
        # timestamp->double keeps microsecond precision (unix_timestamp
        # would truncate to seconds and skew boundary comparisons)
        ts_sec = F.col(t).cast("double")
        wm_prev = (hwm - self.delay) if hwm is not None else None
        stats = batch_df.agg(
            F.sum(
                F.when(ts_sec < F.lit(wm_prev), 1).otherwise(0)
                if wm_prev is not None
                else F.lit(0)
            ).alias("n_late"),
            F.max(ts_sec).alias("max_ts"),
        ).collect()[0]
        n_late = int(stats["n_late"] or 0)
        if n_late:
            batch_df = batch_df.where(ts_sec >= F.lit(wm_prev))
        if stats["max_ts"] is not None:
            hwm = max(hwm or float("-inf"), float(stats["max_ts"]))
        wm_new = (hwm - self.delay) if hwm is not None else None

        # ONE session assignment over open-state rows + surviving batch rows
        open_state = self._load_open_state()
        rows = batch_df if open_state is None else open_state.unionByName(batch_df)
        tagged = assign_sessions(
            rows, gap=self.gap, ts_col=t, key_col=k, order_cols=[c, p]
        )
        # per-GAP-SESSION last event, computed BEFORE any duration split so
        # 'natural' finality is judged on the session a user actually sees:
        # finalize iff watermark STRICTLY passed last_ts + gap (equality
        # would finalize a session a touching on-time row could still
        # extend). A naturally-final session releases ALL its chunks.
        sess_win = Window.partitionBy(k, "sess_start")
        tagged = tagged.withColumn("_sess_last", F.max(ts_sec).over(sess_win))
        natural_cut = (
            (F.col("_sess_last") + F.lit(self.gap_seconds)) < F.lit(wm_new)
            if wm_new is not None
            else F.lit(False)
        )
        tagged = tagged.withColumn("_natural", natural_cut)
        if self.max_session_seconds is not None:
            # duration cap: re-chunk from scratch every batch (greedy
            # anchors depend only on event timestamps, so the chunking is
            # batch-boundary-independent — see split_long_sessions).
            # sess_start becomes the chunk anchor; _sess_last/_natural keep
            # referring to the enclosing gap-session.
            from relation_graph_spark.streaming.windows import (
                split_long_sessions,
            )

            tagged = split_long_sessions(
                tagged,
                self.max_session_seconds,
                ts_col=t,
                key_col=k,
                max_rounds=self.max_split_rounds,
            )
        # Under the cap, a chunk of a STILL-OPEN session is ALSO final once
        # the watermark strictly passes its anchor + max: every row that
        # could land in [anchor, anchor+max] has arrived (future on-time
        # rows have ts >= wm), the chunk cannot extend past its boundary by
        # construction, and no future row can re-anchor it (that would need
        # ts <= anchor < wm). These cap-released chunks are the
        # forced-split accounting.
        if self.max_session_seconds is not None and wm_new is not None:
            forced_cut = (
                F.col("sess_start").cast("double")
                + F.lit(float(self.max_session_seconds))
            ) < F.lit(wm_new)
        else:
            forced_cut = F.lit(False)
        tagged = tagged.withColumn(
            "_final", F.col("_natural") | forced_cut
        ).localCheckpoint()

        finalized = tagged.where("_final")
        still_open = tagged.where(~F.col("_final")).select(k, t, c, p)

        # ---- open-session state persists BEFORE the sink commit ----------
        # (crash between the two replays the batch over both; the reverse
        # order would finalize-and-skip while losing the open rows)
        # repartition(1): open state is bounded by key activity within
        # ~(delay+gap[+max]) — one file per snapshot, not one per shuffle
        # task (the round-5 file-discipline rule applied to this writer)
        still_open.repartition(1).write.mode("overwrite").parquet(
            self._open_state_path(batch_id)
        )

        # per-session closure for ALL newly-final sessions in ONE job
        closure_in = finalized.select(k, "sess_start", c, p).where(
            F.col(c) != F.col(p)
        )
        closed = transitive_closure(
            closure_in, child=c, parent=p, group_cols=[k, "sess_start"]
        )
        emitted = (
            closed.withColumn("edge_hash", _session_row_hash(k))
            .select(k, "sess_start", c, p, "edge_hash")
        )
        # one aggregation for both counters: total finalized chunks and the
        # subset only the duration cap released (split accounting)
        counts = (
            finalized.select(k, "sess_start", "_natural")
            .groupBy(k, "sess_start")
            .agg(F.max("_natural").alias("nat"))
            .agg(
                F.count(F.lit(1)).alias("n_all"),
                F.sum(F.when(~F.col("nat"), 1).otherwise(0)).alias("n_forced"),
            )
            .collect()[0]
        )
        n_sessions = int(counts["n_all"] or 0)
        n_forced = int(counts["n_forced"] or 0)
        prev = self._newest_manifest() or {}
        manifest = self.sink.append(
            emitted,
            batch_id,
            extra_metrics={
                "hwm_epoch": hwm,
                "n_late_dropped": n_late,
                "n_sessions_finalized": n_sessions,
                "n_sessions_finalized_total": prev.get(
                    "n_sessions_finalized_total", 0
                )
                + n_sessions,
                "n_sessions_forced_split": n_forced,
                "n_sessions_forced_split_total": prev.get(
                    "n_sessions_forced_split_total", 0
                )
                + n_forced,
            },
        )
        self._prev_manifest = manifest
        self._gc_open_state(batch_id)
        if hasattr(self.sink, "maybe_compact"):
            self.sink.maybe_compact()

    # ------------------------------------------------------------------ run
    def read_stream(self, max_files_per_trigger: int | None = 1) -> DataFrame:
        reader = self.spark.readStream.schema(SESSION_EDGE_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.input_dir)

    def run_available(self, max_files_per_trigger: int | None = 1) -> None:
        stream = self.read_stream(max_files_per_trigger)
        query = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

    # ------------------------------------------------------------- inspect
    def result(self) -> DataFrame | None:
        out = self.sink.read()
        return None if out is None else out.drop("edge_hash")

    def metrics(self) -> list[dict]:
        return self.sink.metrics()
