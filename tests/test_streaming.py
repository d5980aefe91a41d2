"""Streaming fixtures of FIXTURES.md section 7: split-equals-batch, late
data accounting, checkpoint resume, stateful dedup, watermarked windows."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from relation_graph_spark import fixtures as FX
from relation_graph_spark import tokens as T
from relation_graph_spark.config import RGConfig
from relation_graph_spark.schema import SEQ_TS_SCHEMA
from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

from conftest import triples

TEST_CFG = RGConfig(
    output_subclasses=True,
    reflexive_subclasses=False,
    equivalence_as_subclass=False,
)

GOLDEN_ALL = FX.GOLDEN_A_EXISTENTIAL | FX.GOLDEN_A_SUBCLASS


def _write_batches(spark, base_dir, splits, ts_override=None):
    """Write fixture-A rows as one parquet file per micro-batch split."""
    df = FX.materialize_test(spark, with_ts=True)
    rows = [r.asDict() for r in df.collect()]
    if ts_override:
        for r in rows:
            if r["doc_id"] in ts_override:
                r["ts"] = ts_override[r["doc_id"]]
    os.makedirs(base_dir, exist_ok=True)
    paths = []
    for i, (lo, hi) in enumerate(splits):
        part = [r for r in rows if lo <= int(r["doc_id"][1:]) <= hi]
        paths.append(write_seq_file(base_dir, f"part{i}.parquet", part))
    return paths


_seq_file_counter = [0]


def write_seq_file(base_dir, name, row_dicts):
    """Write one plain parquet FILE (not a Spark dir) so the streaming file
    source sees exactly one file per intended micro-batch. Sets strictly
    increasing mtimes: the file source orders batches by modification time
    and breaks same-millisecond ties nondeterministically, which would
    scramble the intended batch order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    table = pa.Table.from_pylist(row_dicts, schema=schema)
    p = os.path.join(base_dir, name)
    pq.write_table(table, p)
    _seq_file_counter[0] += 1
    t = 1_700_000_000 + _seq_file_counter[0] * 10
    os.utime(p, (t, t))
    return p


def _sink_triples(job):
    out = job.result_edges()
    assert out is not None
    return {(r.s, r.p, r.o) for r in out.select("s", "p", "o").collect()}


def test_split_equals_batch(spark, tmp_path):
    """Fixture A across 3 micro-batches == one-shot batch goldens."""
    inp = str(tmp_path / "in")
    _write_batches(spark, inp, [(1, 7), (8, 10), (11, 12)])
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), TEST_CFG)
    job.run_available(max_files_per_trigger=1)
    assert _sink_triples(job) == GOLDEN_ALL
    # no duplicate idempotency keys across batches
    out = job.result_edges()
    assert out.count() == out.select("edge_hash").distinct().count()
    # 3 manifests with lineage/metrics
    ms = job.metrics()
    assert len(ms) == 3
    assert all("told_rows_by_source" in m and "closure_edges_total" in m for m in ms)


def test_late_rows_dropped_and_accounted(spark, tmp_path):
    """d00000012 (the F-equivalence axiom) arrives older than the watermark
    horizon -> dropped; closure excludes all F-derived edges; metric = 1."""
    from datetime import datetime

    inp = str(tmp_path / "in")
    _write_batches(
        spark,
        inp,
        [(1, 10), (11, 11), (12, 12)],
        ts_override={"d00000012": datetime(2020, 1, 1)},
    )
    job = IncrementalClosureJob(
        spark, inp, str(tmp_path / "work"), TEST_CFG, watermark_horizon_seconds=3600
    )
    job.run_available(max_files_per_trigger=1)
    golden_no_f = {
        t for t in GOLDEN_ALL if t[0] != FX.F_ and t != (FX.E_, T.SUBCLASSOF, FX.F_)
    }
    assert _sink_triples(job) == golden_no_f
    assert sum(m.get("n_late_dropped", 0) for m in job.metrics()) == 1


def test_resume_from_checkpoint(spark, tmp_path):
    """Kill after 2 of 3 batches; restart; final sink == goldens, no dup
    hashes, previously committed batches not re-emitted."""
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    paths = _write_batches(spark, inp, [(1, 7), (8, 10)])
    job = IncrementalClosureJob(spark, inp, work, TEST_CFG)
    job.run_available(max_files_per_trigger=1)
    n_batches_before = len(job.metrics())
    assert n_batches_before == 2

    # deliver batch 3, restart from the same checkpoint + manifest
    _df = FX.materialize_test(spark, with_ts=True)
    part = [r.asDict() for r in _df.collect() if 11 <= int(r.doc_id[1:]) <= 12]
    write_seq_file(inp, "part_late.parquet", part)
    job2 = IncrementalClosureJob(spark, inp, work, TEST_CFG)
    job2.run_available(max_files_per_trigger=1)
    assert _sink_triples(job2) == GOLDEN_ALL
    out = job2.result_edges()
    assert out.count() == out.select("edge_hash").distinct().count()
    assert len(job2.metrics()) == n_batches_before + 1


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Manually re-invoking process_batch with a committed batch_id is a
    no-op (exactly-once under replay)."""
    inp = str(tmp_path / "in")
    _write_batches(spark, inp, [(1, 12)])
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), TEST_CFG)
    job.run_available(max_files_per_trigger=None)
    before = _sink_triples(job)
    batch_df = spark.read.schema(SEQ_TS_SCHEMA).parquet(inp)
    job.process_batch(batch_df, 0)  # replay
    assert _sink_triples(job) == before == GOLDEN_ALL
    assert len(job.metrics()) == 1


def _write_token_batches(spark, base_dir, row_batches):
    """Write arbitrary token-row batches, one parquet file each."""
    from datetime import datetime, timedelta, timezone

    os.makedirs(base_dir, exist_ok=True)
    t0 = datetime(2026, 1, 1)
    doc = 0
    for i, rows in enumerate(row_batches):
        recs = []
        for toks in rows:
            doc += 1
            recs.append(
                {
                    "doc_id": f"x{doc:08d}",
                    "tokens": [int(t) for t in toks],
                    "n_tok": len(toks),
                    "source": f"batch{i}",
                    "ts": t0 + timedelta(seconds=doc),
                }
            )
        write_seq_file(base_dir, f"part{i}.parquet", recs)


def test_cross_batch_mutual_subsumption_retracts_subclass_row(spark, tmp_path):
    """equivalence_as_subclass=False: batch 1 commits (11 subClassOf 12);
    batch 2 delivers the reverse subsumption — the live sink must equal the
    one-shot batch output (reciprocal equivalentClass rows, the stale
    subclass row tombstoned). This is the ADVICE round-1 invariant case."""
    inp = str(tmp_path / "in")
    _write_token_batches(
        spark,
        inp,
        [
            [[T.AX_DECL_CLASS, 11], [T.AX_DECL_CLASS, 12], [T.AX_SUBCLASS, 11, 12]],
            [[T.AX_SUBCLASS, 12, 11]],
        ],
    )
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), TEST_CFG)
    job.run_available(max_files_per_trigger=1)
    assert _sink_triples(job) == {
        (11, T.EQUIVALENTCLASS, 12),
        (12, T.EQUIVALENTCLASS, 11),
    }
    ms = job.metrics()
    assert ms[-1]["n_tombstones"] == 1  # the stale (11, subClassOf, 12)


def test_cross_batch_late_unsat_retracts_object_rows(spark, tmp_path):
    """Batch 2 makes class 12 unsatisfiable; rows already committed with 12
    (or its newly-unsat subclasses) as object must be tombstoned so the live
    sink equals the batch semantics (which suppresses unsat objects)."""
    inp = str(tmp_path / "in")
    _write_token_batches(
        spark,
        inp,
        [
            [
                [T.AX_DECL_CLASS, 11],
                [T.AX_DECL_CLASS, 12],
                [T.AX_DECL_CLASS, 13],
                [T.AX_DECL_PROP, 21],
                [T.AX_SOME, 11, 21, 12],
                [T.AX_SUBCLASS, 13, 12],
            ],
            [[T.AX_SUBCLASS, 12, T.BOT]],
        ],
    )
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), TEST_CFG)
    job.run_available(max_files_per_trigger=1)
    # batch 1 emitted (11,21,12) and (13,subClassOf,12); both retracted
    assert _sink_triples(job) == set()
    assert job.metrics()[-1]["n_tombstones"] == 2


def _batch_golden(spark, row_batches, cfg):
    """One-shot batch materialization of the union of all stream batches."""
    from relation_graph_spark.materialize import materialize

    recs = []
    doc = 0
    for toks in (t for rows in row_batches for t in rows):
        doc += 1
        recs.append((f"x{doc:08d}", [int(x) for x in toks], len(toks), "g"))
    df = spark.createDataFrame(
        recs, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    return {(r.s, r.p, r.o) for r in materialize(df, cfg).collect()}


IND_CFG = RGConfig(
    output_subclasses=True, reflexive_subclasses=False, output_individuals=True
)

_IND_BATCHES = [
    # b0: 11, 12 classes; some(11, 21, 12); ind 91 : 11
    [
        [T.AX_DECL_CLASS, 11],
        [T.AX_DECL_CLASS, 12],
        [T.AX_DECL_PROP, 21],
        [T.AX_SOME, 11, 21, 12],
        [T.AX_CLASS_ASSERTION, 11, 91],
    ],
    # b1: 13 subClassOf 11 (new class), ind 92 : 13 -> (92, 21, 12),
    # (92, rdf:type, {13, 11}), (13, 21, 12)
    [[T.AX_DECL_CLASS, 13], [T.AX_SUBCLASS, 13, 11], [T.AX_CLASS_ASSERTION, 13, 92]],
    # b2: second derivation for already-committed individual rows:
    # 92 : 11 re-derives (92, 21, 12) and (92, rdf:type, 11) -> sink dedup
    [[T.AX_CLASS_ASSERTION, 11, 92]],
]


def test_streaming_individuals_split_equals_batch(spark, tmp_path):
    """output_individuals on the fast path: 3 micro-batches == one-shot
    batch, duplicate derivations (a second class asserting an already
    emitted individual row) deduped by the sink, no duplicate hashes."""
    inp = str(tmp_path / "in")
    _write_token_batches(spark, inp, _IND_BATCHES)
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), IND_CFG)
    job.run_available(max_files_per_trigger=1)
    assert _sink_triples(job) == _batch_golden(spark, _IND_BATCHES, IND_CFG)
    out = job.result_edges()
    assert out.count() == out.select("edge_hash").distinct().count()
    assert len(job.metrics()) == 3


def test_streaming_individuals_late_unsat_retracts_ind_rows(spark, tmp_path):
    """A late `12 subClassOf Nothing` suppresses every committed row with
    object 12 — including the individual existential rows — while rdf:type
    rows stay (not unsat-gated, mirroring the batch semantics)."""
    batches = _IND_BATCHES + [[[T.AX_SUBCLASS, 12, T.BOT]]]
    inp = str(tmp_path / "in")
    _write_token_batches(spark, inp, batches)
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), IND_CFG)
    job.run_available(max_files_per_trigger=1)
    got = _sink_triples(job)
    assert got == _batch_golden(spark, batches, IND_CFG)
    # the individual existential rows were committed then tombstoned
    assert (91, 21, 12) not in got and (92, 21, 12) not in got
    assert (91, T.RDF_TYPE, 11) in got and (92, T.RDF_TYPE, 13) in got
    assert sum(m["n_tombstones"] for m in job.metrics()) >= 4


def test_streaming_individuals_resume_from_checkpoint(spark, tmp_path):
    """Kill after 2 of 4 individuals-mode batches; a fresh job instance
    resumes from checkpoint + manifests + state store and converges to the
    batch semantics (incl. the late-unsat retraction delivered after the
    restart)."""
    batches = _IND_BATCHES + [[[T.AX_SUBCLASS, 12, T.BOT]]]
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    _write_token_batches(spark, inp, batches[:2])
    job = IncrementalClosureJob(spark, inp, work, IND_CFG)
    job.run_available(max_files_per_trigger=1)
    assert len(job.metrics()) == 2

    # deliver the remaining batches, restart with a NEW instance
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1)
    recs = []
    doc = 100
    for i, rows in enumerate(batches[2:]):
        part = []
        for toks in rows:
            doc += 1
            part.append(
                {
                    "doc_id": f"y{doc:08d}",
                    "tokens": [int(t) for t in toks],
                    "n_tok": len(toks),
                    "source": f"batch{i + 2}",
                    "ts": t0 + timedelta(seconds=doc),
                }
            )
        recs.append(part)
    for i, part in enumerate(recs):
        write_seq_file(inp, f"late{i}.parquet", part)
    job2 = IncrementalClosureJob(spark, inp, work, IND_CFG)
    job2.run_available(max_files_per_trigger=1)
    assert _sink_triples(job2) == _batch_golden(spark, batches, IND_CFG)
    out = job2.result_edges()
    assert out.count() == out.select("edge_hash").distinct().count()
    assert len(job2.metrics()) == 4


def test_lineage_running_totals(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batches(spark, inp, [(1, 7), (8, 10), (11, 12)])
    job = IncrementalClosureJob(spark, inp, str(tmp_path / "work"), TEST_CFG)
    job.run_available(max_files_per_trigger=1)
    ms = job.metrics()
    # running totals accumulate; final total = all 12 fixture rows
    assert ms[-1]["told_rows_by_source"] == {"materialize_test": 12}
    assert ms[0]["told_rows_by_source"] == {"materialize_test": 7}


def test_bucket_layout_pinned(spark, tmp_path):
    """The sink pins its bucket modulus on first use: reopening an existing
    store with a different count must fail loudly (a silent change would
    mis-prune the history anti-join and re-emit duplicates)."""
    import pytest as _pt

    from relation_graph_spark.sinks import IdempotentParquetSink

    root = str(tmp_path / "sink")
    IdempotentParquetSink(spark, root, n_buckets=32)
    IdempotentParquetSink(spark, root, n_buckets=32)  # same modulus: fine
    with _pt.raises(RuntimeError, match="n_buckets=32"):
        IdempotentParquetSink(spark, root, n_buckets=16)


def test_inmemory_sink_binding(spark, tmp_path):
    """The EdgeSink seam: running the pipeline against the in-memory binding
    produces the same live edge set as the parquet binding."""
    from relation_graph_spark.sinks import InMemoryEdgeSink

    inp = str(tmp_path / "in")
    _write_batches(spark, inp, [(1, 10), (11, 12)])
    mem = InMemoryEdgeSink(spark)
    job = IncrementalClosureJob(
        spark, inp, str(tmp_path / "work"), TEST_CFG, sink=mem
    )
    job.run_available(max_files_per_trigger=1)
    got = {(r.s, r.p, r.o) for r in mem.read().select("s", "p", "o").collect()}
    assert got == GOLDEN_ALL
    assert len(mem.metrics()) == 2


def test_stateful_dedup_operator(spark, tmp_path):
    """applyInPandasWithState seen-edge store: duplicates across micro-batches
    are emitted exactly once."""
    from relation_graph_spark.streaming.dedup_state import dedup_edges_stateful

    import pyarrow as pa
    import pyarrow.parquet as pq

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    # two batches with overlapping hashes
    pq.write_table(
        pa.table({"edge_hash": ["h1", "h2", "h1"]}), os.path.join(inp, "b0.parquet")
    )
    pq.write_table(
        pa.table({"edge_hash": ["h2", "h3"]}), os.path.join(inp, "b1.parquet")
    )

    # the session runs stateful operators on the RocksDB provider (scale
    # story: off-heap spillable state) — assert it's actually in effect
    assert "RocksDB" in spark.conf.get("spark.sql.streaming.stateStore.providerClass")

    stream = (
        spark.readStream.schema("edge_hash string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    deduped = dedup_edges_stateful(stream, n_buckets=4)
    out_dir = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [r.edge_hash for r in spark.read.parquet(out_dir).collect()]
    assert sorted(got) == ["h1", "h2", "h3"]
    # RocksDB state-store instances actually served the stateful operator
    progress = q.lastProgress
    ops = progress["stateOperators"]
    assert ops and ops[0]["numRowsTotal"] >= 1
    assert any(
        "rocksdb" in k.lower() for k in ops[0].get("customMetrics", {})
    ), ops[0]


def test_watermarked_window_aggregation(spark, tmp_path):
    """Native Spark watermark + tumbling window on a stream of sequences:
    append-mode emission after watermark passes."""
    inp = str(tmp_path / "in")
    _write_batches(spark, inp, [(1, 11), (12, 12)])
    stream = (
        spark.readStream.schema(SEQ_TS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    agg = (
        stream.withWatermark("ts", "2 seconds")
        .groupBy(F.window("ts", "5 seconds").alias("w"), "source")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "source", "n")
    )
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # rows at 1s spacing, ts 0..11 -> window [0,5) holds docs 1-5 and is
    # final once the watermark (max_ts - 2s) passes 5s; later windows may be
    # held back in append mode.
    rows = spark.read.parquet(out_dir).collect()
    got = {(r.win_start.second, r.n) for r in rows}
    assert (0, 5) in got


def test_dedup_within_watermark_operator(spark, tmp_path):
    """Native bounded-lateness dedup: duplicates within the watermark delay
    are dropped; state is evictable (contrast with the unbounded
    applyInPandasWithState store)."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from relation_graph_spark.streaming.dedup_state import dedup_edges_within_watermark

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    pq.write_table(
        pa.table({"edge_hash": ["h1", "h2", "h1"], "ts": [t(0), t(1), t(2)]}),
        os.path.join(inp, "b0.parquet"),
    )
    pq.write_table(
        pa.table({"edge_hash": ["h2", "h3"], "ts": [t(3), t(4)]}),
        os.path.join(inp, "b1.parquet"),
    )
    stream = (
        spark.readStream.schema("edge_hash string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    deduped = dedup_edges_within_watermark(stream, delay="1 hour")
    out_dir = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.edge_hash for r in spark.read.parquet(out_dir).collect())
    assert got == ["h1", "h2", "h3"]
