"""Watermark-gated streaming session finalization (round-4 VERDICT item 2):
emit-once per-session closure, late-row session merge before the watermark
passes, too-late drop accounting, checkpoint resume."""

import glob
import os
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from relation_graph_spark.streaming.session_pipeline import SessionClosureStreamJob

T0 = datetime(2026, 1, 1)

_file_counter = [0]


def write_session_file(base_dir, name, rows):
    """One plain parquet file per intended micro-batch, strictly increasing
    mtimes (same discipline as test_streaming.write_seq_file).
    rows: list of (user_id, minutes_after_t0, child, parent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("user_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("child", pa.int64()),
            ("parent", pa.int64()),
        ]
    )
    recs = [
        {
            "user_id": u,
            "ts": T0 + timedelta(minutes=m),
            "child": c,
            "parent": p,
        }
        for (u, m, c, p) in rows
    ]
    os.makedirs(base_dir, exist_ok=True)
    path = os.path.join(base_dir, name)
    pq.write_table(pa.Table.from_pylist(recs, schema=schema), path)
    _file_counter[0] += 1
    t = 1_800_000_000 + _file_counter[0] * 10
    os.utime(path, (t, t))
    return path


def _result_set(job):
    out = job.result()
    if out is None:
        return set()
    return {
        (r.user_id, r.sess_start, r.child, r.parent)
        for r in out.collect()
    }


def _batch_oracle(spark, rows, finalized_keys=None):
    """windows.session_closure batch recompute over `rows`, optionally
    restricted to sessions of the given user set."""
    from relation_graph_spark.streaming.windows import session_closure

    df = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), c, p) for (u, m, c, p) in rows],
        "user_id: string, ts: timestamp, child: bigint, parent: bigint",
    )
    out = session_closure(df, "30 minutes", key_col="user_id")
    if finalized_keys is not None:
        out = out.where(F.col("user_id").isin(list(finalized_keys)))
    return {(r.user_id, r.sess_start, r.child, r.parent) for r in out.collect()}


def test_session_finalization_equals_batch(spark, tmp_path):
    """Sessions finalize only once the watermark strictly passes
    last_ts + gap; emitted per-session closures equal the batch recompute
    restricted to finalized sessions; open sessions emit nothing."""
    inp = str(tmp_path / "in")
    b0 = [("u1", 0, 1, 2), ("u1", 5, 2, 3), ("u2", 0, 7, 8)]
    b1 = [("u9", 120, 9, 10)]  # advances watermark to t0+2h
    write_session_file(inp, "b0.parquet", b0)
    write_session_file(inp, "b1.parquet", b1)
    job = SessionClosureStreamJob(
        spark, inp, str(tmp_path / "work"), gap="30 minutes", delay_seconds=0
    )
    job.run_available(max_files_per_trigger=1)

    # u1 closure includes the transitive 1->3; u9's session is still open
    assert _result_set(job) == _batch_oracle(
        spark, b0 + b1, finalized_keys={"u1", "u2"}
    )
    ms = job.metrics()
    assert sum(m["n_sessions_finalized"] for m in ms) == 2
    assert ms[-1]["n_sessions_finalized_total"] == 2

    # emit-once: re-running with no new input adds no manifests
    n_manifests = len(ms)
    job2 = SessionClosureStreamJob(
        spark, inp, str(tmp_path / "work"), gap="30 minutes", delay_seconds=0
    )
    job2.run_available(max_files_per_trigger=1)
    assert len(job2.metrics()) == n_manifests
    assert _result_set(job2) == _result_set(job)


def test_late_row_merges_open_sessions_before_watermark(spark, tmp_path):
    """A late-but-within-watermark row bridging two open sessions of a key
    MERGES them (native session_window semantics); the merged session
    finalizes once and its closure spans the old boundary — equal to the
    batch recompute."""
    inp = str(tmp_path / "in")
    # delay 1h keeps both of u1's sessions open through batch 0
    b0 = [("u1", 0, 1, 2), ("u1", 50, 3, 4)]
    b1 = [("u1", 25, 2, 3), ("u9", 300, 90, 91)]  # bridge + watermark flush
    write_session_file(inp, "b0.parquet", b0)
    write_session_file(inp, "b1.parquet", b1)
    job = SessionClosureStreamJob(
        spark, inp, str(tmp_path / "work"), gap="30 minutes", delay_seconds=3600
    )
    job.run_available(max_files_per_trigger=1)

    got = _result_set(job)
    assert got == _batch_oracle(spark, b0 + b1, finalized_keys={"u1"})
    # ONE merged session (sess_start = t0), containing the cross-boundary
    # transitive path 1 -> 4
    u1 = {x for x in got if x[0] == "u1"}
    assert {x[1] for x in u1} == {T0}
    assert ("u1", T0, 1, 4) in u1
    assert sum(m["n_sessions_finalized"] for m in job.metrics()) == 1


def test_too_late_row_dropped_and_counted(spark, tmp_path):
    """A row below the watermark is dropped and counted; it cannot re-open
    a session that already finalized (emit-once stays intact)."""
    inp = str(tmp_path / "in")
    b0 = [("u1", 0, 1, 2), ("u9", 300, 90, 91)]  # flush: wm = t0+4h
    b1 = [("u1", 10, 2, 3)]  # ts far below wm -> dropped
    write_session_file(inp, "b0.parquet", b0)
    write_session_file(inp, "b1.parquet", b1)
    job = SessionClosureStreamJob(
        spark, inp, str(tmp_path / "work"), gap="30 minutes", delay_seconds=3600
    )
    job.run_available(max_files_per_trigger=1)

    got = _result_set(job)
    assert {x for x in got if x[0] == "u1"} == {("u1", T0, 1, 2)}
    ms = job.metrics()
    assert sum(m["n_late_dropped"] for m in ms) == 1
    assert sum(m["n_sessions_finalized"] for m in ms) == 1


def test_session_resume_from_checkpoint(spark, tmp_path):
    """Open-session state survives a restart: rows arriving after resume
    merge into sessions opened before it; final output equals the batch
    recompute; open state is persisted per committed batch and GC'd."""
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    b0 = [("u1", 0, 1, 2)]
    write_session_file(inp, "b0.parquet", b0)
    job1 = SessionClosureStreamJob(
        spark, inp, work, gap="30 minutes", delay_seconds=0
    )
    job1.run_available(max_files_per_trigger=1)
    assert _result_set(job1) == set()  # nothing finalized yet

    b1 = [("u1", 20, 2, 3)]  # extends the open session across the restart
    b2 = [("u9", 240, 90, 91)]  # flush
    write_session_file(inp, "b1.parquet", b1)
    write_session_file(inp, "b2.parquet", b2)
    job2 = SessionClosureStreamJob(
        spark, inp, work, gap="30 minutes", delay_seconds=0
    )
    job2.run_available(max_files_per_trigger=1)
    assert _result_set(job2) == _batch_oracle(
        spark, b0 + b1 + b2, finalized_keys={"u1"}
    )
    # one emitted manifest per batch, session emitted in exactly one batch
    assert sum(m["n_sessions_finalized"] for m in job2.metrics()) == 1
    # superseded open-state snapshots are GC'd
    snaps = glob.glob(os.path.join(work, "open_state", "snap-*"))
    assert len(snaps) == 1


def test_session_crash_between_state_and_commit(spark, tmp_path):
    """Crash injected AFTER the batch's open-state snapshot is written but
    BEFORE its sink commit (the session job's load-bearing ordering,
    session_pipeline.process_batch): the replay must re-run the batch —
    the orphan snapshot is ignored (not committed), lateness decisions
    repeat identically (watermark from the last COMMITTED manifest), each
    finalized session is emitted exactly once, and the final result equals
    an uninterrupted control run."""
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    ctrl_in = str(tmp_path / "ctrl_in")
    ctrl_work = str(tmp_path / "ctrl_work")

    b0 = [("u1", 0, 1, 2), ("u1", 5, 2, 3)]
    # b1 finalizes u1 (wm=240 > 5+30) while u2/u3 stay open (230+30, 240+30
    # both >= 240) — the crash lands on a batch that BOTH emits and carries
    # open state
    b1 = [("u2", 230, 10, 11), ("u3", 240, 50, 51)]
    b2 = [("u9", 600, 90, 91)]  # flush: finalizes u2 and u3
    for d in (inp, ctrl_in):
        write_session_file(d, "b0.parquet", b0)
        write_session_file(d, "b1.parquet", b1)
        write_session_file(d, "b2.parquet", b2)

    job1 = SessionClosureStreamJob(
        spark, inp, work, gap="30 minutes", delay_seconds=0
    )
    orig_append = job1.sink.append

    def crashing_append(df, batch_id, **kw):
        if int(batch_id) == 1:
            raise RuntimeError("injected crash before sink commit")
        return orig_append(df, batch_id, **kw)

    job1.sink.append = crashing_append
    try:
        job1.run_available(max_files_per_trigger=1)
        raise AssertionError("injected crash did not propagate")
    except Exception as e:
        assert "injected crash" in str(e)
    # the orphan state snapshot exists on disk but its batch never committed
    assert os.path.isdir(os.path.join(work, "open_state", "snap-1"))
    assert 1 not in set(job1.sink.committed_batches())

    job2 = SessionClosureStreamJob(
        spark, inp, work, gap="30 minutes", delay_seconds=0
    )
    job2.run_available(max_files_per_trigger=1)

    ctrl = SessionClosureStreamJob(
        spark, ctrl_in, ctrl_work, gap="30 minutes", delay_seconds=0
    )
    ctrl.run_available(max_files_per_trigger=1)

    assert _result_set(job2) == _result_set(ctrl) == _batch_oracle(
        spark, b0 + b1 + b2, finalized_keys={"u1", "u2", "u3"}
    )
    # exactly-once across the crash: each session in exactly one manifest,
    # totals equal the control's
    assert sum(m["n_sessions_finalized"] for m in job2.metrics()) == 3
    assert (
        job2.metrics()[-1]["n_sessions_finalized_total"]
        == ctrl.metrics()[-1]["n_sessions_finalized_total"]
        == 3
    )
    out = job2.result()
    assert out.count() == out.dropDuplicates().count()


def _chunked_oracle(spark, rows, max_seconds, gap="30 minutes"):
    """Batch reference for the duration cap: sessionize, greedy-chunk with
    split_long_sessions, then grouped transitive closure per chunk."""
    from relation_graph_spark.closure import transitive_closure
    from relation_graph_spark.streaming.windows import (
        assign_sessions,
        split_long_sessions,
    )

    df = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), c, p) for (u, m, c, p) in rows],
        "user_id: string, ts: timestamp, child: bigint, parent: bigint",
    )
    tagged = assign_sessions(df, gap, key_col="user_id",
                             order_cols=["child", "parent"])
    chunked = split_long_sessions(tagged, max_seconds, key_col="user_id")
    closed = transitive_closure(
        chunked.select("user_id", "sess_start", "child", "parent").where(
            F.col("child") != F.col("parent")
        ),
        group_cols=["user_id", "sess_start"],
    )
    return {(r.user_id, r.sess_start, r.child, r.parent) for r in closed.collect()}


def test_split_long_sessions_greedy_chunks(spark):
    """Batch operator semantics: chunk k spans [a_k, a_k+max] anchored at
    the first event after the previous boundary; under-cap sessions pass
    through untouched."""
    from relation_graph_spark.streaming.windows import (
        assign_sessions,
        split_long_sessions,
    )

    # one session (all gaps <= 30min): events at 0,20,40,...,180 minutes;
    # cap 60min -> greedy chunks {0..60},{80..140},{160,180}
    rows = [("u1", m, m, m + 1) for m in range(0, 181, 20)]
    rows += [("u2", 0, 1, 2), ("u2", 10, 2, 3)]  # under cap: untouched
    df = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), c, p) for (u, m, c, p) in rows],
        "user_id: string, ts: timestamp, child: bigint, parent: bigint",
    )
    tagged = assign_sessions(df, "30 minutes", key_col="user_id",
                             order_cols=["child", "parent"])
    out = split_long_sessions(tagged, 3600.0, key_col="user_id")
    got = {
        (r.user_id, (r.sess_start - T0).total_seconds() / 60,
         (r.ts - T0).total_seconds() / 60)
        for r in out.collect()
    }
    expect = {("u2", 0.0, 0.0), ("u2", 0.0, 10.0)}
    for m in range(0, 181, 20):
        anchor = 0.0 if m <= 60 else (80.0 if m <= 140 else 160.0)
        expect.add(("u1", anchor, float(m)))
    assert got == expect


def test_never_idle_key_state_bounded_and_splits_counted(spark, tmp_path):
    """Round-5 VERDICT item 3: a key emitting events forever within the gap
    (its session never goes idle) keeps open state BOUNDED under
    max_session_seconds, the cap-released chunks are counted in the
    manifest, and the emitted union equals the batch chunked recompute."""
    in_dir = str(tmp_path / "in")
    # u1 never idles: an event every 20 minutes across 5 micro-batches
    # (total span 33h >> cap); u2 is a normal short session
    all_rows = []
    batches = []
    for b in range(5):
        rows = [("u1", b * 400 + i * 20, b * 1000 + i, b * 1000 + i + 1)
                for i in range(20)]
        if b == 0:
            rows += [("u2", 0, 7, 8), ("u2", 10, 8, 9)]
        batches.append(rows)
        all_rows += rows
    for b, rows in enumerate(batches):
        write_session_file(in_dir, f"b{b}.parquet", rows)
    job = SessionClosureStreamJob(
        spark, in_dir, str(tmp_path / "work"), gap="30 minutes",
        max_session_seconds=3600.0,
    )
    job.run_available(max_files_per_trigger=1)

    ms = job.metrics()
    assert ms[-1]["n_sessions_forced_split_total"] > 0
    # open state bounded: at most rows within ~(max+gap) of the final
    # watermark = 90min/20min-per-event + slack, nowhere near the 100
    # lifetime rows of u1
    snaps = sorted(glob.glob(os.path.join(str(tmp_path / "work"),
                                          "open_state", "snap-*")))
    last_rows = spark.read.parquet(snaps[-1]).count()
    assert 0 < last_rows <= 8
    # single-file state snapshots (round-5 file discipline)
    assert len(glob.glob(os.path.join(snaps[-1], "*.parquet"))) == 1

    # emitted chunks equal the batch chunked recompute, restricted to
    # chunks finalized by the final watermark (wm = max ts seen)
    final_wm = max(m for (_u, m, _c, _p) in all_rows) * 60.0
    oracle = _chunked_oracle(spark, all_rows, 3600.0)
    t0_epoch = T0.timestamp()
    expect = {
        (u, s, c, p) for (u, s, c, p) in oracle
        # finalized iff wm strictly passed anchor+max OR last+gap; in this
        # layout every u1 chunk but the open tail satisfies the first rule
        if (s.timestamp() - t0_epoch) + 3600.0 < final_wm
        or u == "u2"  # u2 idles out naturally long before the end
    }
    assert _result_set(job) == expect


def test_cap_equals_uncapped_when_under_limit(spark, tmp_path):
    """A cap larger than every session's span must not change emissions —
    the forced rule only ever releases chunks the natural rule would have
    (eventually) released with identical content."""
    in_dir = str(tmp_path / "in")
    rows1 = [("a", 0, 1, 2), ("a", 10, 2, 3), ("b", 5, 4, 5)]
    rows2 = [("a", 300, 9, 9)]  # idle-out pusher: watermark past last+gap
    write_session_file(in_dir, "b0.parquet", rows1)
    write_session_file(in_dir, "b1.parquet", rows2)
    capped = SessionClosureStreamJob(
        spark, in_dir, str(tmp_path / "w1"), gap="30 minutes",
        max_session_seconds=86400.0,
    )
    capped.run_available()
    plain = SessionClosureStreamJob(
        spark, in_dir, str(tmp_path / "w2"), gap="30 minutes",
    )
    plain.run_available()
    assert _result_set(capped) == _result_set(plain)
    assert capped.metrics()[-1]["n_sessions_forced_split_total"] == 0


def test_cli_session_subcommand(spark, tmp_path):
    """`relation-graph-spark session` drives SessionClosureStreamJob:
    run-available over the files present, resume picks up a later file,
    final emissions equal a direct library run; the duration cap flag
    reaches the job."""
    from relation_graph_spark import cli

    in_dir = str(tmp_path / "in")
    write_session_file(in_dir, "b0.parquet",
                       [("a", 0, 1, 2), ("a", 5, 2, 3), ("b", 1, 4, 5)])
    args = [
        "session", "--input", in_dir, "--work-dir", str(tmp_path / "w"),
        "--gap", "30 minutes", "--max-session-seconds", "7200",
    ]
    assert cli.main(args) == 0
    # second file idles both sessions out; re-run resumes from checkpoint
    write_session_file(in_dir, "b1.parquet", [("c", 500, 9, 9)])
    assert cli.main(args) == 0

    lib = SessionClosureStreamJob(
        spark, in_dir, str(tmp_path / "lib"), gap="30 minutes",
        max_session_seconds=7200.0,
    )
    lib.run_available()
    cli_job = SessionClosureStreamJob(
        spark, in_dir, str(tmp_path / "w"), gap="30 minutes",
        max_session_seconds=7200.0,
    )
    assert _result_set(cli_job) == _result_set(lib) != set()
