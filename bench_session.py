"""Session-stream flat-cost soak (round-5 VERDICT item 1).

Runs SessionClosureStreamJob over K micro-batches of a CONSTANT workload —
U users each opening one fixed-size session per batch period, plus one
"hot" user that never goes idle (an event inside every gap window for the
whole stream). Per-batch session count and row volume are identical across
batches, so the raw per-batch wall-time flat ratio measures COST over
growing emitted history, the same methodology as bench_stream
--equiv-islands (BENCH/BASELINE.md §4.12/§4.13).

The hot user is the unbounded-open-state caveat made concrete: without
--max-session-seconds its open session accumulates every event it ever
emitted (state rows grow linearly with stream length); with the cap the
state snapshot must stay bounded by rows within ~(max + gap) of the
watermark, and the manifests count the cap-released chunks.

Usage: python bench_session.py [--batches 30] [--users 200]
       [--events 15] [--max-session-seconds 3600] [--no-cap]
Prints ONE JSON line with per_batch_sec, flat_ratio_last_over_3, p50/p99,
open-state layout (rows + files of the final snapshot), sink layout, and
forced-split accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EPOCH0 = 1_700_000_000  # base event time (all ts derive from this)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--users", type=int, default=200)
    ap.add_argument(
        "--events", type=int, default=15,
        help="events per user-session (a child->parent chain, so the "
        "per-session closure is ~E^2/2 rows — constant TC work per batch)",
    )
    ap.add_argument(
        "--max-session-seconds", type=float, default=3600.0,
        help="duration cap for the hot user's never-idle session",
    )
    ap.add_argument(
        "--no-cap", action="store_true",
        help="run WITHOUT the cap: demonstrates the documented unbounded "
        "open-state growth for the never-idle key (state rows ~ stream "
        "length instead of bounded)",
    )
    ap.add_argument(
        "--maintain-proc", action="store_true",
        help="run the `maintain` CLI against the session sink from a second "
        "process for the whole stream: major merges fold per-batch "
        "manifests into the summary, so manifest count stays bounded on a "
        "long stream and the session running totals must survive the folds",
    )
    ap.add_argument("--maintain-interval", type=float, default=5.0)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from relation_graph_spark.session import get_spark
    from relation_graph_spark.streaming.session_pipeline import (
        SessionClosureStreamJob,
    )

    spark = get_spark(
        "rgs-bench-session", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    work = tempfile.mkdtemp(prefix="rgs_bench_session_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)

    # Workload geometry (minutes): gap=30, session span=(E-1)*1, batch
    # period 60min > span+gap so batch b's sessions idle out as soon as
    # batch b+1's rows advance the watermark — every batch finalizes the
    # PREVIOUS batch's U sessions (constant per-batch finalization work).
    gap_min = 30
    period_min = 60
    schema = pa.schema(
        [
            ("user_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("child", pa.int64()),
            ("parent", pa.int64()),
        ]
    )

    def ts(minutes: float):
        return datetime.fromtimestamp(EPOCH0 + minutes * 60.0, tz=timezone.utc)

    for b in range(args.batches):
        recs = []
        base = b * period_min
        for u in range(args.users):
            # chain child->parent: closure is the quadratic upper triangle
            tok0 = (b * args.users + u) * 1000
            for e in range(args.events):
                recs.append(
                    {
                        "user_id": f"u{u:05d}",
                        "ts": ts(base + e),
                        "child": tok0 + e,
                        "parent": tok0 + e + 1,
                    }
                )
        # hot user: an event every 10 min across the whole period — its
        # gap-session NEVER closes naturally (10 < gap)
        for m in range(0, period_min, 10):
            recs.append(
                {
                    "user_id": "hot",
                    "ts": ts(base + m),
                    "child": 9_000_000 + b * 100 + m,
                    "parent": 9_000_000 + b * 100 + m + 1,
                }
            )
        path = f"{inp}/p{b:04d}.parquet"
        pq.write_table(pa.Table.from_pylist(recs, schema=schema), path)
        mt = EPOCH0 + b * 10  # strictly increasing mtimes = batch order
        os.utime(path, (mt, mt))

    cap = None if args.no_cap else args.max_session_seconds
    job = SessionClosureStreamJob(
        spark, inp, os.path.join(work, "w"), gap=f"{gap_min} minutes",
        max_session_seconds=cap,
    )

    per_batch: list[float] = []
    state_rows: list[int] = []
    state_files: list[int] = []
    orig = job.process_batch

    def timed(batch_df, batch_id):
        t0 = time.time()
        orig(batch_df, batch_id)
        per_batch.append(round(time.time() - t0, 3))
        snap = job._open_state_path(int(batch_id))
        files = [
            f for f in os.listdir(snap) if f.endswith(".parquet")
        ] if os.path.isdir(snap) else []
        state_files.append(len(files))
        import pyarrow.parquet as _pq

        state_rows.append(
            sum(_pq.ParquetFile(os.path.join(snap, f)).metadata.num_rows
                for f in files)
        )

    job.process_batch = timed
    maint_proc = None
    maintainer_ran = None
    if args.maintain_proc:
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        prev_pp = os.environ.get("PYTHONPATH")
        maint_proc = subprocess.Popen(
            [
                sys.executable, "-m", "relation_graph_spark.cli", "maintain",
                "--sink", job.sink.root, "--rounds", "0",
                "--interval-seconds", str(args.maintain_interval),
                "--master", "local[4]", "--shuffle-partitions", "8",
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT,
            # PREPEND to any existing PYTHONPATH — replacing it could break
            # the child's imports and the failure would be invisible
            env={**os.environ,
                 "PYTHONPATH": here + (os.pathsep + prev_pp if prev_pp else "")},
        )
    try:
        t0 = time.time()
        job.run_available(max_files_per_trigger=1)
        wall = round(time.time() - t0, 3)
    finally:
        # always reap the --rounds 0 child, even when the stream raises —
        # otherwise it loops forever as an orphan
        if maint_proc is not None:
            import signal

            maintainer_ran = maint_proc.poll() is None  # alive = it ran
            time.sleep(min(10.0, args.maintain_interval))
            maint_proc.send_signal(signal.SIGINT)
            try:
                maint_proc.wait(timeout=60)
            except Exception:
                maint_proc.kill()
    if args.maintain_proc:
        assert maintainer_ran, (
            "the maintain process died before the stream finished — the "
            "run's layout numbers would misrepresent a maintained stream"
        )

    # light correctness inside the soak: emit-once (no duplicate hash) and
    # the expected finalization count — (batches-1) periods of U sessions
    # finalized naturally; the hot user's chunks only under the cap
    out = job.sink.read()
    n_rows = out.count()
    n_distinct = out.select("edge_hash").distinct().count()
    assert n_rows == n_distinct, f"duplicate emissions: {n_rows} vs {n_distinct}"
    ms = job.metrics()
    finalized_total = ms[-1].get("n_sessions_finalized_total", 0)
    forced_total = ms[-1].get("n_sessions_forced_split_total", 0)
    expected_user_sessions = (args.batches - 1) * args.users
    assert finalized_total >= expected_user_sessions, (
        f"finalized {finalized_total} < expected user sessions "
        f"{expected_user_sessions}"
    )
    if cap is not None:
        assert forced_total > 0, "cap set but no forced splits counted"

    ratio = (
        round(per_batch[-1] / per_batch[2], 3) if len(per_batch) >= 3 else None
    )
    psort = sorted(per_batch)
    sink = job.sink
    layout = {
        "sink_parquet_files": sum(
            1 for _r, _d, fs in os.walk(sink.root) for f in fs
            if f.endswith(".parquet")
        ),
        "manifest_files": len(
            [f for f in os.listdir(sink.manifest_dir) if f.endswith(".json")]
        ),
        "open_state_snap_dirs": len(
            [d for d in os.listdir(job.open_dir) if d.startswith("snap-")]
        ),
    }
    print(
        json.dumps(
            {
                "metric": "session stream per-batch wall",
                "unit": "sec",
                "batches": args.batches,
                "users": args.users,
                "events_per_session": args.events,
                "max_session_seconds": cap,
                "maintained": bool(args.maintain_proc),
                "wall_sec": wall,
                "per_batch_sec": per_batch,
                "flat_ratio_last_over_3": ratio,
                "p50_sec": round(psort[len(psort) // 2], 3),
                "p99_sec": round(psort[max(0, int(len(psort) * 0.99) - 1)], 3),
                "state_rows_per_batch": state_rows,
                "state_files_per_batch": state_files,
                "emitted_rows": n_rows,
                "n_sessions_finalized_total": finalized_total,
                "n_sessions_forced_split_total": forced_total,
                "layout": layout,
            }
        )
    )


if __name__ == "__main__":
    main()
