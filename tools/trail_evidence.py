"""Told-trail size-tiered merge evidence (round-5 VERDICT item 2 'Done' bar).

Simulates a long stream's trail maintenance: K constant-size snapshot
intervals are folded inline (`fold_through`), and after each fold an
out-of-band `compact()` pass runs (the `maintain` loop's schedule). Records
per pass: wall seconds, bytes the pass actually rewrote (the merged source
dirs), live trail dir count, and files in the newest dir.

What bounded-per-pass means for an LSM tier (and what this measures):
- per-pass rewritten bytes track the TIER being merged, not the stream
  length — most passes rewrite ~2 intervals; the rare full cascade (the
  binary-counter carry) rewrites more but runs as a WIDE parallel job
  (repartitioned to ceil(bytes/RGS_TRAIL_FILE_BYTES) tasks), never one task;
- total rewrite amplification over the run ~= log2(intervals) — each row is
  rewritten O(log n) times across the stream's life;
- trail dir count stays O(log n); files per dir track dir bytes.

Usage: python tools/trail_evidence.py [--intervals 24] [--rows 60000]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# small target file size so multi-file parallel writes are visible at
# local test scale (the default is 64 MiB)
os.environ.setdefault("RGS_TRAIL_FILE_BYTES", str(256 << 10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--intervals", type=int, default=24)
    ap.add_argument("--rows", type=int, default=60_000,
                    help="told rows per snapshot interval (constant)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from relation_graph_spark.session import get_spark
    from relation_graph_spark.told_trail import ToldTrail

    spark = get_spark("rgs-trail-evidence", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    root = tempfile.mkdtemp(prefix="rgs_trail_ev_")
    trail = ToldTrail(spark, root)

    def live_dirs():
        return trail._trails()

    def dir_bytes():
        return {d: trail._dir_bytes(os.path.join(root, d))
                for _lo, _hi, d in live_dirs()}

    passes = []
    for i in range(args.intervals):
        df = spark.range(i * args.rows, (i + 1) * args.rows).select(
            F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit(i).alias("interval"),
        )
        trail.write_batch(df, batch_id=i)
        trail.fold_through(i)
        before = dir_bytes()
        t0 = time.time()
        merged = trail.compact()
        dt = round(time.time() - t0, 3)
        after = dir_bytes()
        # bytes the pass rewrote = sources that disappeared (merged away)
        rewritten = sum(b for d, b in before.items() if d not in after)
        newest = max(live_dirs(), key=lambda t: t[1])[2]
        n_files = len([
            f for f in os.listdir(os.path.join(root, newest))
            if f.endswith(".parquet")
        ])
        passes.append(
            {
                "interval": i,
                "merged": bool(merged),
                "pass_sec": dt,
                "rewritten_bytes": rewritten,
                "live_dirs": len(after),
                "newest_dir_files": n_files,
                "newest_dir_bytes": after.get(newest, 0),
            }
        )

    # invariants: no rows lost, dedup intact
    total = trail.read()
    n = total.count()
    nd = total.select("doc_id").distinct().count()
    assert n == nd == args.intervals * args.rows, (n, nd)

    total_bytes = sum(dir_bytes().values())
    total_rewritten = sum(p["rewritten_bytes"] for p in passes)
    print(
        json.dumps(
            {
                "metric": "told-trail size-tiered merge per-pass cost",
                "intervals": args.intervals,
                "rows_per_interval": args.rows,
                "trail_file_bytes": int(os.environ["RGS_TRAIL_FILE_BYTES"]),
                "passes": passes,
                "final_live_dirs": len(live_dirs()),
                "final_total_bytes": total_bytes,
                "rewrite_amplification": round(total_rewritten / total_bytes, 2),
                "log2_intervals": round(math.log2(args.intervals), 2),
                "max_pass_sec": max(p["pass_sec"] for p in passes),
                "rows_verified": n,
            }
        )
    )


if __name__ == "__main__":
    main()
