"""Streaming flat-cost benchmark (round-1 VERDICT item 2 'Done' bar).

Runs the incremental pipeline over K micro-batches of a generated monotone
ontology (no equivalence feedback -> fast path) and prints per-batch wall
times. With delta-sized emission + delta-sized state persistence the
per-batch cost must stay roughly flat as committed history grows (late
batches ~ early batches), instead of growing with O(total history) like the
round-1 rewrite-everything design.

Usage: python bench_stream.py [--batches 10] [--classes 4000] [--some 20000]
Prints ONE JSON line {"metric": "stream per-batch wall", "per_batch_sec":
[...], "flat_ratio_last_over_3": r, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--classes", type=int, default=4000)
    ap.add_argument("--props", type=int, default=4)
    ap.add_argument("--some", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ["RGS_PRUNE_EVIDENCE"] = "1"
    from relation_graph_spark import incremental
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.fixtures import gen_ontology_rows, _rows_to_df
    from relation_graph_spark.materialize import materialize
    from relation_graph_spark.session import get_spark
    from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

    spark = get_spark("rgs-bench-stream", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)

    rows = gen_ontology_rows(args.classes, args.props, args.some)
    work = tempfile.mkdtemp(prefix="rgs_bench_stream_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)

    # write one parquet FILE per micro-batch (equal row slices)
    df_all = _rows_to_df(spark, rows, "bench", with_ts=True)
    recs = [r.asDict() for r in df_all.collect()]
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
    k = (len(recs) + args.batches - 1) // args.batches
    for i in range(args.batches):
        part = recs[i * k : (i + 1) * k]
        pq.write_table(pa.Table.from_pylist(part, schema=schema), f"{inp}/p{i:04d}.parquet")

    cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
    job = IncrementalClosureJob(spark, inp, os.path.join(work, "w"), cfg)

    per_batch: list[float] = []
    orig = job.process_batch

    def timed(batch_df, batch_id):
        t0 = time.time()
        orig(batch_df, batch_id)
        per_batch.append(round(time.time() - t0, 3))

    job.process_batch = timed
    t0 = time.time()
    job.run_available(max_files_per_trigger=1)
    wall = round(time.time() - t0, 3)

    # correctness: stream == one-shot batch
    stream_set = {
        (r.s, r.p, r.o) for r in job.result_edges().select("s", "p", "o").collect()
    }
    batch_set = {
        (r.s, r.p, r.o)
        for r in materialize(_rows_to_df(spark, rows, "bench"), cfg).collect()
    }
    assert stream_set == batch_set, (
        f"stream != batch: {len(stream_set)} vs {len(batch_set)}"
    )

    ratio = (
        round(per_batch[-1] / per_batch[2], 3) if len(per_batch) >= 3 else None
    )
    # bucket-pruned history-join evidence: per fast-path batch, the bytes the
    # rel-history anti-join scans (delta-touched bucket dirs) vs the total
    # persisted rel state at that moment
    prune = [
        {
            **s,
            "scan_fraction": (
                round(s["touched_bytes"] / s["total_bytes"], 4)
                if s["total_bytes"]
                else None
            ),
        }
        for s in incremental.PRUNE_STATS
    ]
    print(
        json.dumps(
            {
                "metric": "stream per-batch wall (flat-cost evidence)",
                "value": wall,
                "unit": "sec",
                "per_batch_sec": per_batch,
                "flat_ratio_last_over_3": ratio,
                "batches": args.batches,
                "edges_total": len(stream_set),
                "classes": args.classes,
                "some": args.some,
                "cpus": args.cpus,
                "rel_buckets": incremental.REL_BUCKETS,
                "history_join_pruning": prune,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
