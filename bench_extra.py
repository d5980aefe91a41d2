"""Per-query isolation bench (guide §1.4): NOT the frozen driver bench.

Times each named suite query with the same consumption as bench.py (the
bit_xor(xxhash64(*)) full-column agg), labels jobs, counts Spark jobs per
query via job groups, and optionally dumps `.explain("formatted")` to
plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--plans TAG] [--queries q1,q2,...] [--gen]

  --gen          also run the materialize_gen headline (same params as bench.py)
  --plans TAG    write plans/r07/<q>_<TAG>.txt explain dumps
  --queries ...  comma list (default: the bench.py suite)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SUITE = [
    "rg_tc_orders_forest",
    "rg_exist_rel_star",
    "agg_pricing_summary",
    "agg_region_revenue",
    "win_session_user",
    "win_sliding",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
    "rg_incremental_stream",
]


def _dump_plan(df, path: str) -> None:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from relation_graph_spark.session import get_spark

    spark = get_spark("rgs-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = args.queries.split(",") if args.queries else list(SUITE)
    qs = entrymod.queries()
    timings: dict[str, list[float]] = {}
    jobs: dict[str, int] = {}

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    if args.gen:
        from relation_graph_spark.config import RGConfig
        from relation_graph_spark.fixtures import gen_ontology_spark
        from relation_graph_spark.materialize import materialize

        n_classes = int(os.environ.get("SPARK_GRAFT_BENCH_CLASSES", "20000"))
        n_props = int(os.environ.get("SPARK_GRAFT_BENCH_PROPS", "8"))
        n_some = int(os.environ.get("SPARK_GRAFT_BENCH_SOME", "100000"))
        for rep in range(args.repeat):
            sc.setJobGroup(f"materialize_gen#{rep}", "materialize_gen")
            t0 = time.time()
            seq = gen_ontology_spark(spark, n_classes, n_props, n_some).localCheckpoint()
            gen_sec = time.time() - t0
            cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
            t0 = time.time()
            out = materialize(seq, cfg)
            if args.plans and rep == 0:
                _dump_plan(out, os.path.join(plans_dir, f"materialize_gen_{args.plans}.txt"))
            n = out.count()
            dt = time.time() - t0
            timings.setdefault("materialize_gen", []).append(round(dt, 3))
            jobs["materialize_gen"] = len(tracker.getJobIdsForGroup(f"materialize_gen#{rep}"))
            print(f"materialize_gen[{rep}]: {dt:.2f}s ({n} edges, gen {gen_sec:.2f}s, "
                  f"{jobs['materialize_gen']} jobs)", flush=True)

    for name in names:
        for rep in range(args.repeat):
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            out = qs[name](spark, sf_dir)
            if args.plans and rep == 0:
                _dump_plan(out, os.path.join(plans_dir, f"{name}_{args.plans}.txt"))
            out.agg(F.expr(f"bit_xor(xxhash64({', '.join(out.columns)}))")).collect()
            dt = time.time() - t0
            timings.setdefault(name, []).append(round(dt, 3))
            jobs[name] = len(tracker.getJobIdsForGroup(group))
            print(f"{name}[{rep}]: {dt:.2f}s ({jobs[name]} jobs)", flush=True)

    print(json.dumps({"timings": timings, "jobs": jobs, "sf": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
