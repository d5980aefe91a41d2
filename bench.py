"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "edges_per_sec": ...}

Queries cover the engine core (closure fixpoint on a generated ontology with
hub skew — the BASELINE.md target metric is its output edges/sec), the star-
schema operator suite at $SPARK_GRAFT_SF_DIR, and the streaming pipeline.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32) -> master local[N] and shuffle partitions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # ontology scale for the closure benchmark (edges/sec headline)
    n_classes = int(os.environ.get("SPARK_GRAFT_BENCH_CLASSES", "20000"))
    n_props = int(os.environ.get("SPARK_GRAFT_BENCH_PROPS", "8"))
    n_some = int(os.environ.get("SPARK_GRAFT_BENCH_SOME", "100000"))

    import __spark_entry__ as entrymod
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.fixtures import gen_ontology_spark
    from relation_graph_spark.materialize import materialize
    from relation_graph_spark.session import get_spark

    spark = get_spark(
        "rgs-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    timings: dict[str, float] = {}
    edges_out = 0

    # 1) headline: R1-R4 materialization of the generated skewed ontology
    t0 = time.time()
    seq = gen_ontology_spark(spark, n_classes, n_props, n_some).localCheckpoint()
    gen_sec = time.time() - t0
    cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
    t0 = time.time()
    edges_out = materialize(seq, cfg).count()
    timings["materialize_gen"] = round(time.time() - t0, 3)
    edges_per_sec = round(edges_out / timings["materialize_gen"], 1)

    # 2) star-schema operator suite
    qs = entrymod.queries()
    suite = [
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
    import pyspark.sql.functions as F

    for name in suite:
        t0 = time.time()
        out = qs[name](spark, sf_dir)
        # consume every output column: a bare count() lets Catalyst prune
        # projection-only work (e.g. text_quality would time an input-row
        # count, not the regex analysis)
        out.agg(F.expr(f"bit_xor(xxhash64({', '.join(out.columns)}))")).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (closure fixpoint + operator suite)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "edges_per_sec": edges_per_sec,
                "closure_output_edges": edges_out,
                "gen_input_rows": seq.count(),
                "gen_build_sec": round(gen_sec, 3),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
