"""Skew-handling evidence for the hub-class fixture (round-1 VERDICT item 7).

The generated ontology routes ~99% of subclass edges to 1% hub classes
(fixtures.gen_ontology_spark hub_pct/hub_boost), so the closure-side join key
distribution is exactly the hub skew BASELINE.json names. Below the broadcast
threshold the hierarchy side broadcasts and skew is moot; ABOVE it the
engine's decision is: let AQE's runtime skew-join splitting handle it
(spark.sql.adaptive.skewJoin.enabled=true in session.get_spark), with
skew.salted_join as the planned fallback for AQE-less deployments.

This script produces the evidence for that decision: it forces the shuffled
path (broadcast_row_threshold=0), runs the R3 derivation over the hub
fixture with AQE skew-join ON vs OFF (and a salted variant), prints wall
times, and dumps the executed plan showing the skew=true markers.

Usage: python tools/skew_evidence.py [--classes 20000] [--some 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, n_classes, n_props, n_some, skew_join: bool, hot_threshold=None):
    import pyspark.sql.functions as F

    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.decode import decode_axioms, told_tables
    from relation_graph_spark.fixtures import gen_ontology_spark
    from relation_graph_spark.materialize import derive_relations, materialize_edges

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
    # disable auto-broadcast: at sandbox scale every hierarchy side fits the
    # 64m broadcast threshold, so the skewed shuffle never exists unless we
    # force the shuffled-join branch end to end
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # sandbox-scale AQE skew knobs (defaults target 256MB partitions)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")

    seq = gen_ontology_spark(spark, n_classes, n_props, n_some).localCheckpoint()
    told = told_tables(decode_axioms(seq))
    some = told["some"].dropDuplicates().localCheckpoint()
    m = materialize_edges(told, RGConfig())  # closure build (broadcast plan)

    kw = {"hot_key_threshold": hot_threshold} if hot_threshold else {}
    t0 = time.time()
    rel = derive_relations(m["sc_star"], some, m["sp_star"], 0, **kw)
    n = rel.count()
    wall = time.time() - t0
    plan = rel._jdf.queryExecution().executedPlan().toString()
    return wall, n, plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=20000)
    ap.add_argument("--props", type=int, default=4)
    ap.add_argument("--some", type=int, default=200000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from relation_graph_spark.session import get_spark

    spark = get_spark("rgs-skew", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)

    # measure ON first so JVM warm-up favors the later runs
    wall_on, n_on, plan = run_once(spark, args.classes, args.props, args.some, skew_join=True)
    wall_off, n_off, _ = run_once(spark, args.classes, args.props, args.some, skew_join=False)
    wall_salt, n_salt, plan_salt = run_once(
        spark, args.classes, args.props, args.some, skew_join=False,
        hot_threshold=args.some // 100,
    )
    assert n_off == n_on == n_salt, "skew-path toggle changed results"

    skew_markers = [ln.strip() for ln in plan.splitlines() if "skew=true" in ln]
    print(
        json.dumps(
            {
                "metric": "hub-skew R3 derivation (forced shuffled joins)",
                "edges": n_on,
                "wall_sec_aqe_skewjoin_off": round(wall_off, 2),
                "wall_sec_aqe_skewjoin_on": round(wall_on, 2),
                "wall_sec_hot_key_salted": round(wall_salt, 2),
                "plan_skew_join_markers": len(skew_markers),
                "sample_marker": skew_markers[0][:200] if skew_markers else None,
                "salted_plan_has_two_paths": "Union" in plan_salt,
                "classes": args.classes,
                "some": args.some,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
