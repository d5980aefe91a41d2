"""Decision record: min-label vs large-star/small-star connected components.

Two workload shapes:
- `stars`: many shallow star components (the real near-duplicate shape —
  one canonical doc + k near-copies). Diameter 2.
- `chain`: one deep path component (adversarial: transitive near-dup
  chains / crawl mirror chains). Diameter = length.

min-label propagation costs O(diameter) rounds; large-star/small-star
costs O(log^2 n) rounds regardless of diameter. This prints the measured
walls so BENCH/BASELINE.md can record which tier to use where.

Usage: python tools/cc_evidence.py [--stars 20000] [--k 4] [--chain 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stars", type=int, default=20000)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--chain", type=int, default=2000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from relation_graph_spark.ops.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )
    from relation_graph_spark.session import get_spark

    spark = get_spark(
        "rgs-cc-evidence", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )

    def bench(fn, docs, pairs, max_iterations):
        t0 = time.time()
        n = fn(docs, pairs, max_iterations=max_iterations).select(
            "cluster_id"
        ).distinct().count()
        return round(time.time() - t0, 3), n

    results = {}

    # shallow stars: root r has k satellites
    star_pairs = spark.range(args.stars * args.k).selectExpr(
        "id div %d * %d AS doc_a" % (args.k, args.k + 1),
        "id div %d * %d + id %% %d + 1 AS doc_b" % (args.k, args.k + 1, args.k),
    )
    star_docs = spark.range(args.stars * (args.k + 1)).selectExpr("id AS doc_id")
    for name, fn in (("min_label", duplicate_clusters), ("star", duplicate_clusters_star)):
        wall, n = bench(fn, star_docs, star_pairs, 50)
        results[f"stars_{name}_sec"] = wall
        results[f"stars_{name}_components"] = n

    # deep chain
    chain_pairs = spark.range(args.chain).selectExpr(
        "id AS doc_a", "id + 1 AS doc_b"
    )
    chain_docs = spark.range(args.chain + 1).selectExpr("id AS doc_id")
    wall, n = bench(duplicate_clusters_star, chain_docs, chain_pairs, 50)
    results["chain_star_sec"], results["chain_star_components"] = wall, n
    try:
        wall, n = bench(duplicate_clusters, chain_docs, chain_pairs, 50)
        results["chain_min_label_sec"] = wall
        results["chain_min_label_components"] = n
    except RuntimeError as e:
        results["chain_min_label_sec"] = None
        results["chain_min_label_error"] = str(e)

    print(
        json.dumps(
            {
                "metric": "connected-components tier decision (min-label vs star)",
                **results,
                "stars": args.stars,
                "k": args.k,
                "chain": args.chain,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
