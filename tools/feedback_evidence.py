"""Evidence: R4 feedback rounds cost O(round delta), not O(full recompute).

Measures `materialize` wall time on a generated base ontology (no
equivalence feedback -> exactly one full R3 pass) vs the same base plus a
k-link equivalence-definition chain that forces k+1 feedback rounds. Under
the pre-round-3 design every feedback round recomputed the FULL class
closure and the FULL R3 derivation, so wall would scale ~(k+1) x base.
With the incremental loop (closure.incremental_tc + delta-restricted R3
per round) the extra rounds only pay per-round fixed costs plus
delta-sized joins, so wall should stay close to the base run.

Usage: python tools/feedback_evidence.py [--classes 20000] [--some 100000]
       [--chain 6]
Prints ONE JSON line with both walls and the ratio.
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
    ap.add_argument("--classes", type=int, default=20000)
    ap.add_argument("--props", type=int, default=4)
    ap.add_argument("--some", type=int, default=100000)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from relation_graph_spark import tokens as T
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.fixtures import _rows_to_df, gen_ontology_rows
    from relation_graph_spark.materialize import materialize
    from relation_graph_spark.session import get_spark

    spark = get_spark(
        "rgs-feedback-evidence",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    base = gen_ontology_rows(args.classes, args.props, args.some)
    # chain tokens above the generated range: A sub (p some D1); Ei eq
    # (p some Di); Ei sub (p some D(i+1)) -> k+1 feedback rounds
    hi = 1 << 22
    A, p = hi, 21
    D = [hi + 100 + i for i in range(args.chain)]
    E = [hi + 200 + i for i in range(args.chain)]
    chain = [[T.AX_SOME, A, p, D[0]]]
    chain += [[T.AX_EQUIV_SOME, E[i], p, D[i]] for i in range(args.chain)]
    chain += [[T.AX_SOME, E[i], p, D[i + 1]] for i in range(args.chain - 1)]

    cfg = RGConfig(output_subclasses=False)

    def run(rows, tag):
        df = _rows_to_df(spark, rows, tag)
        t0 = time.time()
        n = materialize(df, cfg).count()
        return round(time.time() - t0, 3), n

    wall_feedback, n_feedback = run(base + chain, "base_chain")
    wall_base, n_base = run(base, "base")

    print(
        json.dumps(
            {
                "metric": "R4 feedback-round cost (incremental vs base)",
                "wall_base_sec": wall_base,
                "wall_with_chain_sec": wall_feedback,
                "ratio": round(wall_feedback / wall_base, 3),
                "feedback_rounds": args.chain + 1,
                "edges_base": n_base,
                "edges_with_chain": n_feedback,
                "classes": args.classes,
                "some": args.some,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
