"""Plan audit: sweep every driver-contract query's optimized/physical plan
for scale anti-patterns.

Flags:
- per-row Python UDFs (BatchEvalPython) — only Arrow-batched exchange
  (ArrowEvalPython / MapInPandas / PythonMapInArrow / FlatMapGroupsInPandas)
  is allowed in this engine;
- un-partitioned row_number windows whose input is not a bounded survivor
  set (allowlist carries the justification per query);
- CartesianProduct without a broadcast side.

Streaming / multi-job queries (rg_incremental_*) are exercised end-to-end
elsewhere; here they are skipped because their returned frame is a sink
read, not the pipeline plan.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
Exit code 1 if any un-allowlisted finding appears; prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, pattern) pairs that are justified; the justification is the value
ALLOWLIST = {
    # final merge windows over <= k*n_groups survivor rows
    ("ann_cosine_topk", "global_window"): "stage-2 merge over <= k*64 survivors",
    ("ann_bucketed_topk", "global_window"): "stage-2 merge over <= k*64 survivors",
    ("ann_ivf_topk", "global_window"): "probe ranking over n_centroids rows + stage-2 merge over <= k*64 survivors",
}

SKIP = {
    "rg_incremental_stream",
    "rg_incremental_individuals",
    "win_session_finalize_stream",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from relation_graph_spark.session import get_spark

    spark = get_spark("rgs-plan-audit", master="local[8]", shuffle_partitions=8)
    import __spark_entry__ as entry

    findings: list[dict] = []
    audited = 0
    for name, fn in entry.queries().items():
        if name in SKIP:
            continue
        df = fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        opt = qe.optimizedPlan().toString()
        phys = qe.executedPlan().toString()
        audited += 1

        if "BatchEvalPython" in phys:
            findings.append({"query": name, "kind": "per_row_python_udf"})
        if re.search(r"CartesianProduct", phys) and "Broadcast" not in phys:
            findings.append({"query": name, "kind": "cartesian_no_broadcast"})
        # windowspecdefinition with an empty partition clause: the spec
        # string starts directly with the ordering expression's sort order
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", opt):
            inner = m.group(1)
            first = inner.split(",")[0].strip()
            if (" ASC" in first or " DESC" in first) and (
                name,
                "global_window",
            ) not in ALLOWLIST:
                findings.append({"query": name, "kind": "global_window"})
                break

    print(
        json.dumps(
            {
                "metric": "plan audit (contract queries)",
                "audited": audited,
                "skipped": sorted(SKIP),
                "findings": findings,
                "allowlist": {f"{k[0]}:{k[1]}": v for k, v in ALLOWLIST.items()},
            }
        )
    )
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
