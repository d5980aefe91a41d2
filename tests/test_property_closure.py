"""Property-based closure correctness: random DAGs/graphs vs the DuckDB
WITH RECURSIVE oracle (SURVEY.md section 5 test strategy, item 3)."""

import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXAMPLES = 12 if os.environ.get("RGS_SLOW") else 6


def oracle_closure(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE e(child INT, parent INT)")
    if edges:
        con.executemany("INSERT INTO e VALUES (?, ?)", list(edges))
    return set(
        con.execute(
            """
            WITH RECURSIVE tc(child, parent) AS (
              SELECT DISTINCT child, parent FROM e
              UNION
              SELECT tc.child, e.parent FROM tc JOIN e ON tc.parent = e.child
            )
            SELECT child, parent FROM tc
            """
        ).fetchall()
    )


edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_closure_matches_oracle_on_random_graphs(spark, edges):
    # includes self-loops and cycles — the oracle's UNION dedup handles both,
    # and so must the engine's anti-join fixpoint
    from relation_graph_spark.closure import transitive_closure

    df = spark.createDataFrame(list(set(edges)), "child: bigint, parent: bigint")
    got = {tuple(r) for r in transitive_closure(df).collect()}
    assert got == oracle_closure(set(edges))
