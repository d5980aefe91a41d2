"""Tumbling / sliding / session window operators.

The reference has no windows (one ontology = one batch); these are the
streaming-tier requirements of the north rule. Each works identically on a
batch DataFrame (for oracle checks) and a streaming one (with
``withWatermark`` applied by the caller before aggregation).

All aggregate values are exact-integer (counts / quantized sums), so the
DuckDB oracles hash-match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per (tumbling window, key): count + exact centi-unit sum of `value`."""
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col(key_col),
            "n_events",
            "sum_value_c",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per sliding window: count + exact centi-unit sum (window > slide =>
    each event lands in window/slide windows)."""
    return (
        events.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value_c")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per (key, session window with `gap` inactivity): bounds + count.

    Spark's session_window end = last event ts + gap; we report
    session_start/last_event so the oracle (gaps-and-islands SQL) matches
    without re-deriving the gap arithmetic.
    """
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(F.col(key_col), "first_ts", "last_ts", "n_events")
    )


def windowed_transitive_closure(
    edges_ts: "DataFrame",
    duration: str,
    child: str = "child",
    parent: str = "parent",
    ts_col: str = "ts",
) -> "DataFrame":
    """Per-tumbling-window fixpoint (the north star's 'until fixpoint per
    window'): scope the transitive closure to each event-time window — paths
    never cross windows — computed for every window in ONE distributed job
    (the window start is just another join/dedup key; no per-window loop).
    Returns (win_start, child, parent)."""
    import pyspark.sql.functions as F

    from relation_graph_spark.closure import transitive_closure

    win_edges = edges_ts.select(
        F.window(ts_col, duration).start.alias("win_start"), child, parent
    )
    return transitive_closure(win_edges, child=child, parent=parent, group_cols=["win_start"])
