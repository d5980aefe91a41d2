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


def assign_sessions(
    edges_ts: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Tag every row with its session start (gaps-and-islands): a new
    session opens when the gap since the key's previous event EXCEEDS
    `gap` — the exact semantics of Spark's `session_window` (a session
    spans [first_ts, last_ts + gap] and touching ranges merge: an event
    landing exactly on the close boundary EXTENDS the session; equivalence
    asserted in tests/test_streaming.py gap-boundary test).

    Physical shape: ONE shuffle on `key_col` + a per-key sort (two window
    functions over the same frame collapse into a single Window exec) — no
    per-session collect_list, no driver loop. Hot keys are the skew caveat;
    at cluster scale a key with pathological volume would route through the
    same salting discipline as R3 (skew module)."""
    from pyspark.sql import Window

    gap_expr = f"INTERVAL {gap}"
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in (order_cols or [])]
    )
    prev_ts = F.lag(ts_col).over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(gap_expr)),
        1,
    ).otherwise(0)
    # explicit ROWS frame: the default RANGE frame would include ts-peers
    # of the current row and mis-assign islands under tied timestamps
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_island = edges_ts.withColumn("_island", F.sum(new_s).over(w_run))
    sess = Window.partitionBy(key_col, "_island")
    return with_island.withColumn(
        "sess_start", F.min(ts_col).over(sess)
    ).drop("_island")


def session_closure(
    edges_ts: DataFrame,
    gap: str = "30 minutes",
    child: str = "child",
    parent: str = "parent",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-session fixpoint (SURVEY.md 7.2(d)): transitive closure scoped to
    each (key, session window with `gap` inactivity) — paths never cross
    sessions — computed for ALL sessions in one distributed job (the
    session start is just another join/dedup key; no per-session loop).
    Returns (key_col, sess_start, child, parent).

    Late-data semantics under recompute: a late row landing between two
    previously-separate sessions of a key MERGES them (its arrival closes
    the gap), and the merged session's closure connects paths that crossed
    the old boundary — asserted by the reopen test in tests/. In a
    streaming deployment this is exactly why session-window state must stay
    open until the watermark passes sess_end + gap; after that the
    assignment is final and the per-session closure is append-only."""
    from relation_graph_spark.closure import transitive_closure

    tagged = assign_sessions(
        edges_ts, gap=gap, ts_col=ts_col, key_col=key_col,
        order_cols=[child, parent],
    ).select(key_col, "sess_start", child, parent)
    return transitive_closure(
        tagged, child=child, parent=parent, group_cols=[key_col, "sess_start"]
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


def split_long_sessions(
    tagged: DataFrame,
    max_seconds: float,
    ts_col: str = "ts",
    key_col: str = "user_id",
    max_rounds: int = 64,
) -> DataFrame:
    """Forced duration split (round-5 VERDICT item 3, batch form): GREEDY
    chunking of each assigned session into segments of duration <= 
    ``max_seconds`` — chunk k spans [a_k, a_k + max_seconds] with a_0 the
    session start and a_{k+1} the first event strictly after a_k's
    boundary. Input rows must carry ``sess_start`` (from assign_sessions);
    output rows have ``sess_start`` REPLACED by their chunk's anchor.

    Greedy re-anchoring (rather than a fixed epoch grid) is what makes the
    STREAMING deployment stateless-beyond-open-rows: once a chunk is
    emitted its rows leave state, and the next anchor is derivable from the
    remaining open rows alone (min ts) — no persisted anchor column. The
    boundaries depend only on the event timestamps, never on micro-batch
    boundaries, so the streaming emission equals this batch recompute
    (asserted in tests/test_session_stream.py).

    Physical shape: one window pass per chunk ROUND — round r cuts chunk r
    of EVERY over-long session in parallel, so the loop count is the max
    chunks per session (ceil(span/max)), not the session count. Each round
    localCheckpoints the remainder to keep plans flat (the round-4
    cross-batch lineage lesson applied within a job)."""
    from pyspark.sql import Window

    # all comparisons stay in the timestamp domain (works for TIMESTAMP and
    # TIMESTAMP_NTZ sources alike, and avoids double-precision boundary
    # skew at microsecond resolution)
    ts = F.col(ts_col)
    cap = F.make_dt_interval(secs=F.lit(float(max_seconds)))
    w = Window.partitionBy(key_col, "sess_start")
    done_frames = []
    cur = tagged
    for _round in range(max_rounds):
        cur = (
            cur.withColumn("_cb", F.min(ts).over(w) + cap)
            .withColumn("_over", F.max(ts).over(w) > F.col("_cb"))
            .localCheckpoint()
        )
        done_frames.append(cur.where(~F.col("_over")).drop("_cb", "_over"))
        pending = cur.where("_over")
        if pending.isEmpty():
            cur = None
            break
        # chunk = the time-prefix within the boundary (sess_start is
        # already its anchor); remainder re-anchors at its own min ts
        done_frames.append(
            pending.where(ts <= F.col("_cb")).drop("_cb", "_over")
        )
        cur = (
            pending.where(ts > F.col("_cb"))
            .withColumn("sess_start", F.min(ts_col).over(w))
            .drop("_cb", "_over")
        )
    else:
        raise RuntimeError(
            f"split_long_sessions did not converge in {max_rounds} rounds "
            "(a session spans > max_rounds x max_seconds — raise max_rounds)"
        )
    out = done_frames[0]
    for f in done_frames[1:]:
        out = out.unionByName(f)
    return out
