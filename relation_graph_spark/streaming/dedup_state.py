"""Stateful seen-edge dedup: applyInPandasWithState.

The streaming analog of the reference's per-property seen refs
(RelationGraph.scala:71, 94-96): a per-key state store holding the set of
edge hashes already emitted; only never-seen edges pass through. Keys are
hash buckets (pmod of the edge hash), so state is partitioned evenly and the
operator scales horizontally — with the RocksDB state-store provider
(spark.sql.streaming.stateStore.providerClass) the per-bucket sets spill
off-heap at 100-TB state sizes.

The simpler tier (dropDuplicatesWithinWatermark) covers bounded-lateness
dedup; this operator covers unbounded exact dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("edge_hash", StringType(), False),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()), True)])


def _dedup_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        fresh = pdf.loc[~pdf["edge_hash"].isin(seen), ["bucket", "edge_hash"]]
        fresh = fresh.drop_duplicates("edge_hash")
        if len(fresh):
            seen.update(fresh["edge_hash"])
            out.append(fresh)
    state.update((list(seen),))
    yield pd.concat(out) if out else pd.DataFrame({"bucket": [], "edge_hash": []})


def dedup_edges_stateful(hashed_edges: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Streaming DataFrame of rows with an `edge_hash` column -> only
    first-occurrence hashes, via per-bucket state."""
    bucketed = hashed_edges.withColumn(
        "bucket", F.pmod(F.xxhash64("edge_hash"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        # emitted rows are final (an edge_hash is emitted at most once ever),
        # so the operator is append-mode — composes with file sinks
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_edges_within_watermark(
    hashed_edges_ts: DataFrame, delay: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Bounded-lateness dedup tier: Spark's native
    dropDuplicatesWithinWatermark — state for an edge_hash is evictable once
    the watermark passes its event time + delay, so state stays bounded by
    the lateness horizon instead of growing forever (the right tier when
    upstream replays/duplicates arrive within a known window; the
    applyInPandasWithState store above is the unbounded-exact tier)."""
    return hashed_edges_ts.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["edge_hash"]
    )
