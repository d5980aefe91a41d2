"""Explicit skew handling: key salting for high-degree hub joins.

AQE's skew-join splitting handles sort-merge skew at runtime; salting is the
complementary *planned* remedy for shuffled equi-joins where a handful of
keys (ontology hub classes with ~100x subclass fan-in; BASELINE.json calls
these out explicitly) would pin single tasks. The big side gets a random-ish
but DETERMINISTIC salt (pmod of a row hash), the small side is replicated
once per salt value; the join key becomes (key, salt).

Use when the hierarchy side outgrows the broadcast threshold — below it the
broadcast hash join makes salting moot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """big JOIN small ON big[big_key] == small[small_key], salted.

    Returns the joined frame with both sides' columns (the helper drops the
    internal salt/replica columns). Deterministic: the salt is a hash of the
    big side's whole row, not a random number, so reruns produce identical
    partitioning (exactly-once replay safety).
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    )
    small_r = small.withColumn(
        "_replica", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(
        small_r,
        (big_s[big_key] == small_r[small_key]) & (big_s["_salt"] == small_r["_replica"]),
        how,
    )
    return joined.drop("_salt", "_replica")


def hot_key_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Two-path inner equi-join for join-explosion skew (hub classes).

    Keys whose dim-side multiplicity exceeds `hot_threshold` are HOT: their
    dim rows get a deterministic salt and their fact rows replicate across
    the salts, splitting each hub key's work across n_salts tasks. Cold keys
    join plain. Result identical to `fact.join(dim, fact[fact_key] ==
    dim[dim_key])` — this is the engine's skew remedy for the
    above-broadcast-threshold branch of the closure joins (below it the
    hierarchy side broadcasts, and a broadcast hash join is skew-immune by
    construction: the fact table never shuffles by the skewed key).

    The hot-key set is a count-aggregate of the dim side (one map-side
    combine pass) and is tiny by definition (few keys can exceed a large
    multiplicity bound), so both semi/anti splits are broadcast joins.
    Requires disjoint non-key column names between fact and dim.
    """
    counts = dim.groupBy(dim_key).count()
    hot = F.broadcast(
        counts.where(F.col("count") > hot_threshold).select(dim_key).localCheckpoint()
    )
    hot_f = hot.withColumnRenamed(dim_key, fact_key)
    dim_cold = dim.join(hot, on=dim_key, how="left_anti")
    fact_cold = fact.join(hot_f, on=fact_key, how="left_anti")
    cold = fact_cold.join(dim_cold, fact_cold[fact_key] == dim_cold[dim_key], "inner")

    dim_hot = dim.join(hot, on=dim_key, how="left_semi").withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in dim.columns]), F.lit(n_salts)).cast("int"),
    )
    fact_hot = fact.join(hot_f, on=fact_key, how="left_semi").withColumn(
        "_replica", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    hot_joined = fact_hot.join(
        dim_hot,
        (fact_hot[fact_key] == dim_hot[dim_key])
        & (fact_hot["_replica"] == dim_hot["_salt"]),
        "inner",
    ).drop("_salt", "_replica")
    return cold.unionByName(hot_joined)
