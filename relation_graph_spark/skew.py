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
