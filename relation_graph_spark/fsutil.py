"""Tiny filesystem helpers shared by the sink's and told-trail's LSM tiers
(one definition so the two size-tiered merge policies cannot drift)."""

from __future__ import annotations

import os


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of .parquet files under `path` (0 for a missing dir)."""
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
