"""Longest-first prefix compaction (reference
LongestFirstPrefixMapping.scala:5-23) as pure Column expressions.

The reference sorts namespaces longest-first and takes the first match,
falling back to the OBO pattern `http://purl.obolibrary.org/obo/XXX_123 ->
XXX:123`. Prefix maps are tiny driver-side dicts, so the compaction compiles
to one chained CASE expression — no join, no UDF, fully codegen'd; at 100 TB
that is a map-side projection on the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

OBO_RE = "^http://purl\\.obolibrary\\.org/obo/([^_]+)_(.+)$"


def compact_iri(
    iri: Column, prefixes: dict[str, str], obo_prefixes: bool = True
) -> Column:
    """IRI -> 'prefix:local' via the longest matching namespace, else the OBO
    fallback (when obo_prefixes, reference Config.scala:48-50), else the IRI
    unchanged."""
    expr = None
    # longest-first: ties broken by prefix name for determinism
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: (-len(kv[1]), kv[0])):
        cond = iri.startswith(ns)
        val = F.concat(F.lit(pfx + ":"), F.substring(iri, len(ns) + 1, 1 << 20))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    if obo_prefixes:
        obo = F.regexp_replace(iri, OBO_RE, "$1:$2")
        fallback = F.when(iri.rlike(OBO_RE), obo).otherwise(iri)
    else:
        fallback = iri
    return expr.otherwise(fallback) if expr is not None else fallback


def compact_triples(
    iri_edges: DataFrame, prefixes: dict[str, str], obo_prefixes: bool = True
) -> DataFrame:
    """(s, p, o) IRI frame -> compacted columns (the TSV sink's row shape,
    reference TSVStreamRDF.scala:21-26)."""
    return iri_edges.select(
        *[
            compact_iri(F.col(c), prefixes, obo_prefixes).alias(c)
            for c in ("s", "p", "o")
        ]
    )
