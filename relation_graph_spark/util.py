"""Synchronous axiom-level API — the analog of the reference's Java util
surface (RelationGraphUtil.computeRelationGraph, RelationGraphUtil.scala:28-49):
materialize, then dispatch each output triple back to an axiom record by
predicate (SURVEY.md J6):

    rdfs:subClassOf      -> SubClassOf(s, o)            (AX_SUBCLASS row)
    owl:equivalentClass  -> EquivalentClasses(s, o)     (AX_EQUIV_NAMED row)
    rdf:type             -> ClassAssertion(o, s)        (AX_CLASS_ASSERTION row)
    any property p       -> SubClassOf(s, p some o)     (AX_SOME row)

Like the reference, `mode` is ignored (results are axioms, not presentation
triples). Pure Column dispatch — one whole-stage-codegen'd projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from relation_graph_spark import tokens as T
from relation_graph_spark.config import RGConfig


def triples_to_axioms(edges: DataFrame) -> DataFrame:
    """(s, p, o) token triples -> axiom rows (atype, s, p, o) under the
    reference's predicate dispatch. Reflexive equivalence rows (C eq C) come
    back as one EquivalentClasses axiom; AX_SOME keeps its layout
    [atype, sub, property, filler]."""
    atype = (
        F.when(F.col("p") == T.SUBCLASSOF, F.lit(T.AX_SUBCLASS))
        .when(F.col("p") == T.EQUIVALENTCLASS, F.lit(T.AX_EQUIV_NAMED))
        .when(F.col("p") == T.RDF_TYPE, F.lit(T.AX_CLASS_ASSERTION))
        .otherwise(F.lit(T.AX_SOME))
    )
    return edges.select(
        atype.cast("int").alias("atype"),
        F.when(atype == T.AX_CLASS_ASSERTION, F.col("o")).otherwise(F.col("s"))
        .cast("int")
        .alias("s"),
        F.when(atype == T.AX_SOME, F.col("p"))
        .when(atype == T.AX_CLASS_ASSERTION, F.col("s"))
        .otherwise(F.col("o"))
        .cast("int")
        .alias("p"),
        F.when(atype == T.AX_SOME, F.col("o")).cast("int").alias("o"),
    ).dropDuplicates()


def compute_relation_graph(
    seq_df: DataFrame, properties=None, cfg: RGConfig | None = None
) -> DataFrame:
    """Materialize and return axiom rows (the reference's synchronous API;
    mode forced to RDF-equivalent as RelationGraphUtil.scala:31 does)."""
    from dataclasses import replace

    from relation_graph_spark.config import OutputMode
    from relation_graph_spark.materialize import materialize

    cfg = cfg or RGConfig()
    cfg = replace(cfg, mode=OutputMode.RDF)
    if properties is not None:
        cfg = cfg.with_properties(properties)
    return triples_to_axioms(materialize(seq_df, cfg))
