"""Edge hashing and RDF presentation functions.

- edge_hash: base64(sha2(s:p:o)) — deterministic content hash, mirroring the
  reference's SHA-256/Base64 blank-node ids (RelationGraph.scala:236-238).
  Reused as the exactly-once idempotency key of the streaming sink (S7).
- OWL-mode reification: 1 existential edge -> 4 triples
  (RelationGraph.scala:235-245).
All are pure Column expressions (JVM-side, codegen-friendly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from relation_graph_spark import tokens as T


def edge_hash_col(s: Column, p: Column, o: Column) -> Column:
    return F.base64(
        F.unhex(F.sha2(F.concat_ws(":", s.cast("string"), p.cast("string"), o.cast("string")), 256))
    )


def with_edge_hash(edges: DataFrame) -> DataFrame:
    """(s,p,o) -> adds `edge: array<int>` and `edge_hash: string` columns."""
    return edges.withColumn(
        "edge", F.array(F.col("s"), F.col("p"), F.col("o"))
    ).withColumn("edge_hash", edge_hash_col(F.col("s"), F.col("p"), F.col("o")))


def to_iris(
    edges: DataFrame, vocab: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Token triples -> IRI triples via three broadcast dictionary joins.

    The reference crosses this boundary per-triple with NodeFactory.createURI
    (RelationGraph.scala:141-142); we do it once, at the presentation edge.
    `keep` names extra columns to carry through unchanged.
    """
    v = F.broadcast(vocab.select("token", "iri"))
    out = edges
    for c in ("s", "p", "o"):
        out = (
            out.join(v.withColumnRenamed("token", c).withColumnRenamed("iri", f"{c}_iri"), on=c, how="left")
        )
    return out.select(
        F.col("s_iri").alias("s"),
        F.col("p_iri").alias("p"),
        F.col("o_iri").alias("o"),
        *[F.col(c) for c in (keep or [])],
    )


def _nt_term(c: Column) -> Column:
    """N-Triples term: blank nodes stay bare (`_:label`), IRIs get <>."""
    return F.when(c.startswith("_:"), c).otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def to_ntriples(iri_edges: DataFrame) -> DataFrame:
    """IRI triples -> one N-Triples line per row (sink S5)."""
    return iri_edges.select(
        F.concat_ws(
            " ", _nt_term(F.col("s")), _nt_term(F.col("p")), _nt_term(F.col("o")), F.lit(".")
        ).alias("line")
    )


def reify_owl(edges: DataFrame, vocab: DataFrame) -> DataFrame:
    """OWL output mode: one ontology-header triple
    (_:redundant rdf:type owl:Ontology — F6, reference
    RelationGraph.scala:63-64), then each existential edge (s, p, o) becomes
    4 triples with a deterministic blank node _:b = base64(sha2(s+p+o))
    (F1/F5):

        s  rdfs:subClassOf  _:b
        _:b rdf:type owl:Restriction
        _:b owl:onProperty p
        _:b owl:someValuesFrom o

    Taxonomy edges (p = SUBCLASSOF/EQUIVALENTCLASS/RDF_TYPE) pass through
    unreified, as in the reference (RelationGraph.scala:143-154). If `edges`
    carries a `kind` column, individual-subject existential edges link to
    their restriction bnode via rdf:type instead of rdfs:subClassOf
    (owlTriples(..., RDFType), RelationGraph.scala:149-153).
    """
    has_kind = "kind" in edges.columns
    iri = to_iris(edges, vocab, keep=["kind"] if has_kind else None).withColumn(
        "bnode",
        F.concat(F.lit("_:"), F.translate(edge_hash_col(F.col("s"), F.col("p"), F.col("o")), "+/=", "")),
    )
    link_pred = (
        F.when(F.col("kind") == "individual", F.lit(T.RESERVED_IRIS[T.RDF_TYPE]))
        .otherwise(F.lit(T.RESERVED_IRIS[T.SUBCLASSOF]))
        if has_kind
        else F.lit(T.RESERVED_IRIS[T.SUBCLASSOF])
    )
    taxo_preds = [
        T.RESERVED_IRIS[T.SUBCLASSOF],
        T.RESERVED_IRIS[T.EQUIVALENTCLASS],
        T.RESERVED_IRIS[T.RDF_TYPE],
    ]
    passthrough = iri.where(F.col("p").isin(taxo_preds)).select("s", "p", "o")
    existential = iri.where(~F.col("p").isin(taxo_preds))
    quads = existential.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("s"),
                    link_pred.alias("p"),
                    F.col("bnode").alias("o"),
                ),
                F.struct(
                    F.col("bnode").alias("s"),
                    F.lit(T.RESERVED_IRIS[T.RDF_TYPE]).alias("p"),
                    F.lit("http://www.w3.org/2002/07/owl#Restriction").alias("o"),
                ),
                F.struct(
                    F.col("bnode").alias("s"),
                    F.lit("http://www.w3.org/2002/07/owl#onProperty").alias("p"),
                    F.col("p").alias("o"),
                ),
                F.struct(
                    F.col("bnode").alias("s"),
                    F.lit("http://www.w3.org/2002/07/owl#someValuesFrom").alias("p"),
                    F.col("o").alias("o"),
                ),
            )
        ).alias("t")
    ).select("t.s", "t.p", "t.o")
    header = edges.sparkSession.createDataFrame(
        [
            (
                "_:redundant",
                T.RESERVED_IRIS[T.RDF_TYPE],
                "http://www.w3.org/2002/07/owl#Ontology",
            )
        ],
        "s: string, p: string, o: string",
    )
    return header.unionByName(passthrough).unionByName(quads)
