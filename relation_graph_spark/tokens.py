"""Token vocabulary for pre-tokenized axiom sequences (FIXTURES.md section 2).

Every datum in the reference's data path is an IRI string
(reference RelationGraph.scala:141-142); we map IRIs to int32 tokens so the
closure runs entirely on integer join keys — strings are reconstituted only at
the RDF/TSV presentation edge.
"""

# Reserved value tokens
PAD = 0
TOP = 1  # owl:Thing   (reference filters it everywhere: RelationGraph.scala:83,91)
BOT = 2  # owl:Nothing (unsatisfiable marker: RelationGraph.scala:213-215)
SUBCLASSOF = 3  # rdfs:subClassOf predicate token
EQUIVALENTCLASS = 4  # owl:equivalentClass predicate token
RDF_TYPE = 5

# Axiom-type tokens: first element of the `tokens` array.
AX_SUBCLASS = 101  # [101, c1, c2]          SubClassOf(C1, C2), both named
AX_SOME = 102  # [102, c, p, d]         SubClassOf(C, p some D)
AX_EQUIV_SOME = 103  # [103, f, p, d]     EquivalentClasses(F, p some D)
AX_SUBPROP = 104  # [104, p, q]            SubObjectPropertyOf(p, q)
AX_DECL_CLASS = 105  # [105, c]
AX_DECL_PROP = 106  # [106, p]
AX_CLASS_ASSERTION = 107  # [107, c, i]    ClassAssertion(C, ind)
AX_EQUIV_NAMED = 108  # [108, c1, c2]      EquivalentClasses(C1, C2), both named

# Widths (including the axiom-type token) per axiom type — the decode
# projection is fixed-width per type, so it stays a pure column expression.
AXIOM_WIDTH = {
    AX_SUBCLASS: 3,
    AX_SOME: 4,
    AX_EQUIV_SOME: 4,
    AX_SUBPROP: 3,
    AX_DECL_CLASS: 2,
    AX_DECL_PROP: 2,
    AX_CLASS_ASSERTION: 3,
    AX_EQUIV_NAMED: 3,
}

# Default IRIs for the reserved tokens (presentation edge only).
RESERVED_IRIS = {
    TOP: "http://www.w3.org/2002/07/owl#Thing",
    BOT: "http://www.w3.org/2002/07/owl#Nothing",
    SUBCLASSOF: "http://www.w3.org/2000/01/rdf-schema#subClassOf",
    EQUIVALENTCLASS: "http://www.w3.org/2002/07/owl#equivalentClass",
    RDF_TYPE: "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
}

FIRST_ENTITY_TOKEN = 11
