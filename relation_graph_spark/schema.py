"""Fixed StructType schemas — the engine's catalog.

The reference has static case-class schemas (SURVEY.md section 1.3); ours are
declared once here so every operator/source/sink agrees.
"""

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input table of pre-tokenized sequences (BASELINE.json input_hint).
SEQ_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), True),
    ]
)

# Streaming variant: event-time column for watermark/window tests.
SEQ_TS_SCHEMA = StructType(
    SEQ_SCHEMA.fields + [StructField("ts", TimestampType(), True)]
)

# Decoded axiom frame: one row per told axiom.
# s/p/o meaning depends on atype (tokens.AXIOM_WIDTH); unused slots are null.
AXIOM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("atype", IntegerType(), False),
        StructField("s", IntegerType(), True),
        StructField("p", IntegerType(), True),
        StructField("o", IntegerType(), True),
    ]
)

# Materialized relation edge (output). `pred` is a property token for
# existential edges, SUBCLASSOF/EQUIVALENTCLASS/RDF_TYPE for taxonomy edges.
EDGE_SCHEMA = StructType(
    [
        StructField("s", IntegerType(), False),
        StructField("p", IntegerType(), False),
        StructField("o", IntegerType(), False),
    ]
)

# Sink row: edge + provenance + idempotency key (FIXTURES.md section 1).
REL_EDGE_SCHEMA = StructType(
    [
        StructField("edge", ArrayType(IntegerType(), False), False),
        StructField("edge_hash", StringType(), False),
    ]
)

# IRI dictionary dimension table.
VOCAB_SCHEMA = StructType(
    [
        StructField("token", IntegerType(), False),
        StructField("iri", StringType(), False),
        StructField("kind", StringType(), True),  # class | property | individual
    ]
)

# Generic int edge list used by the closure operator.
PAIR_SCHEMA = StructType(
    [
        StructField("child", LongType(), False),
        StructField("parent", LongType(), False),
    ]
)
