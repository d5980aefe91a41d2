"""Deterministic fixture and scale generators (FIXTURES.md sections 3-8).

All generators are pure functions of their arguments — no RNG state — so the
same call always produces the identical table (the determinism the driver's
token-array-equality comparison requires).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

from relation_graph_spark import tokens as T
from relation_graph_spark.schema import SEQ_SCHEMA, SEQ_TS_SCHEMA

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _rows_to_df(spark: SparkSession, rows, source: str, with_ts: bool = False) -> DataFrame:
    data = []
    for i, toks in enumerate(rows):
        rec = [f"d{i + 1:08d}", [int(t) for t in toks], len(toks), source]
        if with_ts:
            rec.append((EPOCH + timedelta(seconds=i)).replace(tzinfo=None))
        data.append(tuple(rec))
    return spark.createDataFrame(data, SEQ_TS_SCHEMA if with_ts else SEQ_SCHEMA)


# ---------------------------------------------------------------- Fixture A
# Port of reference materialize_test.ofn (classes A..F=11..16, property p=21).
A_, B_, C_, D_, E_, F_, P_ = 11, 12, 13, 14, 15, 16, 21

MATERIALIZE_TEST_ROWS = [
    [T.AX_DECL_CLASS, A_],
    [T.AX_DECL_CLASS, B_],
    [T.AX_DECL_CLASS, C_],
    [T.AX_DECL_CLASS, D_],
    [T.AX_DECL_CLASS, E_],
    [T.AX_DECL_CLASS, F_],
    [T.AX_DECL_PROP, P_],
    [T.AX_SOME, A_, P_, D_],  # A subClassOf p some D   (ofn:25)
    [T.AX_SUBCLASS, B_, A_],  # B subClassOf A          (ofn:29)
    [T.AX_SUBCLASS, C_, B_],  # C subClassOf B          (ofn:33)
    [T.AX_SOME, E_, P_, C_],  # E subClassOf p some C   (ofn:37)
    [T.AX_EQUIV_SOME, F_, P_, B_],  # F EquivalentTo p some B (ofn:41)
]

# Hand-derived complete golden (SURVEY.md section 5; subset asserted by
# reference TestRelationGraph.scala:41-46).
GOLDEN_A_EXISTENTIAL = {
    (A_, P_, D_), (B_, P_, D_), (C_, P_, D_),
    (E_, P_, C_), (E_, P_, B_), (E_, P_, A_),
    (F_, P_, B_), (F_, P_, A_),
}
GOLDEN_A_SUBCLASS = {
    (B_, T.SUBCLASSOF, A_), (C_, T.SUBCLASSOF, B_),
    (C_, T.SUBCLASSOF, A_), (E_, T.SUBCLASSOF, F_),
}
GOLDEN_A_NEGATIVE = (F_, P_, C_)  # must NOT be entailed


def materialize_test(spark: SparkSession, with_ts: bool = False) -> DataFrame:
    return _rows_to_df(spark, MATERIALIZE_TEST_ROWS, "materialize_test", with_ts)


def materialize_test_vocab(spark: SparkSession) -> DataFrame:
    from relation_graph_spark.schema import VOCAB_SCHEMA

    ns = "http://example.org/test#"
    rows = [(tok, f"{ns}{name}", "class") for tok, name in
            [(A_, "A"), (B_, "B"), (C_, "C"), (D_, "D"), (E_, "E"), (F_, "F")]]
    rows.append((P_, f"{ns}p", "property"))
    for tok, iri in T.RESERVED_IRIS.items():
        rows.append((tok, iri, "builtin"))
    return spark.createDataFrame(rows, VOCAB_SCHEMA)


# ---------------------------------------------------------------- Fixture B
def apo_like_rows(n_classes: int = 619, n_extra: int = 306):
    """Zero-property termination fixture (FIXTURES.md section 4): layered DAG
    via multiplicative-hash parent rule; only class decls + subclass axioms."""
    rows = [[T.AX_DECL_CLASS, 11 + i] for i in range(n_classes)]
    for i in range(1, n_classes):
        parent = (i * 2654435761) % i
        rows.append([T.AX_SUBCLASS, 11 + i, 11 + parent])
    for k in range(n_extra):
        i = (k * 48271) % (n_classes - 1) + 1
        parent = (k * 16807) % i
        rows.append([T.AX_SUBCLASS, 11 + i, 11 + parent])
    return rows


def apo_like(spark: SparkSession) -> DataFrame:
    return _rows_to_df(spark, apo_like_rows(), "apo_like")


# ---------------------------------------------------------------- Fixture D
X_, Y_, Q_, R_ = 31, 32, 41, 42

PROPERTY_HIERARCHY_ROWS = [
    [T.AX_DECL_CLASS, X_],
    [T.AX_DECL_CLASS, Y_],
    [T.AX_DECL_PROP, Q_],
    [T.AX_DECL_PROP, R_],
    [T.AX_SUBPROP, Q_, R_],  # q subPropertyOf r
    [T.AX_SOME, X_, Q_, Y_],  # X subClassOf q some Y
]
GOLDEN_D = {(X_, Q_, Y_), (X_, R_, Y_)}


def property_hierarchy(spark: SparkSession) -> DataFrame:
    return _rows_to_df(spark, PROPERTY_HIERARCHY_ROWS, "property_hierarchy")


# ------------------------------------------------------------ scale generator
def gen_ontology_rows(
    n_classes: int, n_props: int, n_some: int, hub_pct: float = 0.01, hub_boost: int = 100
):
    """Parametric deterministic ontology (FIXTURES.md section 8).

    - class tokens 100..100+n_classes-1, multiplicative-hash layered DAG
    - property chain p_0 <= p_1 <= ... (tokens 50..50+n_props-1 shifted to
      avoid class range: props start at 100+n_classes)
    - n_some told existentials
    - hub skew: the first ceil(hub_pct*n_classes) classes receive `hub_boost`x
      subclass fan-in (drives the AQE skew-join/salting path)
    """
    base_c = 100
    base_p = base_c + n_classes
    rows = []
    for i in range(n_props):
        rows.append([T.AX_DECL_PROP, base_p + i])
        if i + 1 < n_props:
            rows.append([T.AX_SUBPROP, base_p + i, base_p + i + 1])
    n_hubs = max(1, int(n_classes * hub_pct))
    for i in range(n_classes):
        rows.append([T.AX_DECL_CLASS, base_c + i])
        if i > 0:
            h = (i * 2654435761) % (2**32)
            if h % hub_boost != 0:
                parent = h % n_hubs  # skew: most classes hang off a hub
            else:
                parent = h % i
            rows.append([T.AX_SUBCLASS, base_c + i, base_c + parent])
    for k in range(n_some):
        # 64-bit multiplicative mixing so distinct (c, p, f) triples keep
        # growing with n_some (a plain (k*a) % n mapping cycles after
        # lcm(n, n_props) rows and saturates the workload)
        h1 = (k * 0x9E3779B97F4A7C15) % (2**64)
        h2 = ((k + 0x5851F42D) * 0xBF58476D1CE4E5B9) % (2**64)
        c = base_c + (h1 >> 16) % n_classes
        p = base_p + k % n_props
        f = base_c + (h2 >> 16) % n_classes
        rows.append([T.AX_SOME, c, p, f])
    return rows


def gen_ontology(
    spark: SparkSession, n_classes: int, n_props: int, n_some: int, **kw
) -> DataFrame:
    rows = gen_ontology_rows(n_classes, n_props, n_some, **kw)
    return _rows_to_df(spark, rows, f"gen_{n_classes}_{n_props}_{n_some}")


def gen_ontology_spark(
    spark: SparkSession,
    n_classes: int,
    n_props: int,
    n_some: int,
    hub_pct: float = 0.01,
    hub_boost: int = 100,
) -> DataFrame:
    """Spark-native deterministic generator (same shape as gen_ontology_rows;
    bench-scale variant). Built from spark.range + column expressions, so a
    10^9-row input materializes distributedly — no driver-side row list. All
    hash mixing stays under 2^63 (ANSI-safe): h = (k * 2654435761) % 2^32.
    """
    import pyspark.sql.functions as F

    base_c, base_p = 100, 100 + n_classes
    n_hubs = max(1, int(n_classes * hub_pct))
    src = F.lit(f"gens_{n_classes}_{n_props}_{n_some}")

    # scale-adaptive partitioning (guide §6): one partition per ~25k rows,
    # capped at the default parallelism. Without this every spark.range
    # defaults to defaultParallelism partitions and the 5-frame union carries
    # 5x that many near-empty partitions — every downstream told-table scan
    # then pays 160 task launches to read 140k rows. At 10^9 rows the cap
    # keeps the build fully parallel.
    par = spark.sparkContext.defaultParallelism

    def _parts(n: int) -> int:
        return max(1, min(par, (n + 24999) // 25000))

    def seq(df, tokens_col):
        return df.select(
            F.format_string("d%08d", F.monotonically_increasing_id()).alias("doc_id"),
            tokens_col.cast("array<int>").alias("tokens"),
            F.size(tokens_col).cast("int").alias("n_tok"),
            src.alias("source"),
        )

    props = spark.range(0, n_props, 1, _parts(n_props)).select(
        F.array(F.lit(T.AX_DECL_PROP), (F.col("id") + base_p)).alias("t")
    )
    prop_chain = spark.range(0, max(0, n_props - 1), 1, _parts(n_props)).select(
        F.array(
            F.lit(T.AX_SUBPROP), F.col("id") + base_p, F.col("id") + base_p + 1
        ).alias("t")
    )
    cls = spark.range(0, n_classes, 1, _parts(n_classes)).select(
        F.array(F.lit(T.AX_DECL_CLASS), F.col("id") + base_c).alias("t")
    )
    h = F.pmod(F.col("id") * F.lit(2654435761), F.lit(2**32))
    parent = F.when(
        F.pmod(h, F.lit(hub_boost)) != 0, F.pmod(h, F.lit(n_hubs))
    ).otherwise(F.pmod(h, F.col("id")))
    sc = spark.range(1, n_classes, 1, _parts(n_classes)).select(
        F.array(F.lit(T.AX_SUBCLASS), F.col("id") + base_c, parent + base_c).alias("t")
    )
    h1 = F.pmod(F.col("id") * F.lit(2654435761) + F.lit(0x9E3779B9), F.lit(2**32))
    h2 = F.pmod((F.col("id") + F.lit(0x5851F42D)) * F.lit(0x61C88647), F.lit(2**32))
    some = spark.range(0, n_some, 1, _parts(n_some)).select(
        F.array(
            F.lit(T.AX_SOME),
            F.pmod(h1, F.lit(n_classes)) + base_c,
            F.pmod(F.col("id"), F.lit(n_props)) + base_p,
            F.pmod(h2, F.lit(n_classes)) + base_c,
        ).alias("t")
    )
    parts = [seq(d, F.col("t")) for d in (props, prop_chain, cls, sc, some)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
