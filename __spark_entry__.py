"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator block (SURVEY.md section 2 + the training-data ops) to a
callable (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB
equivalent. Column names and value arithmetic are kept engine-parity-exact:
all quantitative outputs are exact integers (quantize -> bigint sums -> at
most one floor'd IEEE division), so order-insensitive value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# graph-closure block (engine core, SURVEY.md section 2.3/7.0)
# --------------------------------------------------------------------------

def q_rg_tc_orders_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure (R1 / J5 semi-naive loop) over a synthesized forest:
    edge (o_orderkey -> o_orderkey div 7)."""
    from relation_graph_spark.closure import transitive_closure

    orders = _t(spark, sf_dir, "orders")
    edges = (
        orders.where(F.col("o_orderkey") >= 7)
        .select(
            F.col("o_orderkey").cast("bigint").alias("child"),
            F.expr("o_orderkey div 7").cast("bigint").alias("parent"),
        )
        .dropDuplicates()
    )
    return transitive_closure(edges)


def q_rg_exist_rel_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 existential derivation over told tables synthesized from the star
    schema: customer -> nation -> region hierarchy; told existentials from
    orders. Output (s, p, o) = customer-class p nation-or-region-class."""
    from relation_graph_spark.closure import reflexive_transitive_closure
    from relation_graph_spark.materialize import derive_relations

    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")

    # the derived told frames are each consumed by several downstream jobs
    # (closure build, max-token scan, join stages): checkpoint once so the
    # base-table scans + dedup shuffles do not re-run per consumer
    # (r07 optimization, guide §5 — reused intermediates)
    sc = (
        customer.select(
            (F.col("c_custkey") + 1000000).cast("bigint").alias("sub"),
            (F.col("c_nationkey") + 1000).cast("bigint").alias("sup"),
        )
        .unionByName(
            nation.select(
                (F.col("n_nationkey") + 1000).cast("bigint").alias("sub"),
                (F.col("n_regionkey") + 100).cast("bigint").alias("sup"),
            )
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    some = (
        orders.select(
            (F.col("o_custkey") + 1000000).cast("bigint").alias("s"),
            F.lit(7).cast("bigint").alias("p"),
            ((F.col("o_custkey") % 25) + 1000).cast("bigint").alias("f"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    nodes = (
        sc.select(F.col("sub").alias("c"))
        .unionByName(sc.select(F.col("sup").alias("c")))
        .unionByName(some.select(F.col("s").alias("c")))
        .unionByName(some.select(F.col("f").alias("c")))
        .dropDuplicates()
    )
    sc_star = reflexive_transitive_closure(sc, nodes, "c", child="sub", parent="sup")
    sp_star = spark.createDataFrame([(7, 7)], "sub: bigint, sup: bigint")
    return derive_relations(sc_star, some, sp_star, broadcast_row_threshold=5_000_000)


def q_rg_anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set anti-join pattern (J5): customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_anti")
        .select(F.col("c_custkey").cast("bigint").alias("custkey"))
    )


def q_rg_semi_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection-as-semi-join (J1's intersect): suppliers with lineitems."""
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        supplier.join(lineitem, supplier["s_suppkey"] == lineitem["l_suppkey"], "left_semi")
        .select(F.col("s_suppkey").cast("bigint").alias("suppkey"), F.col("s_name").alias("name"))
    )


def q_rg_edge_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash edge ids (F1, reference
    RelationGraph.scala:236-238): base64(sha256(s:p:o))."""
    from relation_graph_spark.hashing import with_edge_hash

    nation = _t(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").cast("int").alias("s"),
        F.lit(3).cast("int").alias("p"),
        F.col("n_regionkey").cast("int").alias("o"),
    )
    return with_edge_hash(edges).select("s", "p", "o", "edge_hash")


def q_rg_set_union_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-union + dedup (A3): customer->nation and supplier->nation edges."""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    a = customer.select(
        (F.col("c_custkey") + 1000000).cast("bigint").alias("child"),
        (F.col("c_nationkey") + 1000).cast("bigint").alias("parent"),
    )
    b = supplier.select(
        (F.col("s_suppkey") + 2000000).cast("bigint").alias("child"),
        (F.col("s_nationkey") + 1000).cast("bigint").alias("parent"),
    )
    return a.unionByName(b).dropDuplicates()


def q_rg_reify_owl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL-mode reification (F5): 1 existential edge -> 4 triples with a
    deterministic blank node id."""
    nation = _t(spark, sf_dir, "nation")
    e = nation.select(
        F.concat(F.lit("http://example.org/nation/"), F.col("n_nationkey")).alias("s"),
        F.lit("http://example.org/prop/locatedIn").alias("p"),
        F.concat(F.lit("http://example.org/region/"), F.col("n_regionkey")).alias("o"),
    )
    bnode = F.concat(
        F.lit("_:"),
        F.translate(
            F.base64(F.unhex(F.sha2(F.concat_ws(":", "s", "p", "o"), 256))), "+/=", ""
        ),
    )
    e = e.withColumn("bnode", bnode)
    quads = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("ts"), F.lit("http://www.w3.org/2000/01/rdf-schema#subClassOf").alias("tp"), F.col("bnode").alias("to")),
                F.struct(F.col("bnode").alias("ts"), F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("tp"), F.lit("http://www.w3.org/2002/07/owl#Restriction").alias("to")),
                F.struct(F.col("bnode").alias("ts"), F.lit("http://www.w3.org/2002/07/owl#onProperty").alias("tp"), F.col("p").alias("to")),
                F.struct(F.col("bnode").alias("ts"), F.lit("http://www.w3.org/2002/07/owl#someValuesFrom").alias("tp"), F.col("o").alias("to")),
            )
        ).alias("t")
    ).select(F.col("t.ts").alias("s"), F.col("t.tp").alias("p"), F.col("t.to").alias("o"))
    return quads


def q_rg_ntriples_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples sink formatting (S5): '<s> <p> <o> .' lines."""
    from relation_graph_spark.hashing import to_ntriples

    nation = _t(spark, sf_dir, "nation")
    iri = nation.select(
        F.concat(F.lit("http://example.org/nation/"), F.col("n_nationkey")).alias("s"),
        F.lit("http://example.org/prop/locatedIn").alias("p"),
        F.concat(F.lit("http://example.org/region/"), F.col("n_regionkey")).alias("o"),
    )
    return to_ntriples(iri)


def q_rg_prefix_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBO-style prefix compaction (F3, reference
    LongestFirstPrefixMapping.scala:17-21)."""
    nation = _t(spark, sf_dir, "nation")
    iri = F.concat(
        F.lit("http://purl.obolibrary.org/obo/NAT_"),
        F.lpad(F.col("n_nationkey").cast("string"), 7, "0"),
    )
    return nation.select(
        iri.alias("iri"),
        F.regexp_replace(
            iri, "^http://purl\\.obolibrary\\.org/obo/([^_]+)_(.+)$", "$1:$2"
        ).alias("curie"),
    )


# --------------------------------------------------------------------------
# window block (streaming surface, batch-checkable)
# --------------------------------------------------------------------------

def q_rg_triples_to_axioms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 triple->axiom dispatch (reference RelationGraphUtil.scala:33-39):
    map output triples back to axiom records by predicate."""
    from relation_graph_spark import tokens as T
    from relation_graph_spark.util import triples_to_axioms

    nation = _t(spark, sf_dir, "nation")
    edges = (
        nation.select(
            (F.col("n_nationkey") + 100).cast("int").alias("s"),
            F.when(F.col("n_nationkey") % 4 == 0, F.lit(T.SUBCLASSOF))
            .when(F.col("n_nationkey") % 4 == 1, F.lit(T.EQUIVALENTCLASS))
            .when(F.col("n_nationkey") % 4 == 2, F.lit(T.RDF_TYPE))
            .otherwise(F.lit(21))
            .cast("int")
            .alias("p"),
            (F.col("n_regionkey") + 200).cast("int").alias("o"),
        )
    )
    return triples_to_axioms(edges)


def q_rg_prefix_map_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-map-over-OBO precedence (reference LongestFirstPrefixMapping +
    oboPrefixes toggle, Config.scala:48-50): an explicit prefix mapping wins
    over the OBO fallback; unmapped OBO-shaped IRIs compact via OBO; others
    pass through. Exercises longest-first tie-breaking too."""
    from relation_graph_spark.prefix import compact_iri

    prefixes = {
        "obo": "http://purl.obolibrary.org/obo/",
        "nat": "http://purl.obolibrary.org/obo/NAT_",
    }
    nation = _t(spark, sf_dir, "nation")
    iri = F.when(
        F.col("n_nationkey") % 3 == 0,
        F.concat(
            F.lit("http://purl.obolibrary.org/obo/NAT_"),
            F.lpad(F.col("n_nationkey").cast("string"), 7, "0"),
        ),
    ).when(
        F.col("n_nationkey") % 3 == 1,
        F.concat(F.lit("http://example.org/plain/"), F.col("n_nationkey")),
    ).otherwise(
        F.concat(F.lit("http://purl.obolibrary.org/obo/GO_"), F.col("n_nationkey"))
    )
    df = nation.select(iri.alias("iri"))
    return df.select(
        "iri",
        compact_iri(F.col("iri"), prefixes, obo_prefixes=True).alias("curie"),
        compact_iri(F.col("iri"), {}, obo_prefixes=False).alias("curie_no_obo"),
    )


def q_win_closure_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-window transitive closure (the north star's 'fixpoint
    per window'): forest edges synthesized from events, closed within each
    1-hour window only — all windows in one distributed job."""
    from relation_graph_spark.streaming.windows import windowed_transitive_closure

    events = _t(spark, sf_dir, "events")
    edges = events.select(
        F.col("ts"),
        (F.col("event_id") % 500 + 100).cast("bigint").alias("child"),
        (F.expr("(event_id % 500) div 7") + 100).cast("bigint").alias("parent"),
    ).where(F.col("child") != F.col("parent"))
    return windowed_transitive_closure(edges, "1 hour")


def q_win_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.streaming.windows import tumbling_agg

    return tumbling_agg(_t(spark, sf_dir, "events"), "1 hour")


def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.streaming.windows import sliding_agg

    return sliding_agg(_t(spark, sf_dir, "events"), "1 hour", "30 minutes")


def q_win_session_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.streaming.windows import session_agg

    return session_agg(_t(spark, sf_dir, "events"), "30 minutes")


def q_win_session_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SESSION transitive closure (SURVEY.md 7.2(d)): forest edges from
    events, sessions per user with 30-min inactivity gap, closure scoped to
    each (user, session) — all sessions in one distributed job."""
    from relation_graph_spark.streaming.windows import session_closure

    events = _t(spark, sf_dir, "events")
    edges = events.select(
        "user_id",
        F.col("ts"),
        (F.col("event_id") % 300 + 100).cast("bigint").alias("child"),
        (F.expr("(event_id % 300) div 5") + 100).cast("bigint").alias("parent"),
    ).where(F.col("child") != F.col("parent"))
    return session_closure(edges, "30 minutes", key_col="user_id")


def _session_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forest edges for the session queries (user_id cast to string so the
    streaming job's fixed source schema applies)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts"),
        (F.col("event_id") % 300 + 100).cast("bigint").alias("child"),
        (F.expr("(event_id % 300) div 5") + 100).cast("bigint").alias("parent"),
    ).where(F.col("child") != F.col("parent"))


def q_win_session_finalize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deployment of the per-session closure (SURVEY.md 7.2(d)
    streaming form): the events-derived edges split into 3 time-ordered
    micro-batches through SessionClosureStreamJob — a session finalizes
    (and its closure is emitted, exactly once) only when the watermark
    strictly passes last_ts + gap. The emitted union equals the batch
    session_closure recompute restricted to sessions whose last_ts + gap
    lies below the stream's final watermark (the oracle mirrors that
    finalization filter); still-open sessions emit nothing."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from relation_graph_spark.streaming.session_pipeline import (
        SessionClosureStreamJob,
    )

    pdf = (
        _session_edges(spark, sf_dir)
        .orderBy("ts", "user_id", "child", "parent")
        .toPandas()
    )
    work = tempfile.mkdtemp(prefix="rgs_sess_stream_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    schema = pa.schema(
        [
            ("user_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("child", pa.int64()),
            ("parent", pa.int64()),
        ]
    )
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(inp, f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[cuts[i] : cuts[i + 1]], schema=schema, preserve_index=False
            ),
            path,
        )
        t = 1_900_000_000 + i * 10  # deterministic micro-batch order
        os.utime(path, (t, t))
    job = SessionClosureStreamJob(
        spark, inp, os.path.join(work, "w"), gap="30 minutes", delay_seconds=0
    )
    job.run_available(max_files_per_trigger=1)
    return job.result()


def q_win_session_split_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-capped session closure (round-6: the never-idle-key cap as
    a first-class batch operator): sessions assigned with a 30-min gap are
    GREEDILY re-chunked into <= 10-min segments (windows.split_long_sessions
    — chunk k anchors at the first event strictly after chunk k-1's
    anchor + cap; chunks of under-cap sessions are the sessions themselves)
    and the transitive closure runs per (user, chunk-anchor). This is the
    exact chunking SessionClosureStreamJob applies under
    ``max_session_seconds``; the oracle reproduces the greedy anchors with
    a recursive CTE."""
    from relation_graph_spark.closure import transitive_closure
    from relation_graph_spark.streaming.windows import (
        assign_sessions,
        split_long_sessions,
    )

    edges = _session_edges(spark, sf_dir)
    tagged = assign_sessions(
        edges, "30 minutes", key_col="user_id", order_cols=["child", "parent"]
    )
    chunked = split_long_sessions(tagged, 600.0, key_col="user_id")
    return transitive_closure(
        chunked.select("user_id", "sess_start", "child", "parent"),
        group_cols=["user_id", "sess_start"],
    )


# --------------------------------------------------------------------------
# aggregation / join-plan block (Catalyst quality checks)
# --------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy: exact centi-unit integer sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_price_c"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "bigint"
                )
            ).alias("sum_disc_price_c"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join; broadcast dims, shuffled fact join."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "bigint"
                )
            ).alias("revenue_c"),
            F.count("*").alias("n_items"),
        )
    )


def q_agg_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders by totalprice per market segment."""
    from pyspark.sql.window import Window

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").cast("bigint").alias("orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("totalprice_c"),
            F.col("rnk"),
        )
    )


# --------------------------------------------------------------------------
# dedup block
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold_ppm=300000, max_doc_id=150
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=8, band_size=2, max_bucket_size=64
    )


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=4)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components (min-label) over
    the capped LSH candidate pairs; singletons keep their own id."""
    from relation_graph_spark.ops.dedup import duplicate_clusters, lsh_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, num_hashes=8, band_size=2, max_bucket_size=64)
    return duplicate_clusters(docs, pairs)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), bits=16)


# --------------------------------------------------------------------------
# text-analysis block
# --------------------------------------------------------------------------

def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.text import token_stats

    return token_stats(_t(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.text import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (round-6 curation op): documents
    laid end-to-end per (source, doc_id%16 shard) in doc_id order, token
    stream cut every 2048 whitespace tokens; per-doc chunk assignment +
    offsets from one ordered-window cumulative sum. The shard keeps the
    per-stream scan parallel at corpus scale (a per-source window alone
    would funnel each source through one task)."""
    from relation_graph_spark.ops.curation import pack_chunks

    return pack_chunks(
        _t(spark, sf_dir, "documents"), budget=2048, n_shards=16
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum hash sampling (round-6 curation op): keep
    a doc iff md5(doc_id)'s 4-hex prefix falls below its language's rate
    threshold — reproducible across engines/runs, quantized to 1/65536,
    pure pushdown-friendly predicate (no shuffle, no RNG state)."""
    from relation_graph_spark.ops.curation import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        {"en": 0.5, "de": 0.3, "fr": 0.2, "zh": 0.1},
        default_rate=0.05,
    ).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# similarity block
# --------------------------------------------------------------------------

def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


def q_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.similarity import bucketed_topk

    return bucketed_topk(_t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10, n_centroids=8, n_probe=2
    )


def q_ann_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from relation_graph_spark.ops.similarity import cosine_near_dup_pairs

    return cosine_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold_ppm=150000,
        max_vec_id=300,
        max_bucket_size=64,
    )


# --------------------------------------------------------------------------
# non-SQL-expressible block (rows-only checks)
# --------------------------------------------------------------------------

def q_rg_materialize_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full R1-R4 engine on the reference's materialize_test fixture
    (iterative fixpoint with equivalence feedback — not expressible in one
    recursive SQL; golden-checked in tests/)."""
    from relation_graph_spark import fixtures as FX
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.materialize import materialize

    cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
    return materialize(FX.materialize_test(spark), cfg)


def q_rg_incremental_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming pipeline end-to-end: fixture A over 3 micro-batches through
    the exactly-once sink; returns the final edge set (equals the one-shot
    batch goldens — asserted in tests/test_streaming.py)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from relation_graph_spark import fixtures as FX
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

    work = tempfile.mkdtemp(prefix="rgs_stream_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    rows = [r.asDict() for r in FX.materialize_test(spark, with_ts=True).collect()]
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    for i, (lo, hi) in enumerate([(1, 7), (8, 10), (11, 12)]):
        part = [r for r in rows if lo <= int(r["doc_id"][1:]) <= hi]
        pq.write_table(pa.Table.from_pylist(part, schema=schema), f"{inp}/p{i}.parquet")
    cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
    job = IncrementalClosureJob(spark, inp, os.path.join(work, "w"), cfg)
    job.run_available(max_files_per_trigger=1)
    return job.result_edges().select("s", "p", "o")


_IND_STREAM_BATCHES = [
    # b0: classes 11/12, prop 21, some(11, 21, 12), ind 91 : 11
    [[105, 11], [105, 12], [106, 21], [102, 11, 21, 12], [107, 11, 91]],
    # b1: 13 subClassOf 11, ind 92 : 13
    [[105, 13], [101, 13, 11], [107, 13, 92]],
    # b2: second derivation: 92 : 11 re-derives committed individual rows
    [[107, 11, 92]],
    # b3: late unsat — 12 subClassOf owl:Nothing retracts every committed
    # row whose object became unsatisfiable (incl. individual rows)
    [[101, 12, 2]],
]


def q_rg_incremental_individuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming pipeline with output_individuals on the incremental fast
    path: 4 micro-batches with cross-batch individual derivations, a
    duplicate second derivation (sink dedup), and a late-unsat retraction of
    committed individual rows. Live sink set must equal the one-shot batch
    semantics (oracle: recursive SQL over the same told VALUES)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

    work = tempfile.mkdtemp(prefix="rgs_stream_ind_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1)
    doc = 0
    for i, rows in enumerate(_IND_STREAM_BATCHES):
        recs = []
        for toks in rows:
            doc += 1
            recs.append(
                {
                    "doc_id": f"x{doc:08d}",
                    "tokens": [int(t) for t in toks],
                    "n_tok": len(toks),
                    "source": "ind_stream",
                    "ts": t0 + timedelta(seconds=doc),
                }
            )
        p = os.path.join(inp, f"p{i}.parquet")
        pq.write_table(pa.Table.from_pylist(recs, schema=schema), p)
        os.utime(p, (1_700_000_000 + i * 10,) * 2)
    cfg = RGConfig(
        output_subclasses=True, reflexive_subclasses=False, output_individuals=True
    )
    job = IncrementalClosureJob(spark, inp, os.path.join(work, "w"), cfg)
    job.run_available(max_files_per_trigger=1)
    return job.result_edges().select("s", "p", "o")


_EQUIV_STREAM_BATCHES = [
    # b0: classes A..D=11..14, prop p=21; F ≡ p some B arrives BEFORE B's
    # member edges; A ⊑ p some D
    [[105, 11], [105, 12], [105, 13], [105, 14], [106, 21],
     [103, 16, 21, 12], [102, 11, 21, 14]],
    # b1: members arrive AFTER the definition: B ⊑ A, C ⊑ B; E ⊑ p some C
    [[105, 15], [105, 16], [101, 12, 11], [101, 13, 12], [102, 15, 21, 13]],
    # b2: second definition G ≡ p some A arrives AFTER its members — must
    # activate against already-committed rel history (one-time broadcast scan)
    [[105, 17], [103, 17, 21, 11]],
    # b3: late told edge D ⊑ C widens filler closures under BOTH standing
    # definitions (steady-state delta-sized feedback round)
    [[101, 14, 13]],
]


def q_rg_incremental_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming pipeline with AX_EQUIV_SOME equivalence feedback on the
    delta-sized path: definitions arriving BEFORE and AFTER their member
    axioms across 4 micro-batches; every batch after the first must fold as
    a delta (no full recompute — asserted in tests/test_streaming.py). Live
    sink set must equal the one-shot batch R1-R4 fixpoint (oracle: 2
    unrolled feedback rounds; this told set reaches fixpoint after 1)."""
    import os
    import tempfile

    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

    work = tempfile.mkdtemp(prefix="rgs_stream_eq_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    _write_token_batches(inp, _EQUIV_STREAM_BATCHES, "equiv_stream")
    cfg = RGConfig(output_subclasses=True, reflexive_subclasses=False)
    job = IncrementalClosureJob(spark, inp, os.path.join(work, "w"), cfg)
    job.run_available(max_files_per_trigger=1)
    return job.result_edges().select("s", "p", "o")


def _write_token_batches(inp: str, batches: list, source: str) -> None:
    """One parquet file per micro-batch with strictly increasing mtimes
    (file-stream batch order is mtime order)."""
    import os
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    t0 = datetime(2026, 1, 1)
    doc = 0
    for i, rows in enumerate(batches):
        recs = []
        for toks in rows:
            doc += 1
            recs.append(
                {
                    "doc_id": f"x{doc:08d}",
                    "tokens": [int(t) for t in toks],
                    "n_tok": len(toks),
                    "source": source,
                    "ts": t0 + timedelta(seconds=doc),
                }
            )
        p = os.path.join(inp, f"p{i}.parquet")
        pq.write_table(pa.Table.from_pylist(recs, schema=schema), p)
        os.utime(p, (1_700_000_000 + i * 10,) * 2)


def q_mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> vectorized Arrow feature UDF
    (byte-histogram featurizer; exact integer ppm, DuckDB-mirrorable)."""
    from relation_graph_spark.ops.multimodal import payload_byte_features, synthesize_media

    media = synthesize_media(_t(spark, sf_dir, "documents"))
    return payload_byte_features(media, dim=8)


def q_mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media decode through the pluggable decoder seam: deterministic
    binary-PPM payloads synthesized from documents, decoded by the
    registered pure-numpy P6 decoder, per-bin pixel histograms in exact
    integer ppm (Arrow-batched mapInPandas, vectorized bincount)."""
    from relation_graph_spark.ops.multimodal import (
        decode_image_features,
        synthesize_ppm,
    )

    media = synthesize_ppm(_t(spark, sf_dir, "documents"), width=4, height=2)
    return decode_image_features(media, dim=8, fmt="ppm")


def q_mm_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second registered decoder (grayscale binary PGM / P5): the registry
    seam generalizes beyond one format — same Arrow-batched feature path,
    one byte per pixel instead of three."""
    from relation_graph_spark.ops.multimodal import (
        decode_image_features,
        synthesize_pgm,
    )

    media = synthesize_pgm(_t(spark, sf_dir, "documents"), width=5, height=3)
    return decode_image_features(media, dim=8, fmt="pgm")


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: evenly-spaced byte offsets + sampled byte per
    media payload, pure column expressions."""
    from relation_graph_spark.ops.multimodal import sample_frames, synthesize_media

    return sample_frames(synthesize_media(_t(spark, sf_dir, "documents")), n_frames=4)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: R3 existential materialization over sf0.001 (driver smoke)."""
    return q_rg_exist_rel_star(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rg_tc_orders_forest": q_rg_tc_orders_forest,
        "rg_exist_rel_star": q_rg_exist_rel_star,
        "rg_anti_join_orphans": q_rg_anti_join_orphans,
        "rg_semi_join_suppliers": q_rg_semi_join_suppliers,
        "rg_edge_hash": q_rg_edge_hash,
        "rg_set_union_edges": q_rg_set_union_edges,
        "rg_reify_owl": q_rg_reify_owl,
        "rg_ntriples_lines": q_rg_ntriples_lines,
        "rg_prefix_compact": q_rg_prefix_compact,
        "rg_prefix_map_precedence": q_rg_prefix_map_precedence,
        "rg_triples_to_axioms": q_rg_triples_to_axioms,
        "rg_materialize_fixture": q_rg_materialize_fixture,
        "win_tumbling_hour": q_win_tumbling_hour,
        "win_closure_per_window": q_win_closure_per_window,
        "win_sliding": q_win_sliding,
        "win_session_user": q_win_session_user,
        "win_session_closure": q_win_session_closure,
        "win_session_split_closure": q_win_session_split_closure,
        "win_session_finalize_stream": q_win_session_finalize_stream,
        "agg_pricing_summary": q_agg_pricing_summary,
        "agg_region_revenue": q_agg_region_revenue,
        "agg_top_orders_per_segment": q_agg_top_orders_per_segment,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_minhash_signatures": q_dedup_minhash_signatures,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "pack_chunks": q_pack_chunks,
        "sample_stratified": q_sample_stratified,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_bucketed_topk": q_ann_bucketed_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_near_dup_pairs": q_ann_near_dup_pairs,
        "mm_decode_features": q_mm_decode_features,
        "mm_frame_sample": q_mm_frame_sample,
        "mm_ppm_decode": q_mm_ppm_decode,
        "mm_pgm_decode": q_mm_pgm_decode,
        "rg_incremental_stream": q_rg_incremental_stream,
        "rg_incremental_individuals": q_rg_incremental_individuals,
        "rg_incremental_equiv": q_rg_incremental_equiv,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# Fixture-A R1-R4 fixpoint, unrolled to 2 rounds (this fixture needs exactly
# one R4 feedback round; round 2 re-derives at fixpoint). Told facts mirror
# relation_graph_spark.fixtures.MATERIALIZE_TEST_ROWS (the reference's
# materialize_test.ofn re-encoded); output config: output_subclasses=True,
# reflexive_subclasses=False, equivalence_as_subclass=True (engine defaults
# mirror reference Config.scala defaults). Used for BOTH the batch fixture
# query and the streaming pipeline (stream output == one-shot batch output).
_FIXTURE_A_SQL = """
    WITH RECURSIVE
    sc0(sub, sup) AS (VALUES (12, 11), (13, 12)),
    somet(s, p, f) AS (VALUES (11, 21, 14), (15, 21, 13), (16, 21, 12)),
    defsome(f, p, o) AS (VALUES (16, 21, 12)),
    classes(c) AS (VALUES (11), (12), (13), (14), (15), (16)),
    spstar(sub, sup) AS (VALUES (21, 21)),
    tc0(sub, sup) AS (
      SELECT sub, sup FROM sc0
      UNION
      SELECT tc0.sub, sc0.sup FROM tc0 JOIN sc0 ON tc0.sup = sc0.sub
    ),
    star0 AS (SELECT sub, sup FROM tc0 UNION SELECT c, c FROM classes),
    rel0 AS (
      SELECT DISTINCT xs.sub AS s, sp.sup AS p, fo.sup AS o
      FROM somet t
      JOIN star0 xs ON t.s = xs.sup
      JOIN spstar sp ON t.p = sp.sub
      JOIN star0 fo ON t.f = fo.sub
    ),
    newsc AS (
      SELECT DISTINCT r.s AS sub, d.f AS sup
      FROM rel0 r JOIN defsome d ON r.p = d.p AND r.o = d.o
      WHERE r.s <> d.f
    ),
    sc1(sub, sup) AS (SELECT sub, sup FROM sc0 UNION SELECT sub, sup FROM newsc),
    tc1(sub, sup) AS (
      SELECT sub, sup FROM sc1
      UNION
      SELECT tc1.sub, sc1.sup FROM tc1 JOIN sc1 ON tc1.sup = sc1.sub
    ),
    star1 AS (SELECT sub, sup FROM tc1 UNION SELECT c, c FROM classes),
    rel1 AS (
      SELECT DISTINCT xs.sub AS s, sp.sup AS p, fo.sup AS o
      FROM somet t
      JOIN star1 xs ON t.s = xs.sup
      JOIN spstar sp ON t.p = sp.sub
      JOIN star1 fo ON t.f = fo.sub
    )
    SELECT CAST(s AS INT) AS s, CAST(p AS INT) AS p, CAST(o AS INT) AS o FROM rel1
    UNION ALL
    SELECT CAST(sub AS INT), 3, CAST(sup AS INT) FROM tc1 WHERE sub <> sup
"""

_EN_STOP = "['the','and','of','to','a','in','is','it','for','on']"
_ES_STOP = "['el','la','de','que','y','en','un','los','se','por']"
_WORDS = "list_distinct(regexp_extract_all(lower(text), '[A-Za-z0-9]+'))"


def oracle_sql() -> dict[str, str]:
    q = {}

    q["rg_materialize_fixture"] = _FIXTURE_A_SQL
    # exactly-once invariant: the 3-micro-batch stream over the same fixture
    # must produce the identical edge set as the one-shot batch run
    q["rg_incremental_stream"] = _FIXTURE_A_SQL

    # individuals-mode stream: live sink set (committed minus tombstoned)
    # == the one-shot batch semantics over the union of the told batches —
    # incl. EL bottom-rule unsatisfiability (12 unsat makes 11 and 13 unsat
    # via the some(11,21,12) filler rule), object-side suppression of class,
    # taxonomy AND individual-existential rows, while rdf:type rows are not
    # unsat-gated (reference computes them before its unsat check)
    q["rg_incremental_individuals"] = """
        WITH RECURSIVE
        sc(sub, sup) AS (VALUES (13, 11), (12, 2)),
        somet(s, p, f) AS (VALUES (11, 21, 12)),
        asrt(ind, c) AS (VALUES (91, 11), (92, 13), (92, 11)),
        classes(c) AS (VALUES (11), (12), (13)),
        tc(sub, sup) AS (
          SELECT sub, sup FROM sc
          UNION
          SELECT tc.sub, sc.sup FROM tc JOIN sc ON tc.sup = sc.sub
        ),
        star(sub, sup) AS (SELECT sub, sup FROM tc UNION SELECT c, c FROM classes),
        unsat(c) AS (
          SELECT sub FROM tc WHERE sup = 2
          UNION
          SELECT s2.sub
          FROM unsat JOIN somet t ON t.f = unsat.c
          JOIN star s2 ON s2.sup = t.s
        ),
        rel AS (
          SELECT DISTINCT xs.sub AS s, t.p AS p, fo.sup AS o
          FROM somet t
          JOIN star xs ON t.s = xs.sup
          JOIN star fo ON t.f = fo.sub
          WHERE fo.sup NOT IN (1, 2) AND xs.sub NOT IN (1, 2)
        ),
        relv AS (SELECT * FROM rel WHERE o NOT IN (SELECT c FROM unsat)),
        taxo AS (
          SELECT sub AS s, 3 AS p, sup AS o FROM tc
          WHERE sub <> sup AND sub NOT IN (1, 2) AND sup NOT IN (1, 2)
            AND sup NOT IN (SELECT c FROM unsat)
        ),
        indx AS (
          SELECT DISTINCT a.ind AS s, r.p AS p, r.o AS o
          FROM asrt a JOIN relv r ON a.c = r.s
        ),
        ityp AS (
          SELECT DISTINCT a.ind AS s, 5 AS p, h.sup AS o
          FROM asrt a JOIN star h ON a.c = h.sub
          WHERE h.sup NOT IN (1, 2)
        )
        SELECT CAST(s AS INT) AS s, CAST(p AS INT) AS p, CAST(o AS INT) AS o FROM relv
        UNION SELECT CAST(s AS INT), CAST(p AS INT), CAST(o AS INT) FROM taxo
        UNION SELECT CAST(s AS INT), CAST(p AS INT), CAST(o AS INT) FROM indx
        UNION SELECT CAST(s AS INT), CAST(p AS INT), CAST(o AS INT) FROM ityp
    """

    # equivalence-feedback stream: live sink set == one-shot R1-R4 fixpoint
    # over the union of the 4 told batches (_EQUIV_STREAM_BATCHES). Two
    # unrolled R4 rounds; this told set reaches fixpoint after one (round 2
    # re-derives identically).
    q["rg_incremental_equiv"] = """
        WITH RECURSIVE
        sc0(sub, sup) AS (VALUES (12, 11), (13, 12), (14, 13)),
        somet(s, p, f) AS (VALUES (11, 21, 14), (15, 21, 13), (16, 21, 12), (17, 21, 11)),
        defsome(f, p, o) AS (VALUES (16, 21, 12), (17, 21, 11)),
        classes(c) AS (VALUES (11), (12), (13), (14), (15), (16), (17)),
        spstar(sub, sup) AS (VALUES (21, 21)),
        tc0(sub, sup) AS (
          SELECT sub, sup FROM sc0
          UNION
          SELECT tc0.sub, sc0.sup FROM tc0 JOIN sc0 ON tc0.sup = sc0.sub
        ),
        star0 AS (SELECT sub, sup FROM tc0 UNION SELECT c, c FROM classes),
        rel0 AS (
          SELECT DISTINCT xs.sub AS s, sp.sup AS p, fo.sup AS o
          FROM somet t
          JOIN star0 xs ON t.s = xs.sup
          JOIN spstar sp ON t.p = sp.sub
          JOIN star0 fo ON t.f = fo.sub
        ),
        newsc1 AS (
          SELECT DISTINCT r.s AS sub, d.f AS sup
          FROM rel0 r JOIN defsome d ON r.p = d.p AND r.o = d.o
          WHERE r.s <> d.f
        ),
        sc1(sub, sup) AS (SELECT sub, sup FROM sc0 UNION SELECT sub, sup FROM newsc1),
        tc1(sub, sup) AS (
          SELECT sub, sup FROM sc1
          UNION
          SELECT tc1.sub, sc1.sup FROM tc1 JOIN sc1 ON tc1.sup = sc1.sub
        ),
        star1 AS (SELECT sub, sup FROM tc1 UNION SELECT c, c FROM classes),
        rel1 AS (
          SELECT DISTINCT xs.sub AS s, sp.sup AS p, fo.sup AS o
          FROM somet t
          JOIN star1 xs ON t.s = xs.sup
          JOIN spstar sp ON t.p = sp.sub
          JOIN star1 fo ON t.f = fo.sub
        ),
        newsc2 AS (
          SELECT DISTINCT r.s AS sub, d.f AS sup
          FROM rel1 r JOIN defsome d ON r.p = d.p AND r.o = d.o
          WHERE r.s <> d.f
        ),
        sc2(sub, sup) AS (SELECT sub, sup FROM sc1 UNION SELECT sub, sup FROM newsc2),
        tc2(sub, sup) AS (
          SELECT sub, sup FROM sc2
          UNION
          SELECT tc2.sub, sc2.sup FROM tc2 JOIN sc2 ON tc2.sup = sc2.sub
        ),
        star2 AS (SELECT sub, sup FROM tc2 UNION SELECT c, c FROM classes),
        rel2 AS (
          SELECT DISTINCT xs.sub AS s, sp.sup AS p, fo.sup AS o
          FROM somet t
          JOIN star2 xs ON t.s = xs.sup
          JOIN spstar sp ON t.p = sp.sub
          JOIN star2 fo ON t.f = fo.sub
        )
        SELECT CAST(s AS INT) AS s, CAST(p AS INT) AS p, CAST(o AS INT) AS o FROM rel2
        UNION ALL
        SELECT CAST(sub AS INT), 3, CAST(sup AS INT) FROM tc2 WHERE sub <> sup
    """

    q["rg_tc_orders_forest"] = """
        WITH RECURSIVE e AS (
          SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS child,
                          CAST(o_orderkey // 7 AS BIGINT) AS parent
          FROM orders WHERE o_orderkey >= 7
        ),
        tc(child, parent) AS (
          SELECT child, parent FROM e
          UNION
          SELECT tc.child, e.parent FROM tc JOIN e ON tc.parent = e.child
        )
        SELECT child, parent FROM tc
    """

    q["rg_exist_rel_star"] = """
        WITH RECURSIVE sc AS (
          SELECT CAST(c_custkey + 1000000 AS BIGINT) AS sub,
                 CAST(c_nationkey + 1000 AS BIGINT) AS sup FROM customer
          UNION
          SELECT CAST(n_nationkey + 1000 AS BIGINT),
                 CAST(n_regionkey + 100 AS BIGINT) FROM nation
        ),
        somet AS (
          SELECT DISTINCT CAST(o_custkey + 1000000 AS BIGINT) AS s,
                 CAST(7 AS BIGINT) AS p,
                 CAST((o_custkey % 25) + 1000 AS BIGINT) AS f FROM orders
        ),
        nodes AS (
          SELECT sub AS c FROM sc UNION SELECT sup FROM sc
          UNION SELECT s FROM somet UNION SELECT f FROM somet
        ),
        tc(sub, sup) AS (
          SELECT sub, sup FROM sc
          UNION
          SELECT tc.sub, sc.sup FROM tc JOIN sc ON tc.sup = sc.sub
        ),
        scstar AS (SELECT sub, sup FROM tc UNION SELECT c, c FROM nodes)
        SELECT DISTINCT xs.sub AS s, somet.p AS p, fo.sup AS o
        FROM somet
        JOIN scstar xs ON somet.s = xs.sup
        JOIN scstar fo ON somet.f = fo.sub
    """

    q["rg_anti_join_orphans"] = """
        SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """

    q["rg_semi_join_suppliers"] = """
        SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name AS name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
    """

    q["rg_edge_hash"] = """
        SELECT CAST(n_nationkey AS INT) AS s, 3 AS p, CAST(n_regionkey AS INT) AS o,
               to_base64(from_hex(sha256(
                 CAST(n_nationkey AS VARCHAR) || ':3:' || CAST(n_regionkey AS VARCHAR)
               ))) AS edge_hash
        FROM nation
    """

    q["rg_set_union_edges"] = """
        SELECT CAST(c_custkey + 1000000 AS BIGINT) AS child,
               CAST(c_nationkey + 1000 AS BIGINT) AS parent FROM customer
        UNION
        SELECT CAST(s_suppkey + 2000000 AS BIGINT),
               CAST(s_nationkey + 1000 AS BIGINT) FROM supplier
    """

    q["rg_reify_owl"] = """
        WITH e AS (
          SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                 'http://example.org/prop/locatedIn' AS p,
                 'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS o
          FROM nation
        ),
        b AS (
          SELECT s, p, o,
                 '_:' || replace(replace(replace(
                   to_base64(from_hex(sha256(s || ':' || p || ':' || o))),
                   '+',''),'/',''),'=','') AS bnode
          FROM e
        )
        SELECT s, 'http://www.w3.org/2000/01/rdf-schema#subClassOf' AS p, bnode AS o FROM b
        UNION ALL
        SELECT bnode, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'http://www.w3.org/2002/07/owl#Restriction' FROM b
        UNION ALL
        SELECT bnode, 'http://www.w3.org/2002/07/owl#onProperty', p FROM b
        UNION ALL
        SELECT bnode, 'http://www.w3.org/2002/07/owl#someValuesFrom', o FROM b
    """

    q["rg_ntriples_lines"] = """
        SELECT '<http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) ||
               '> <http://example.org/prop/locatedIn> <http://example.org/region/' ||
               CAST(n_regionkey AS VARCHAR) || '> .' AS line
        FROM nation
    """

    q["rg_prefix_compact"] = """
        WITH i AS (
          SELECT 'http://purl.obolibrary.org/obo/NAT_' ||
                 lpad(CAST(n_nationkey AS VARCHAR), 7, '0') AS iri
          FROM nation
        )
        SELECT iri,
               regexp_replace(iri, '^http://purl\\.obolibrary\\.org/obo/([^_]+)_(.+)$', '\\1:\\2') AS curie
        FROM i
    """

    q["rg_triples_to_axioms"] = """
        WITH e AS (
          SELECT CAST(n_nationkey + 100 AS INT) AS s,
                 CAST(CASE WHEN n_nationkey % 4 = 0 THEN 3
                           WHEN n_nationkey % 4 = 1 THEN 4
                           WHEN n_nationkey % 4 = 2 THEN 5
                           ELSE 21 END AS INT) AS p,
                 CAST(n_regionkey + 200 AS INT) AS o
          FROM nation
        )
        SELECT DISTINCT
               CAST(CASE WHEN p = 3 THEN 101 WHEN p = 4 THEN 108
                         WHEN p = 5 THEN 107 ELSE 102 END AS INT) AS atype,
               CAST(CASE WHEN p = 5 THEN o ELSE s END AS INT) AS s,
               CAST(CASE WHEN p = 3 THEN o WHEN p = 4 THEN o
                         WHEN p = 5 THEN s ELSE p END AS INT) AS p,
               CAST(CASE WHEN p NOT IN (3, 4, 5) THEN o END AS INT) AS o
        FROM e
    """

    q["rg_prefix_map_precedence"] = """
        WITH i AS (
          SELECT CASE
            WHEN n_nationkey % 3 = 0 THEN 'http://purl.obolibrary.org/obo/NAT_' ||
                 lpad(CAST(n_nationkey AS VARCHAR), 7, '0')
            WHEN n_nationkey % 3 = 1 THEN 'http://example.org/plain/' ||
                 CAST(n_nationkey AS VARCHAR)
            ELSE 'http://purl.obolibrary.org/obo/GO_' || CAST(n_nationkey AS VARCHAR)
          END AS iri
          FROM nation
        )
        SELECT iri,
               CASE
                 WHEN starts_with(iri, 'http://purl.obolibrary.org/obo/NAT_')
                   THEN 'nat:' || substr(iri, 36)
                 WHEN starts_with(iri, 'http://purl.obolibrary.org/obo/')
                   THEN 'obo:' || substr(iri, 32)
                 ELSE iri
               END AS curie,
               iri AS curie_no_obo
        FROM i
    """

    q["win_closure_per_window"] = """
        WITH RECURSIVE e AS (
          SELECT DISTINCT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
                 CAST(event_id % 500 + 100 AS BIGINT) AS child,
                 CAST((event_id % 500) // 7 + 100 AS BIGINT) AS parent
          FROM events
          WHERE event_id % 500 + 100 <> (event_id % 500) // 7 + 100
        ),
        tc(win_start, child, parent) AS (
          SELECT win_start, child, parent FROM e
          UNION
          SELECT tc.win_start, tc.child, e.parent
          FROM tc JOIN e ON tc.parent = e.child AND tc.win_start = e.win_start
        )
        SELECT win_start, child, parent FROM tc
    """

    q["win_tumbling_hour"] = """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events GROUP BY 1, 2
    """

    q["win_sliding"] = """
        WITH w AS (
          SELECT time_bucket(INTERVAL 30 MINUTES, ts) - k * INTERVAL 30 MINUTES AS win_start,
                 value
          FROM events CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) offs
        )
        SELECT win_start, COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM w GROUP BY 1
    """

    q["win_session_user"] = """
        WITH d AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        i AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS island
          FROM d
        )
        SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n_events
        FROM i GROUP BY user_id, island
    """

    # per-session closure: gaps-and-islands session assignment (new session
    # when the gap since the key's previous event EXCEEDS 30 min — Spark
    # session_window semantics incl. the touching-boundary merge,
    # boundary-equivalence pytest) + recursive closure scoped by
    # (user, session start)
    q["win_session_closure"] = """
        WITH RECURSIVE e AS (
          SELECT user_id, ts,
                 CAST(event_id % 300 + 100 AS BIGINT) AS child,
                 CAST((event_id % 300) // 5 + 100 AS BIGINT) AS parent
          FROM events
          WHERE event_id % 300 + 100 <> (event_id % 300) // 5 + 100
        ),
        d AS (
          SELECT user_id, ts, child, parent,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_s
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, child, parent)
        ),
        i AS (
          SELECT user_id, ts, child, parent,
                 SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, child, parent
                   ROWS UNBOUNDED PRECEDING
                 ) AS island
          FROM d
        ),
        s AS (
          SELECT DISTINCT user_id,
                 MIN(ts) OVER (PARTITION BY user_id, island) AS sess_start,
                 child, parent
          FROM i
        ),
        tc(user_id, sess_start, child, parent) AS (
          SELECT user_id, sess_start, child, parent FROM s
          UNION
          SELECT tc.user_id, tc.sess_start, tc.child, s.parent
          FROM tc JOIN s ON tc.parent = s.child
                        AND tc.user_id = s.user_id
                        AND tc.sess_start = s.sess_start
        )
        SELECT user_id, sess_start, child, parent FROM tc
    """

    # duration-capped variant: greedy chunk anchors via a recursive CTE
    # (anchor_0 = session start; anchor_{k+1} = first event strictly after
    # anchor_k + cap), each row assigned to the greatest anchor <= its ts,
    # then the same per-chunk recursive TC. Mirrors
    # windows.split_long_sessions (cap = 10 minutes here).
    q["win_session_split_closure"] = """
        WITH RECURSIVE e AS (
          SELECT CAST(user_id AS VARCHAR) AS user_id, ts,
                 CAST(event_id % 300 + 100 AS BIGINT) AS child,
                 CAST((event_id % 300) // 5 + 100 AS BIGINT) AS parent
          FROM events
          WHERE event_id % 300 + 100 <> (event_id % 300) // 5 + 100
        ),
        d AS (
          SELECT user_id, ts, child, parent,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_s
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, child, parent)
        ),
        i AS (
          SELECT user_id, ts, child, parent,
                 SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, child, parent
                   ROWS UNBOUNDED PRECEDING
                 ) AS island
          FROM d
        ),
        anchors(user_id, island, anchor) AS (
          SELECT user_id, island, MIN(ts) FROM i GROUP BY user_id, island
          UNION
          SELECT a.user_id, a.island,
                 (SELECT MIN(i.ts) FROM i
                   WHERE i.user_id = a.user_id AND i.island = a.island
                     AND i.ts > a.anchor + INTERVAL 10 MINUTES)
          FROM anchors a
          WHERE EXISTS (SELECT 1 FROM i
                   WHERE i.user_id = a.user_id AND i.island = a.island
                     AND i.ts > a.anchor + INTERVAL 10 MINUTES)
        ),
        s AS (
          SELECT DISTINCT i.user_id,
                 (SELECT MAX(a.anchor) FROM anchors a
                   WHERE a.user_id = i.user_id AND a.island = i.island
                     AND a.anchor <= i.ts) AS sess_start,
                 i.child, i.parent
          FROM i
        ),
        tc(user_id, sess_start, child, parent) AS (
          SELECT user_id, sess_start, child, parent FROM s
          UNION
          SELECT tc.user_id, tc.sess_start, tc.child, s.parent
          FROM tc JOIN s ON tc.parent = s.child
                        AND tc.user_id = s.user_id
                        AND tc.sess_start = s.sess_start
        )
        SELECT user_id, sess_start, child, parent FROM tc
    """

    # streaming finalization variant: same gaps-and-islands assignment +
    # closure, restricted to sessions the watermark FINALIZED by stream end
    # (last_ts + gap strictly below the final watermark = global max ts of
    # the edge rows; delay=0). Open sessions emit nothing.
    q["win_session_finalize_stream"] = """
        WITH RECURSIVE e AS (
          SELECT CAST(user_id AS VARCHAR) AS user_id, ts,
                 CAST(event_id % 300 + 100 AS BIGINT) AS child,
                 CAST((event_id % 300) // 5 + 100 AS BIGINT) AS parent
          FROM events
          WHERE event_id % 300 + 100 <> (event_id % 300) // 5 + 100
        ),
        d AS (
          SELECT user_id, ts, child, parent,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_s
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, child, parent)
        ),
        i AS (
          SELECT user_id, ts, child, parent,
                 SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, child, parent
                   ROWS UNBOUNDED PRECEDING
                 ) AS island
          FROM d
        ),
        s AS (
          SELECT DISTINCT user_id,
                 MIN(ts) OVER (PARTITION BY user_id, island) AS sess_start,
                 MAX(ts) OVER (PARTITION BY user_id, island) AS sess_last,
                 child, parent
          FROM i
        ),
        f AS (
          SELECT user_id, sess_start, child, parent FROM s
          WHERE sess_last + INTERVAL 30 MINUTES < (SELECT MAX(ts) FROM e)
        ),
        tc(user_id, sess_start, child, parent) AS (
          SELECT user_id, sess_start, child, parent FROM f
          UNION
          SELECT tc.user_id, tc.sess_start, tc.child, f.parent
          FROM tc JOIN f ON tc.parent = f.child
                        AND tc.user_id = f.user_id
                        AND tc.sess_start = f.sess_start
        )
        SELECT user_id, sess_start, child, parent FROM tc
    """

    q["agg_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """

    q["agg_region_revenue"] = """
        SELECT r_name, n_name,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """

    q["agg_top_orders_per_segment"] = """
        WITH r AS (
          SELECT c_mktsegment AS segment, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM customer JOIN orders ON c_custkey = o_custkey
        )
        SELECT segment, CAST(o_orderkey AS BIGINT) AS orderkey, totalprice_c, rnk
        FROM r WHERE rnk <= 3
    """

    q["dedup_exact"] = """
        SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1
    """

    q["dedup_jaccard_pairs"] = f"""
        WITH t AS (
          SELECT doc_id, {_WORDS} AS toks FROM documents WHERE doc_id < 150
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(floor(len(list_intersect(a.toks, b.toks)) * 1000000 /
                    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))) AS BIGINT) AS jaccard_ppm
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE CAST(floor(len(list_intersect(a.toks, b.toks)) * 1000000 /
              (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))) AS BIGINT) >= 300000
    """

    _mh = lambda k: f"MIN(md5('{k}:' || tok)) AS mh{k}"
    q["dedup_minhash_signatures"] = f"""
        SELECT doc_id, {", ".join(_mh(k) for k in range(4))}
        FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
        GROUP BY doc_id
    """

    q["dedup_minhash_lsh"] = f"""
        WITH sigs AS (
          SELECT doc_id, {", ".join(_mh(k) for k in range(8))}
          FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
          GROUP BY doc_id
        ),
        bands0 AS (
          SELECT doc_id, unnest([
            '0' || '|' || mh0 || '|' || mh1,
            '1' || '|' || mh2 || '|' || mh3,
            '2' || '|' || mh4 || '|' || mh5,
            '3' || '|' || mh6 || '|' || mh7
          ]) AS bucket FROM sigs
        ),
        bands AS (  -- hot-bucket cap mirrors max_bucket_size=64
          SELECT doc_id, bucket FROM (
            SELECT doc_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
            FROM bands0
          ) WHERE bn <= 64
        )
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
    """

    q["dedup_simhash"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({_WORDS}) AS tok FROM documents
        ),
        h AS (
          SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, b.bit,
                 SUM(((h >> b.bit) & 1) * 2 - 1) AS votes
          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
          GROUP BY doc_id, b.bit
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """

    q["dedup_clusters"] = f"""
        WITH RECURSIVE sigs AS (
          SELECT doc_id, {", ".join(_mh(k) for k in range(8))}
          FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
          GROUP BY doc_id
        ),
        bands0 AS (
          SELECT doc_id, unnest([
            '0' || '|' || mh0 || '|' || mh1,
            '1' || '|' || mh2 || '|' || mh3,
            '2' || '|' || mh4 || '|' || mh5,
            '3' || '|' || mh6 || '|' || mh7
          ]) AS bucket FROM sigs
        ),
        bands AS (
          SELECT doc_id, bucket FROM (
            SELECT doc_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
            FROM bands0
          ) WHERE bn <= 64
        ),
        p AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
        ),
        e AS (SELECT a AS x, b AS y FROM p UNION SELECT b, a FROM p),
        reach(n, m) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.y, r.m FROM reach r JOIN e ON e.x = r.n
        )
        SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
    """

    q["text_token_stats"] = """
        SELECT doc_id,
               len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
               length(regexp_replace(text, '\\s+', '', 'g')) AS n_chars_nospace
        FROM documents
    """

    q["text_quality"] = f"""
        WITH w AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS words,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
          FROM documents
        )
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(CASE WHEN len(words) > 0
                 THEN floor(list_sum(list_transform(words, x -> length(x))) * 1000000 / len(words))
                 ELSE 0 END AS BIGINT) AS mean_word_len_ppm,
               CAST(CASE WHEN n_chars > 0
                 THEN floor(n_punct * 1000000 / n_chars) ELSE 0 END AS BIGINT) AS punct_ratio_ppm,
               CAST(CASE WHEN len(words) > 0
                 THEN floor(len(list_intersect(list_distinct(words), {_EN_STOP})) * 1000000 / len(words))
                 ELSE 0 END AS BIGINT) AS stopword_ratio_ppm
        FROM w
    """

    q["text_langid"] = f"""
        WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents)
        SELECT doc_id,
               len(list_intersect(words, {_EN_STOP})) AS en_hits,
               len(list_intersect(words, {_ES_STOP})) AS es_hits,
               CASE WHEN len(list_intersect(words, {_EN_STOP})) >= 2
                     AND len(list_intersect(words, {_EN_STOP})) >= len(list_intersect(words, {_ES_STOP}))
                    THEN 'en'
                    WHEN len(list_intersect(words, {_ES_STOP})) >= 2
                     AND len(list_intersect(words, {_ES_STOP})) > len(list_intersect(words, {_EN_STOP}))
                    THEN 'es'
                    ELSE 'unk' END AS lang_pred
        FROM w
    """

    q["text_fingerprint"] = """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_norm,
               md5(array_to_string(list_sort(list_distinct(
                 regexp_extract_all(lower(text), '[A-Za-z0-9]+'))), ' ')) AS fp_bag
        FROM documents
    """

    # concat-then-chunk packing: identical ordered cumulative sum per
    # (source, doc_id%16) stream; integer chunk arithmetic on the absolute
    # token offset (DuckDB // == Spark div on bigints)
    q["pack_chunks"] = """
        WITH d AS (
          SELECT source, doc_id % 16 AS shard, doc_id,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
          FROM documents
        ),
        o AS (
          SELECT source, shard, doc_id, n_tok,
                 CAST(SUM(n_tok) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
                 ) - n_tok AS BIGINT) AS begin_off
          FROM d
        )
        SELECT source, shard, doc_id, n_tok, begin_off,
               CAST(begin_off // 2048 AS BIGINT) AS first_chunk,
               CAST(begin_off % 2048 AS BIGINT) AS chunk_off,
               CAST((begin_off + n_tok - 1) // 2048 AS BIGINT) AS last_chunk
        FROM o
    """

    # deterministic stratified sampling: the identical md5 4-hex prefix
    # predicate (rates quantized to /65536: en 0.5 -> '8000', de 0.3 ->
    # '4ccd', fr 0.2 -> '3333', zh 0.1 -> '199a', default 0.05 -> '0ccd')
    q["sample_stratified"] = """
        SELECT doc_id, lang, source
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE lang
                WHEN 'en' THEN '8000'
                WHEN 'de' THEN '4ccd'
                WHEN 'fr' THEN '3333'
                WHEN 'zh' THEN '199a'
                ELSE '0ccd'
              END
    """

    _QVEC = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    q["ann_cosine_topk"] = f"""
        WITH qv AS (
          SELECT {_QVEC} AS q FROM embeddings WHERE vec_id = 0
        ),
        v AS (
          SELECT vec_id, {_QVEC} AS q FROM embeddings WHERE vec_id <> 0
        ),
        s AS (
          SELECT v.vec_id,
                 CAST(floor(
                   list_sum(list_transform(list_zip(v.q, qv.q), p -> p[1] * p[2])) * 1000000 /
                   sqrt(CAST(list_sum(list_transform(v.q, x -> x * x)) AS DOUBLE) *
                        CAST(list_sum(list_transform(qv.q, x -> x * x)) AS DOUBLE))
                 ) AS BIGINT) AS cosine_ppm
          FROM v CROSS JOIN qv
        )
        SELECT vec_id, cosine_ppm,
               CAST(row_number() OVER (ORDER BY cosine_ppm DESC, vec_id ASC) AS INT) AS rank
        FROM s QUALIFY rank <= 10
    """

    q["ann_near_dup_pairs"] = f"""
        WITH b0 AS (
          SELECT vec_id, {_QVEC} AS q,
                 (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
                 (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
                 (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
          FROM embeddings WHERE vec_id < 300
        ),
        b AS (  -- hot-bucket cap mirrors max_bucket_size=64
          SELECT vec_id, q, bucket FROM (
            SELECT vec_id, q, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
            FROM b0
          ) WHERE bn <= 64
        ),
        p AS (
          SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
                 CAST(floor(
                   list_sum(list_transform(list_zip(a.q, b2.q), z -> z[1] * z[2])) * 1000000 /
                   sqrt(CAST(list_sum(list_transform(a.q, x -> x * x)) AS DOUBLE) *
                        CAST(list_sum(list_transform(b2.q, x -> x * x)) AS DOUBLE))
                 ) AS BIGINT) AS cosine_ppm
          FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        )
        SELECT vec_a, vec_b, cosine_ppm FROM p WHERE cosine_ppm >= 150000
    """

    q["ann_bucketed_topk"] = f"""
        WITH b AS (
          SELECT vec_id, embedding,
                 (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
                 (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
                 (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
          FROM embeddings
        ),
        cand AS (
          SELECT b.vec_id, b.embedding FROM b
          JOIN (SELECT bucket FROM b WHERE vec_id = 0) qb ON b.bucket = qb.bucket
        ),
        qv AS (SELECT {_QVEC} AS q FROM cand AS embeddings WHERE vec_id = 0),
        v AS (SELECT vec_id, {_QVEC} AS q FROM cand AS embeddings WHERE vec_id <> 0),
        s AS (
          SELECT v.vec_id,
                 CAST(floor(
                   list_sum(list_transform(list_zip(v.q, qv.q), p -> p[1] * p[2])) * 1000000 /
                   sqrt(CAST(list_sum(list_transform(v.q, x -> x * x)) AS DOUBLE) *
                        CAST(list_sum(list_transform(qv.q, x -> x * x)) AS DOUBLE))
                 ) AS BIGINT) AS cosine_ppm
          FROM v CROSS JOIN qv
        )
        SELECT vec_id, cosine_ppm,
               CAST(row_number() OVER (ORDER BY cosine_ppm DESC, vec_id ASC) AS INT) AS rank
        FROM s QUALIFY rank <= 10
    """

    q["ann_ivf_topk"] = f"""
        WITH v AS (SELECT vec_id, {_QVEC} AS q FROM embeddings),
        n AS (
          SELECT vec_id, q,
                 list_sum(list_transform(q, x -> x * x)) AS n2
          FROM v
        ),
        c AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM n WHERE vec_id < 8),
        a AS (  -- nearest-centroid assignment, exact int L2, ties by cent_id
          SELECT vec_id, q, n2, cent_id FROM (
            SELECT n.vec_id, n.q, n.n2, c.cent_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     (n.n2 + c.cn2 - 2 * list_sum(list_transform(
                        list_zip(n.q, c.cq), z -> z[1] * z[2]))) ASC,
                     c.cent_id ASC) AS r
            FROM n CROSS JOIN c
          ) WHERE r = 1
        ),
        qr AS (SELECT q AS qq, n2 AS qn2 FROM n WHERE vec_id = 0),
        probes AS (  -- n_probe=2 nearest lists to the query
          SELECT cent_id FROM (
            SELECT c.cent_id,
                   row_number() OVER (ORDER BY
                     (qr.qn2 + c.cn2 - 2 * list_sum(list_transform(
                        list_zip(qr.qq, c.cq), z -> z[1] * z[2]))) ASC,
                     c.cent_id ASC) AS r
            FROM c CROSS JOIN qr
          ) WHERE r <= 2
        ),
        cand AS (
          SELECT a.vec_id, a.q, a.n2 FROM a
          JOIN probes USING (cent_id) WHERE a.vec_id <> 0
        ),
        s AS (
          SELECT cand.vec_id,
                 CAST(floor(
                   list_sum(list_transform(list_zip(cand.q, qr.qq), z -> z[1] * z[2])) * 1000000 /
                   sqrt(CAST(cand.n2 AS DOUBLE) * CAST(qr.qn2 AS DOUBLE))
                 ) AS BIGINT) AS cosine_ppm
          FROM cand CROSS JOIN qr
        )
        SELECT vec_id, cosine_ppm,
               CAST(row_number() OVER (ORDER BY cosine_ppm DESC, vec_id ASC) AS INT) AS rank
        FROM s QUALIFY rank <= 10
    """

    # PPM pixels are the text right-padded with '.' to 4*2*3 = 24 bytes
    # (documents are pure ASCII, so DuckDB chars == payload bytes); the
    # engine decodes the P6 header + pixel block and histograms pixel>>5
    q["mm_ppm_decode"] = """
        WITH m AS (
          SELECT doc_id AS media_id,
                 substr(rpad(text, 24, '.'), 1, 24) AS px
          FROM documents
        ),
        b AS (SELECT media_id, px, unnest(range(1, 25)) AS i FROM m),
        byt AS (
          SELECT media_id,
                 ascii(substr(px, CAST(i AS INT), 1)) // 32 AS d
          FROM b
        ),
        h AS (SELECT media_id, d, count(*) AS c FROM byt GROUP BY 1, 2),
        dims AS (SELECT unnest(range(8)) AS dim_idx)
        SELECT CAST(m.media_id AS BIGINT) AS media_id,
               CAST(24 AS BIGINT) AS n_bytes,
               CAST(dims.dim_idx AS INT) AS dim_idx,
               CAST(coalesce(h.c, 0) * 1000000 // 24 AS BIGINT) AS feat_ppm
        FROM m CROSS JOIN dims
        LEFT JOIN h ON h.media_id = m.media_id AND h.d = dims.dim_idx
    """

    q["mm_pgm_decode"] = """
        WITH m AS (
          SELECT doc_id AS media_id,
                 substr(rpad(text, 15, '.'), 1, 15) AS px
          FROM documents
        ),
        b AS (SELECT media_id, px, unnest(range(1, 16)) AS i FROM m),
        byt AS (
          SELECT media_id,
                 ascii(substr(px, CAST(i AS INT), 1)) // 32 AS d
          FROM b
        ),
        h AS (SELECT media_id, d, count(*) AS c FROM byt GROUP BY 1, 2),
        dims AS (SELECT unnest(range(8)) AS dim_idx)
        SELECT CAST(m.media_id AS BIGINT) AS media_id,
               CAST(15 AS BIGINT) AS n_bytes,
               CAST(dims.dim_idx AS INT) AS dim_idx,
               CAST(coalesce(h.c, 0) * 1000000 // 15 AS BIGINT) AS feat_ppm
        FROM m CROSS JOIN dims
        LEFT JOIN h ON h.media_id = m.media_id AND h.d = dims.dim_idx
    """

    q["mm_frame_sample"] = """
        WITH m AS (
          SELECT doc_id AS media_id, text, length(text) AS n_bytes
          FROM documents WHERE length(text) > 0
        ),
        f AS (
          SELECT media_id, text, n_bytes, unnest(range(4)) AS frame_idx FROM m
        )
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(frame_idx AS INT) AS frame_idx,
               CAST(1 + (frame_idx * n_bytes) // 4 AS BIGINT) AS byte_offset,
               CAST(ascii(substr(text, CAST(1 + (frame_idx * n_bytes) // 4 AS INT), 1)) AS INT) AS sample_byte
        FROM f
    """

    # payload bytes == code points because the synthetic documents are pure
    # ASCII (the Spark side hists real UTF-8 bytes; at scale the payload is
    # genuine binary and the oracle comparison is done on byte dumps instead)
    q["mm_decode_features"] = """
        WITH chars AS (
          SELECT doc_id AS media_id, length(text) AS n_bytes,
                 ascii(unnest(split(text, ''))) // 32 AS bin
          FROM documents
        ),
        counts AS (
          SELECT media_id, bin, COUNT(*) AS cnt FROM chars GROUP BY media_id, bin
        ),
        dims AS (
          SELECT doc_id AS media_id, length(text) AS n_bytes,
                 unnest(range(8)) AS dim_idx
          FROM documents
        )
        SELECT CAST(d.media_id AS BIGINT) AS media_id,
               CAST(d.n_bytes AS BIGINT) AS n_bytes,
               CAST(d.dim_idx AS INT) AS dim_idx,
               CAST(CASE WHEN d.n_bytes > 0
                    THEN COALESCE(c.cnt, 0) * 1000000 // d.n_bytes
                    ELSE 0 END AS BIGINT) AS feat_ppm
        FROM dims d
        LEFT JOIN counts c ON d.media_id = c.media_id AND d.dim_idx = c.bin
    """

    return q
