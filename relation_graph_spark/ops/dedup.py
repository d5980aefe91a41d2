"""Deduplication operators over documents(doc_id, text, ...).

- exact_dedup:        hash-groupBy (one shuffle on the content hash)
- ngram_jaccard_pairs: set-similarity self-join (bounded candidate scope)
- minhash_signatures / lsh_candidate_pairs: MinHash + banded LSH — the scale
  path: candidate generation is a shuffle on band buckets, never an O(n^2)
  self-join
- simhash:            64-bit-ish (configurable-width) simhash fingerprint

Hash parity contract: every hash is md5-of-string, so the DuckDB oracle
reproduces signatures bit-for-bit. At 100 TB, md5 on the JVM side is
whole-stage-codegen'd; the explode for minhash is one row per (doc, token)
— the same shape any shuffle-based shingling pipeline has — and the groupBy
computes all K minhashes in a single aggregation pass (map-side partial
aggregation applies).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from relation_graph_spark.ops.text import WORD_RE

# Driver fast path for connected components (round-7 optimization): when the
# candidate-PAIR set is small enough — and the LSH tiers are explicitly
# designed to keep it small (hot-bucket caps bound pairs regardless of corpus
# size) — a single union-find pass on the driver replaces O(diameter) rounds
# of min-label propagation, each of which costs a shuffle + an isEmpty probe
# + two checkpoints. Only the PAIRS are collected; the documents frame stays
# distributed (labels re-attach via one broadcast join), so the path is
# corpus-size-independent. Above the threshold the distributed loop runs
# unchanged.
_DRIVER_CC_PAIRS = int(os.environ.get("RGS_DRIVER_CC_PAIRS", "200000"))


def _tokens(col):
    return F.array_distinct(F.regexp_extract_all(F.lower(col), F.lit(WORD_RE), 0))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group identical texts by md5; keep the smallest doc_id as canonical."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold_ppm: int = 500000, max_doc_id: int | None = None
) -> DataFrame:
    """Word-set Jaccard similarity pairs (doc_a < doc_b, jaccard >= t).

    jaccard reported in exact ppm (|intersection|*1e6 / |union|, floored) for
    engine-order-independent values. `max_doc_id` bounds the self-join scope
    (the brute-force tier; LSH below is the scale tier).
    """
    base = docs
    if max_doc_id is not None:
        base = base.where(F.col("doc_id") < max_doc_id)
    t = base.select("doc_id", _tokens(F.col("text")).alias("toks"))
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("bigint")
    union = (
        F.size(F.col("a.toks")).cast("bigint")
        + F.size(F.col("b.toks")).cast("bigint")
        - inter
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.when(union > 0, F.floor((inter * 1000000) / union))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .where(F.col("jaccard_ppm") >= threshold_ppm)
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 8) -> DataFrame:
    """K md5-derived minhashes per document, one explode + one groupBy.

    h_k(doc) = min over tokens of md5('k:' || token). All K mins are computed
    in a single aggregation (map-side combine), so the shuffle carries one
    row per doc, not per (doc, hash).
    """
    exploded = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("tok")))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any band bucket.

    bands = num_hashes / band_size; bucket key = band index + concatenated
    minhashes. Candidate generation is groupBy(bucket) — linear shuffle, the
    100-TB near-dup path (vs the quadratic self-join above).

    `max_bucket_size` drops buckets holding more members than the cap BEFORE
    pair generation (hot-bucket guard: k identical boilerplate docs in one
    band bucket otherwise emit O(k^2) pairs; at scale those route to the
    exact-dedup pass, which handles identical content in one shuffle).
    """
    sigs = minhash_signatures(docs, num_hashes)
    n_bands = num_hashes // band_size
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col(f"mh{b * band_size + r}") for r in range(band_size)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        from relation_graph_spark.ops.similarity import cap_buckets

        bands = cap_buckets(bands, "bucket", max_bucket_size)
    x = bands.alias("x")
    y = bands.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .dropDuplicates()
    )


def _driver_cc_labels(
    docs: DataFrame, pairs_dd: DataFrame, doc_col: str
) -> DataFrame | None:
    """Union-find over a (bounded, collected) pair set; labels re-attach to
    the distributed docs frame via one broadcast join. Exactly mirrors the
    min-label loop's semantics: propagation only runs through nodes that
    exist in `docs` (edges touching unknown ids are inert there, so they are
    dropped here), cluster_id = min doc id of the component, singletons keep
    their own id."""
    import pandas as pd

    pdf = pairs_dd.toPandas()
    xs, ys = pdf["x"].tolist(), pdf["y"].tolist()
    nodes = {v for v in xs if v is not None} | {v for v in ys if v is not None}
    spark = docs.sparkSession
    doc_type = dict(docs.dtypes)[doc_col]
    base = docs.select(F.col(doc_col).alias("node")).dropDuplicates()
    if not nodes:
        return base.select(
            F.col("node").alias(doc_col), F.col("node").alias("cluster_id")
        )
    nodes_df = spark.createDataFrame(
        pd.DataFrame({"node": sorted(nodes)}), schema=f"node {doc_type}"
    )
    members = {
        r[0]
        for r in base.join(F.broadcast(nodes_df), on="node", how="left_semi")
        .collect()
    }
    parent: dict = {}

    def find(u):
        r = u
        while parent[r] != r:
            r = parent[r]
        while parent[u] != r:
            parent[u], u = r, parent[u]
        return r

    for u, v in zip(xs, ys):
        if u in members and v in members:
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    comp_min: dict = {}
    for u in parent:
        r = find(u)
        if r not in comp_min or u < comp_min[r]:
            comp_min[r] = u
    labels = [(u, comp_min[find(u)]) for u in parent]
    labels = [(u, l) for u, l in labels if l != u]
    if not labels:
        return base.select(
            F.col("node").alias(doc_col), F.col("node").alias("cluster_id")
        )
    label_df = spark.createDataFrame(
        pd.DataFrame(labels, columns=["node", "label"]),
        schema=f"node {doc_type}, label {doc_type}",
    )
    return (
        base.join(F.broadcast(label_df), on="node", how="left")
        .select(
            F.col("node").alias(doc_col),
            F.coalesce("label", "node").alias("cluster_id"),
        )
    )


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    doc_col: str = "doc_id",
    a: str = "doc_a",
    b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Assign every document to a duplicate cluster: connected components
    over the candidate-pair graph, cluster_id = min doc_id in the component
    (docs in no pair are their own singleton cluster).

    Min-label propagation, semi-naive: each round joins the CHANGED labels
    against the (symmetrized) edge list and keeps strict improvements —
    O(component diameter) rounds; near-dup components are shallow (stars
    around a canonical doc), so this converges in 2-4 rounds in practice.
    Every round is one shuffle on the node key; labels and edges are both
    (id, id) ints. At extreme scale swap in the large-star/small-star
    contraction — the operator contract (docs, pairs) -> (doc_id,
    cluster_id) stays identical.
    """
    pairs_dd = pairs.select(F.col(a).alias("x"), F.col(b).alias("y")).dropDuplicates()
    pairs_dd = pairs_dd.localCheckpoint(eager=False)
    n_pairs = pairs_dd.count()
    if n_pairs <= _DRIVER_CC_PAIRS:
        out = _driver_cc_labels(docs, pairs_dd, doc_col)
        if out is not None:
            return out
    edges = (
        pairs_dd.unionByName(
            pairs_dd.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    labels = docs.select(
        F.col(doc_col).alias("node"), F.col(doc_col).alias("label")
    ).dropDuplicates()
    changed = labels
    for _ in range(max_iterations):
        # labels reachable over one hop from nodes whose label just improved
        prop = (
            changed.join(edges, changed["node"] == edges["x"])
            .select(F.col("y").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        improved = (
            labels.join(prop, on="node", how="inner")
            .where(F.col("new_label") < F.col("label"))
            .select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=False)
        )
        if improved.isEmpty():
            break
        labels = (
            labels.join(improved.select("node"), on="node", how="left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=False)
        )
        changed = improved
    else:
        raise RuntimeError("duplicate_clusters did not converge")
    return labels.select(
        F.col("node").alias(doc_col), F.col("label").alias("cluster_id")
    )


def duplicate_clusters_star(
    docs: DataFrame,
    pairs: DataFrame,
    doc_col: str = "doc_id",
    a: str = "doc_a",
    b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log^2 n) rounds REGARDLESS of
    component diameter, where min-label propagation needs O(diameter)
    rounds. Same contract as duplicate_clusters: (docs, pairs) ->
    (doc_id, cluster_id = min doc_id in component).

    Use this tier when components can be long chains (transitive near-dup
    chains, crawl-mirror link paths); the min-label tier wins on shallow
    star-shaped near-dup components (see BENCH/BASELINE.md §4.4).
    """
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        # large-star: every node links its larger neighbors to its minimum
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        ls = (
            sym.join(mins, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .dropDuplicates()
            .localCheckpoint(eager=False)
        )
        # small-star: every node links its smaller neighbors (and itself)
        # to the minimum of that set; edges stay (larger -> smaller)
        mins2 = ls.groupBy("u").agg(F.min("v").alias("mn"))
        ss = (
            ls.join(mins2, on="u")
            .where(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(mins2.select("u", F.col("mn").alias("v")))
            .dropDuplicates()
            .localCheckpoint(eager=False)
        )
        # fixpoint: the edge set is a stable star forest when unchanged
        n_old, n_new = edges.count(), ss.count()
        n_union = edges.unionByName(ss).dropDuplicates().count()
        edges = ss
        if n_old == n_new == n_union:
            break
    else:
        raise RuntimeError("duplicate_clusters_star did not converge")
    roots = edges.select(F.col("u").alias("node"), F.col("v").alias("label"))
    return (
        docs.select(F.col(doc_col).alias("node"))
        .dropDuplicates()
        .join(roots, on="node", how="left")
        .select(
            F.col("node").alias(doc_col),
            F.coalesce("label", "node").alias("cluster_id"),
        )
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Simhash fingerprint: per token a `bits`-wide md5-derived hash; each bit
    votes +1/-1 weighted by presence; bit set where the vote sum is positive.

    Formulated as explode(token) x explode(bit) then one groupBy — the oracle
    (DuckDB) uses the identical formulation, so fingerprints match exactly.
    """
    h64 = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
    exploded = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        .select("doc_id", h64.alias("h"))
        .select(
            "doc_id",
            "h",
            F.explode(F.array([F.lit(b) for b in range(bits)])).alias("bit"),
        )
        .select(
            "doc_id",
            "bit",
            # shiftright with a column shift amount needs the SQL form
            F.expr("(shiftright(h, bit) & 1) * 2 - 1").alias("vote"),
        )
    )
    return (
        exploded.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("votes"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("votes") > 0,
                    F.expr("shiftleft(cast(1 as bigint), bit)"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
    )
