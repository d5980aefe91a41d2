"""Curation operators: sequence packing + deterministic stratified sampling
(relation_graph_spark/ops/curation.py)."""

import pyspark.sql.functions as F

from relation_graph_spark.ops.curation import pack_chunks, stratified_sample


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id: bigint, text: string, lang: string, source: string"
    )


def test_pack_chunks_hand_computed(spark):
    # one (source, shard) stream: doc_ids 0,16,32 all land in shard 0 of
    # srcA; token counts 3, 4, 5; budget 6
    rows = [
        (0, "a b c", "en", "srcA"),          # begin 0, chunk 0, off 0..2
        (16, "d e f g", "en", "srcA"),       # begin 3, starts chunk 0 off 3,
                                             # ends token 6 -> chunk 1
        (32, "h i j k l", "en", "srcA"),     # begin 7, chunk 1 off 1, ends
                                             # token 11 -> chunk 1
        (1, "x y", "en", "srcB"),            # independent stream (srcB sh 1)
    ]
    out = {
        r.doc_id: r
        for r in pack_chunks(
            _docs(spark, rows), budget=6, n_shards=16
        ).collect()
    }
    assert (out[0].begin_off, out[0].first_chunk, out[0].chunk_off,
            out[0].last_chunk) == (0, 0, 0, 0)
    assert (out[16].begin_off, out[16].first_chunk, out[16].chunk_off,
            out[16].last_chunk) == (3, 0, 3, 1)  # straddles the cut
    assert (out[32].begin_off, out[32].first_chunk, out[32].chunk_off,
            out[32].last_chunk) == (7, 1, 1, 1)
    assert (out[1].begin_off, out[1].first_chunk) == (0, 0)
    # shard derives from doc_id, not physical partitioning
    assert out[0].shard == 0 and out[16].shard == 0 and out[1].shard == 1


def test_pack_chunks_partitioning_invariant(spark):
    """The assignment is a function of the data alone: shuffling the input's
    physical layout must not change any offset."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(1 + i % 7)), "en", f"src{i % 3}")
        for i in range(200)
    ]
    a = pack_chunks(_docs(spark, rows), budget=10, n_shards=4)
    b = pack_chunks(
        _docs(spark, rows).repartition(13, "lang"), budget=10, n_shards=4
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [
        (i, "t", ["en", "de", "zh"][i % 3], "s") for i in range(3000)
    ]
    df = _docs(spark, rows)
    rates = {"en": 0.5, "de": 0.2}
    a = stratified_sample(df, rates, default_rate=0.0)
    b = stratified_sample(df.repartition(7), rates, default_rate=0.0)
    got_a = {r.doc_id for r in a.collect()}
    got_b = {r.doc_id for r in b.collect()}
    assert got_a == got_b  # deterministic, layout-independent
    by_lang = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per lang; md5 prefixes are uniform — loose 3-sigma bounds
    assert 420 <= by_lang["en"] <= 580
    assert 140 <= by_lang["de"] <= 260
    assert "zh" not in by_lang  # default_rate=0 drops the stratum entirely


def test_stratified_sample_rate_one_keeps_all(spark):
    rows = [(i, "t", "en", "s") for i in range(100)]
    out = stratified_sample(_docs(spark, rows), {"en": 1.0})
    assert out.count() == 100


def test_pack_chunks_token_count_matches_token_stats(spark):
    """Round-6 review: the default budget unit is \\S+ runs (token_stats
    semantics) — a split-based count would add phantom tokens for leading/
    trailing whitespace and count '' as one token, shifting every later
    offset in the stream."""
    from relation_graph_spark.ops.text import token_stats

    rows = [
        (0, "  leading spaces", "en", "s"),
        (16, "trailing newline\n", "en", "s"),
        (32, "", "en", "s"),
        (48, "a  b\t c ", "en", "s"),
    ]
    df = _docs(spark, rows)
    ws = {r.doc_id: r.n_ws_tokens for r in token_stats(df).collect()}
    packed = {r.doc_id: r.n_tok for r in pack_chunks(df, budget=10).collect()}
    assert packed == ws == {0: 2, 16: 2, 32: 0, 48: 3}
